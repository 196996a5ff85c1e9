"""Rising bubble with the sharp-interface solver family.

Mirrors /root/reference/tests/sim_rising_bubble.cc: the same bubble setup as
rising_bubble but solved with "front tracking | mixed level set | sharp
level set | level set" (Problem-specific subsection), a codim-1 surface mesh
for the front-tracking variants.
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.drivers.rising_bubble import TwoPhaseParameters, initial_distance
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes
from adaflo_tpu.twophase.sharp_interface import (
    FrontTrackingSolver,
    MixedLevelSetSolver,
    SurfaceMesh,
    TriSurfaceMesh,
)


class MicroFluidicProblem:
    def __init__(self, parameters: TwoPhaseParameters, out=None) -> None:
        self.parameters = parameters
        self.out = out
        dim = parameters.dimension
        if dim == 3:
            # the dim-templated reference setup (sharp_interface.h:503-749):
            # same channel extruded, symmetry on the x faces
            self.mesh = StructuredMesh.subdivided_hyper_rectangle(
                (5, 5, 10), (0.0, 0.0, 0.0), (1.0, 1.0, 2.0)
            )
            self.mesh.set_boundary_id(
                lambda c: (np.abs(c[:, 0] - 1) < 1e-14)
                | (np.abs(c[:, 0]) < 1e-14),
                2,
            )
        else:
            self.mesh = StructuredMesh.subdivided_hyper_rectangle(
                (5, 10), (0.0, 0.0), (1.0, 2.0)
            )
            self.mesh.set_boundary_id(
                lambda c: (np.abs(c[:, 0] - 1) < 1e-14)
                | (np.abs(c[:, 0]) < 1e-14),
                2,
            )
        self.navier_stokes = NavierStokes(parameters, self.mesh, out=out)

    def run(self, n_steps=None) -> None:
        from adaflo_tpu.functions import ZeroFunction

        par = self.parameters
        ns = self.navier_stokes
        dim = par.dimension
        ns.set_no_slip_boundary(0)
        ns.fix_pressure_constant(0)
        ns.set_symmetry_boundary(2)
        ns.setup_problem(ZeroFunction(dim))
        ns.print_n_dofs()

        if dim == 3:
            surface = TriSurfaceMesh.hyper_sphere((0.5, 0.5, 0.5), 0.25, 3)
        else:
            surface = SurfaceMesh.hyper_sphere((0.5, 0.5), 0.25, 256)
        method = par.solver_method
        if method == "front tracking":
            solver = FrontTrackingSolver(ns, surface)
        elif method == "mixed level set":
            solver = MixedLevelSetSolver(
                ns, initial_distance, sharp=True, surface_mesh=surface
            )
        elif method == "sharp level set":
            solver = MixedLevelSetSolver(ns, initial_distance, sharp=True)
        elif method == "level set":
            solver = MixedLevelSetSolver(ns, initial_distance, sharp=False)
        else:
            raise ValueError(method)
        self.solver = solver

        solver.output_solution(par.output_filename)
        step = 0
        while not ns.time_stepping.at_end():
            solver.advance_time_step()
            solver.output_solution(par.output_filename)
            step += 1
            if n_steps is not None and step >= n_steps:
                break


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "sharp_interfaces_04.prm"
    parameters = TwoPhaseParameters.from_file(paramfile)
    # extend the selection for the sharp-interface methods
    problem = MicroFluidicProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
