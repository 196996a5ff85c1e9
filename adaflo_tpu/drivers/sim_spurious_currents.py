"""Static bubble with the sharp-interface solver family.

Mirrors /root/reference/tests/sim_spurious_currents.cc: the spurious-currents
setup solved with the sharp-interface methods (front tracking | mixed level
set | sharp level set | level set), reporting the maximum parasitic velocity
after each step.
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.drivers.rising_bubble import TwoPhaseParameters
from adaflo_tpu.drivers.spurious_currents import initial_distance
from adaflo_tpu.fe.basis import equidistant_points
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.tensor import CellEvaluator
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes
from adaflo_tpu.twophase.base import fmt8
from adaflo_tpu.twophase.sharp_interface import (
    FrontTrackingSolver,
    MixedLevelSetSolver,
    SurfaceMesh,
)


class MicroFluidicProblem:
    def __init__(self, parameters: TwoPhaseParameters, out=None) -> None:
        self.parameters = parameters
        self.out = out
        dim = parameters.dimension
        assert dim == 2
        n = parameters.global_refinements
        self.mesh = StructuredMesh((n,) * dim, (-2.5,) * dim, (5.0,) * dim)
        self.navier_stokes = NavierStokes(parameters, self.mesh, out=out)

    def _p(self, *a, **k):
        print(*a, **k, file=self.out or sys.stdout)

    def _max_velocity(self) -> float:
        import jax.numpy as jnp

        ns = self.navier_stokes
        pts = equidistant_points(self.parameters.velocity_degree + 2)
        ev = CellEvaluator(2, ns.u_space.basis, (pts, np.zeros_like(pts)), self.mesh.h)
        u = np.asarray(ns.solution[0])
        cells = jnp.asarray(np.transpose(u[:, ns.u_space.cell_dofs], (1, 0, 2)))
        vals = np.asarray(ev.values(cells))
        return float(np.sqrt((vals**2).sum(axis=1)).max())

    def run(self, n_steps=None) -> None:
        from adaflo_tpu.functions import ZeroFunction

        par = self.parameters
        ns = self.navier_stokes
        ns.set_no_slip_boundary(0)
        ns.fix_pressure_constant(0)
        ns.setup_problem(ZeroFunction(2))

        dim = 2
        center = np.array([0.02 + 0.01 * d for d in range(dim)])
        surface = SurfaceMesh.hyper_sphere(center, 0.5, 256)
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

        step = 0
        while not ns.time_stepping.at_end():
            solver.advance_time_step()
            self._p(
                f"  Size spurious currents, absolute: {fmt8(self._max_velocity())}"
            )
            step += 1
            if n_steps is not None and step >= n_steps:
                break


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "sim_spurious_currents.prm"
    parameters = TwoPhaseParameters.from_file(paramfile)
    problem = MicroFluidicProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
