"""2D Couette flow driver.

Mirrors /root/reference/tests/couette.cc: channel [-2,2] x [-1,0] with the
lid at y=0 moving at velocity (2,0), no-slip bottom, zero-pressure open
boundaries left/right with tangential constraints.
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.functions import ConstantFunction, ZeroFunction
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.parameters import FlowParameters, PhysicalType
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes


class CouetteProblem:
    def __init__(self, parameters: FlowParameters, out=None) -> None:
        self.parameters = parameters
        self.out = out
        self.mesh = StructuredMesh.subdivided_hyper_rectangle(
            (4, 1), (-2.0, -1.0), (2.0, 0.0)
        )
        self.mesh.set_boundary_id(lambda c: np.abs(c[:, 0] - 2) < 1e-13, 1)
        self.mesh.set_boundary_id(lambda c: np.abs(c[:, 0] + 2) < 1e-13, 2)
        self.mesh.set_boundary_id(lambda c: np.abs(c[:, 1]) < 1e-13, 3)
        self.navier_stokes = NavierStokes(parameters, self.mesh, out=out)

    def _p(self, *a, **k):
        print(*a, **k, file=self.out or sys.stdout)

    def run(self) -> None:
        ns = self.navier_stokes
        par = self.parameters
        self._p(
            f"Running a 2D Couette problem using {ns.time_stepping.name()}, "
            f"Q{par.velocity_degree}/Q{par.pressure_degree} elements"
        )
        ns.set_no_slip_boundary(0)
        ns.set_velocity_dirichlet_boundary(3, ConstantFunction([2.0, 0.0]))
        ns.set_open_boundary_with_normal_flux(1, ZeroFunction())
        ns.set_open_boundary_with_normal_flux(2, ZeroFunction())
        ns.setup_problem(ZeroFunction(2))
        ns.print_n_dofs()
        if par.physical_type == PhysicalType.incompressible:
            while not ns.time_stepping.at_end():
                ns.advance_time_step()
        else:
            ns.advance_time_step()


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "couette.prm"
    parameters = FlowParameters.from_file(paramfile)
    problem = CouetteProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
