"""1D channel flow driver (with optional damping).

Mirrors /root/reference/tests/1d_flow.cc: the interval [0, 2.5] refined 10
times (plus the prm's global refinements), pressure 2 at the left and 1 at
the right open boundary, initial velocity 2; exercises the damping term of
the momentum equation in the *_damped configuration.
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.functions import ConstantFunction
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes


class ChannelFlow:
    def __init__(self, parameters: FlowParameters, out=None) -> None:
        self.parameters = parameters
        self.out = out
        self.mesh = StructuredMesh((1,), (0.0,), (2.5,))
        self.mesh.refine_global(10)
        self.mesh.set_side_boundary_id(0, 0, 0)
        self.mesh.set_side_boundary_id(0, 1, 1)
        self.navier_stokes = NavierStokes(parameters, self.mesh, out=out)

    def _p(self, *a, **k):
        print(*a, **k, file=self.out or sys.stdout)

    def run(self) -> None:
        ns = self.navier_stokes
        par = self.parameters
        self._p(
            f"Running a 1D flow using {ns.time_stepping.name()}, "
            f"Q{par.velocity_degree}/Q{par.pressure_degree} elements"
        )
        ns.set_open_boundary_with_normal_flux(0, ConstantFunction(2.0))
        ns.set_open_boundary_with_normal_flux(1, ConstantFunction(1.0))
        ns.setup_problem(lambda x, t: np.full((1, len(x)), 2.0))
        ns.print_n_dofs()
        while not ns.time_stepping.at_end():
            ns.advance_time_step()


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "1d_flow.prm"
    parameters = FlowParameters.from_file(paramfile)
    assert parameters.dimension == 1
    problem = ChannelFlow(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
