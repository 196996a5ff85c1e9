"""Lid-driven cavity application.

Mirrors /root/reference/applications/drivencavity.cc: stationary
Navier-Stokes in the unit cavity with a regularized lid velocity
(cosine-smoothed so the corners are compatible), pressure fixed at the
boundary; one stationary solve per mesh inside a pressure-based AMR loop
on the adaptive forest (Kelly pressure-jump indicators ->
refine_and_coarsen_fixed_number -> adapt_mesh with solution transfer,
exactly the reference loop drivencavity.cc:384-412).
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.mesh.forest import ForestMesh
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes


def lid_velocity(x, t=0.0):
    dim = x.shape[1]
    vals = np.zeros((dim, len(x)))
    on_lid = np.abs(x[:, 1] - 1.0) < 1e-12
    profile = 0.25 * (1 - np.cos(2 * np.pi * x[:, 0]))
    if dim == 3:
        profile = profile * (1 - np.cos(2 * np.pi * x[:, 2] / 3.0))
    else:
        profile = 2 * profile  # 2D: peak lid speed 1
    vals[0] = np.where(on_lid, profile, 0.0)
    return vals


class DrivenCavityProblem:
    def __init__(self, parameters: FlowParameters, out=None) -> None:
        self.parameters = parameters
        self.out = out
        dim = parameters.dimension
        if parameters.global_refinements % 4 != 0:
            raise ValueError("elements per direction must be divisible by 4")
        n = parameters.global_refinements // 4
        self.mesh = ForestMesh((n,) * dim, (0.0,) * dim, (1.0,) * dim)
        self.mesh.refine_global(2)
        # the solver's setup_problem must not refine again
        parameters.global_refinements = 0
        self.navier_stokes = NavierStokes(parameters, self.mesh, out=out)

    def run(self) -> None:
        ns = self.navier_stokes
        ns.set_velocity_dirichlet_boundary(0, lid_velocity)
        ns.fix_pressure_constant(0)
        ns.setup_problem()
        rounds = self.parameters.adaptive_refinements + 1
        for r in range(rounds):
            ns.print_n_dofs()
            ns.advance_time_step()
            ns.output_solution(self.parameters.output_filename)
            ns.refine_grid_pressure_based(100, 0.1, 0)
            # stationary pseudo-time: each mesh gets a fresh solve window
            ns.time_stepping.restart()


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "drivencavity.prm"
    parameters = FlowParameters.from_file(paramfile)
    problem = DrivenCavityProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
