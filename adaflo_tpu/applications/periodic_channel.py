"""Turbulent periodic channel application.

Mirrors /root/reference/applications/periodic_channel.cc: channel
[0, 2 pi] x [-1, 1] (x [0, 2 pi/3] in 3D) with periodic x (and z), no-slip
walls, the wall-clustered grading y -> tanh(y)/tanh(1)
(GridTools::transform, cc:242-246 — here a graded tensor mesh with per-cell
Cartesian geometry on the lattice fast path), a constant streamwise body
force (the mean pressure gradient) applied through user_rhs, and a quartic
initial profile with a spanwise perturbation to trigger transition.
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

BODY_FORCE_X = 0.00337204  # mean pressure gradient (periodic_channel.cc:265)


def initial_channel(x, t=0.0):
    dim = x.shape[1]
    vals = np.zeros((dim, len(x)))
    y = x[:, 1]
    z = x[:, 2] if dim == 3 else 0.0 * y
    vals[0] = (1.0 - y**4) * 1.25
    vals[1] = 0.2 * (1.0 - y**4) * np.cos(z * 3)
    if dim == 3:
        vals[2] = 0.2 * (1.0 - y**4) * np.sin(z * 3)
    return vals


class PeriodicChannelProblem:
    def __init__(self, parameters: FlowParameters, out=None) -> None:
        self.parameters = parameters
        self.out = out
        dim = parameters.dimension
        if parameters.global_refinements % 4 != 0:
            raise ValueError("elements per direction must be divisible by 4")
        n = parameters.global_refinements // 4
        top = (2 * np.pi, 1.0) + ((2.0 / 3.0 * np.pi,) if dim == 3 else ())
        bottom = (0.0, -1.0) + ((0.0,) if dim == 3 else ())
        self.mesh = StructuredMesh.subdivided_hyper_rectangle(
            (n,) * dim, bottom, top
        )
        self.mesh.refine_global(2)
        # wall clustering (periodic_channel.cc:242-246): y in [-1, 1] is the
        # second axis here already, so in = (y+1)/2 maps the reference form
        self.mesh.apply_axis_transform(
            1, lambda y: np.tanh(1.0 * y) / np.tanh(1.0)
        )
        parameters.global_refinements = 0
        self.navier_stokes = NavierStokes(parameters, self.mesh, out=out)

    def run(self, n_steps: int | None = None) -> None:
        import jax.numpy as jnp

        ns = self.navier_stokes
        par = self.parameters
        ns.set_velocity_dirichlet_boundary(0, lambda x, t: 0 * x.T)
        ns.fix_pressure_constant(0)
        ns.set_periodic_direction(0)
        if par.dimension == 3:
            ns.set_periodic_direction(2)
        ns.setup_problem(initial_channel)
        ns.print_n_dofs()

        # constant streamwise body force -> user_rhs (cc:254-273)
        ones = jnp.ones((self.mesh.n_cells, ns.operator.ev_u.n_q))
        f_cells = ns.operator.ev_u.integrate_values(-BODY_FORCE_X * ones)
        fx = ns.operator.lat_u.scatter_add(f_cells)
        fx = ns.constraints_u[0].condense(fx)
        ns.user_rhs[0] = ns.user_rhs[0].at[0].set(fx)

        step = 0
        while not ns.time_stepping.at_end():
            ns.advance_time_step()
            ns.output_solution(par.output_filename)
            step += 1
            if n_steps is not None and step >= n_steps:
                break


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "periodic_channel.prm"
    parameters = FlowParameters.from_file(paramfile)
    problem = PeriodicChannelProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
