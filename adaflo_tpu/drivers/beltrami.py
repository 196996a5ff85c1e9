"""2D Taylor / 3D Beltrami analytic Navier-Stokes benchmark driver.

Mirrors the reference driver /root/reference/tests/beltrami.cc: the decaying
Taylor vortex (Kim & Moin) in 2D and the Beltrami flow (Ethier & Steinman) in
3D on [-1,1]^dim, all-Dirichlet time-dependent velocity BCs from the exact
solution, pressure fixed against the exact pressure at the boundary; absolute
and relative L2 errors plus cellwise divergence at the output cadence.

2D runs the reference's exact locally refined mesh (two cells refined before
the last global refinement -> hanging nodes, handled by the adaptive forest
path); dof counts and t=0/error-trajectory anchors match beltrami_2d.output
digit for digit. 3D keeps the uniform mesh matching the recorded 3-process
reference output (beltrami_3d.output: 4096 cells, 107811 + 4913 dofs).
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes
from adaflo_tpu.utils.errors import (
    cell_divergence_norm,
    interpolate,
    l2_error,
    l2_norm,
)


def exact_u(nu: float, dim: int):
    a = 0.25 * np.pi
    d = (2.0 if dim == 3 else np.sqrt(2.0)) * a

    def fn(x, t=0.0):
        if dim == 3:
            decay = np.exp(-nu * d * d * t)
            u0 = -a * (
                np.exp(a * x[:, 0]) * np.sin(a * x[:, 1] + d * x[:, 2])
                + np.exp(a * x[:, 2]) * np.cos(a * x[:, 0] + d * x[:, 1])
            )
            u1 = -a * (
                np.exp(a * x[:, 1]) * np.sin(a * x[:, 2] + d * x[:, 0])
                + np.exp(a * x[:, 0]) * np.cos(a * x[:, 1] + d * x[:, 2])
            )
            u2 = -a * (
                np.exp(a * x[:, 2]) * np.sin(a * x[:, 0] + d * x[:, 1])
                + np.exp(a * x[:, 1]) * np.cos(a * x[:, 2] + d * x[:, 0])
            )
            return np.stack([u0, u1, u2]) * decay
        decay = np.exp(-2.0 * nu * a * a * t)
        u0 = -a * np.cos(a * x[:, 0]) * np.sin(a * x[:, 1]) * decay
        u1 = a * np.sin(a * x[:, 0]) * np.cos(a * x[:, 1]) * decay
        return np.stack([u0, u1])

    return fn


def exact_p(nu: float, dim: int):
    a = 0.25 * np.pi
    d = 2.0 * a

    def fn(x, t=0.0):
        if dim == 3:
            return (
                -a
                * a
                * 0.5
                * (
                    np.exp(2 * a * x[:, 0])
                    + np.exp(2 * a * x[:, 1])
                    + np.exp(2 * a * x[:, 2])
                    + 2
                    * np.sin(a * x[:, 0] + d * x[:, 1])
                    * np.cos(a * x[:, 2] + d * x[:, 0])
                    * np.exp(a * (x[:, 1] + x[:, 2]))
                    + 2
                    * np.sin(a * x[:, 1] + d * x[:, 2])
                    * np.cos(a * x[:, 0] + d * x[:, 1])
                    * np.exp(a * (x[:, 2] + x[:, 0]))
                    + 2
                    * np.sin(a * x[:, 2] + d * x[:, 0])
                    * np.cos(a * x[:, 1] + d * x[:, 2])
                    * np.exp(a * (x[:, 0] + x[:, 1]))
                )
                * np.exp(-2 * nu * d * d * t)
            )
        return (
            -a
            * a
            * 0.25
            * (np.cos(2 * a * x[:, 0]) + np.cos(2 * a * x[:, 1]))
            * np.exp(-4.0 * nu * a * a * t)
        )

    return fn


class BeltramiProblem:
    def __init__(self, parameters: FlowParameters, out=None) -> None:
        self.parameters = parameters
        self.out = out
        dim = parameters.dimension
        if dim == 2 and not parameters.augmented_taylor_hood:
            # the reference's exact serial mesh (beltrami.cc:392-412): 4x4
            # roots on (-1,1)^2, refine_global(g-2), refine active cells #2
            # and #3 (our Morton order matches deal.II's active ordering for
            # the first sibling group), then one more global refinement ->
            # a hanging-node mesh handled by the adaptive forest path
            from adaflo_tpu.mesh.forest import ForestMesh

            self.mesh = ForestMesh((4,) * dim, (-1.0,) * dim, (2.0,) * dim)
            g = parameters.global_refinements
            if g >= 2:
                self.mesh.refine_global(g - 2)
            flags = np.zeros(self.mesh.n_cells, dtype=np.int8)
            flags[2:4] = 1
            self.mesh.adapt(flags)
            self.mesh.refine_global(1)
            parameters.global_refinements = 0
        else:
            # 3D: the recorded reference output (3 MPI ranks) shows the two
            # local refine flags had no effect (4096 uniform cells,
            # beltrami_3d.output), so the uniform lattice path applies;
            # augmented TH stays on the uniform mesh as well (forest + DG0
            # pending)
            self.mesh = StructuredMesh.subdivided_hyper_rectangle(
                (4,) * dim, (-1.0,) * dim, (1.0,) * dim
            )
            self._net_refinements = max(parameters.global_refinements - 1, 0)
            parameters.global_refinements = self._net_refinements
        self.navier_stokes = NavierStokes(parameters, self.mesh, out=out)
        self.nu = parameters.viscosity

    def _p(self, *a, **k):
        print(*a, **k, file=self.out or sys.stdout)

    def compute_errors(self) -> None:
        ns = self.navier_stokes
        time = ns.time_stepping.now()
        deg = self.parameters.velocity_degree
        dim = self.mesh.dim
        cell_div = cell_divergence_norm(ns.u_space, ns.solution[0])
        if self.parameters.augmented_taylor_hood:
            from adaflo_tpu.utils.errors import l2_error_augmented_pressure

            p_err = l2_error_augmented_pressure(
                ns.operator, ns.solution[1], exact_p(self.nu, dim), time, deg + 2
            )
        else:
            p_err = l2_error(
                ns.p_space, ns.solution[1], exact_p(self.nu, dim), time, deg + 2
            )
        u_err = l2_error(
            ns.u_space,
            ns.solution[0],
            exact_u(self.nu, dim),
            time,
            deg + 2,
            n_components=dim,
        )
        if self.parameters.augmented_taylor_hood:
            from adaflo_tpu.utils.errors import l2_error_augmented_pressure

            p_norm = l2_error_augmented_pressure(
                ns.operator,
                ns.solution[1],
                lambda x, t: np.zeros(len(x)),
                time,
                deg,
            )
        else:
            p_norm = l2_norm(ns.p_space, ns.solution[1], deg)
        u_norm = l2_norm(ns.u_space, ns.solution[0], deg, n_components=dim)
        self._p(
            f"  L2-Errors absolute: ||e_p||_L2 = {fmt4(p_err)},"
            f"   ||e_u||_L2 = {fmt4(u_err)}"
        )
        self._p(
            f"  L2-Errors relative: ||e_p||_L2 = {fmt4(p_err / p_norm)},"
            f"   ||e_u||_L2 = {fmt4(u_err / u_norm)}"
        )
        self._p(f"  Cell divergence:    |div(u)|_cells = {fmt4(cell_div)}")

    def output_results(self) -> None:
        ns = self.navier_stokes
        if not ns.time_stepping.at_tick(self.parameters.output_frequency):
            return
        self.compute_errors()

    def run(self) -> None:
        ns = self.navier_stokes
        dim = self.mesh.dim
        par = self.parameters
        self._p(
            f"Running a {dim}D Beltrami problem using "
            f"{ns.time_stepping.name()}, Q{par.velocity_degree}"
            f"/Q{par.pressure_degree}"
            f"{'+' if par.augmented_taylor_hood else ''} elements on 1 processes"
        )
        ns.set_velocity_dirichlet_boundary(
            0, lambda x, t: exact_u(self.nu, dim)(x, t)
        )
        ns.fix_pressure_constant(0, lambda x, t: exact_p(self.nu, dim)(x, t))
        ns.setup_problem()
        ns.print_n_dofs()

        # initial condition: exact velocity and pressure at t=0 (augmented
        # TH: interpolate the Q part, zero DG0 constants — matching the
        # reference's interpolate_pressure_field on the FE_Q subspace)
        ns.solution[0] = _to_jnp(interpolate(ns.u_space, exact_u(self.nu, dim)))
        p0 = interpolate(ns.p_space, exact_p(self.nu, dim))
        ns.solution[1] = ns.solution[1].at[: len(p0)].set(_to_jnp(p0))
        self.output_results()

        while not ns.time_stepping.at_end():
            ns.init_time_advance(True)
            ns.evaluate_time_step()
            self.output_results()


def _to_jnp(a):
    import jax.numpy as jnp

    return jnp.asarray(a)


def fmt4(x: float) -> str:
    s = f"{x:.4g}"
    if "e" in s:
        mant, ex = s.split("e")
        return f"{mant}e{int(ex):+03d}"
    return s


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "beltrami.prm"
    parameters = FlowParameters.from_file(paramfile)
    problem = BeltramiProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
