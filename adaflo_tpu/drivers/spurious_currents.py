"""Static-bubble parasitic-currents benchmark driver.

Mirrors the reference driver /root/reference/tests/spurious_currents.cc: a
bubble of radius 0.5, slightly off-center at (0.02, 0.03[, 0.04]), in the
no-slip box [-2.5, 2.5]^dim (the `global refinements` parameter is the number
of subdivisions per direction, not a refinement count); after each step,
report the maximum spurious velocity and the relative error of the Laplace
pressure jump.
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.drivers.rising_bubble import TwoPhaseParameters
from adaflo_tpu.fe.basis import equidistant_points, gauss_quadrature
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.tensor import CellEvaluator
from adaflo_tpu.twophase.base import fmt8


def initial_distance(x, t=0.0):
    dim = x.shape[1]
    center = np.array([0.02 + 0.01 * d for d in range(dim)])
    return np.linalg.norm(x - center[None, :], axis=1) - 0.5


class MicroFluidicProblem:
    def __init__(self, parameters: TwoPhaseParameters, out=None) -> None:
        self.parameters = parameters
        self.out = out
        dim = parameters.dimension
        n = parameters.global_refinements
        if parameters.adaptive_refinements > 0:
            # AMR configuration (spurious_currents_ls_3d.prm sets
            # `adaptive refinements = 2`): forest-of-octrees so the warm-up
            # loop and per-step marking can adapt around the interface, as
            # the reference does via p4est (two_phase_base.cc:119-196)
            from adaflo_tpu.mesh.forest import ForestMesh

            self.mesh = ForestMesh((n,) * dim, (-2.5,) * dim, (5.0,) * dim)
        else:
            self.mesh = StructuredMesh(
                (n,) * dim, (-2.5,) * dim, (5.0,) * dim
            )

        if parameters.solver_method == "level set okz":
            from adaflo_tpu.twophase.level_set_okz import LevelSetOKZSolver

            self.solver = LevelSetOKZSolver(parameters, self.mesh, out=out)
        elif parameters.solver_method == "phase field":
            from adaflo_tpu.twophase.phase_field import PhaseFieldSolver

            self.solver = PhaseFieldSolver(parameters, self.mesh, out=out)
        else:
            raise ValueError(parameters.solver_method)

    def _p(self, *a, **k):
        print(*a, **k, file=self.out or sys.stdout)

    def evaluate_spurious_velocities(self) -> None:
        import jax.numpy as jnp

        par = self.parameters
        ns = self.solver.navier_stokes
        mesh = self.mesh
        dim = mesh.dim
        # max |u| over an equidistant lattice (spurious_currents.cc:120-150)
        pts = equidistant_points(par.velocity_degree + 3)
        ev = CellEvaluator(dim, ns.u_space.basis, (pts, np.zeros_like(pts)), mesh.h)
        u = np.asarray(ns.solution[0])
        cells = jnp.asarray(np.transpose(u[:, ns.u_space.cell_dofs], (1, 0, 2)))
        vals = np.asarray(ev.values(cells))
        norm_velocity = float(np.sqrt((vals**2).sum(axis=1)).max())

        # pressure jump: average p inside r < 0.1 minus boundary average
        # (spurious_currents.cc:152-238)
        evp = CellEvaluator(dim, ns.p_space.basis, par.velocity_degree + 1, mesh.h)
        p = np.asarray(ns.solution[1])
        p_vals = np.asarray(evp.values(jnp.asarray(p[ns.p_space.cell_dofs])))
        qp = evp.quad_coords(mesh)
        centers = qp.mean(axis=1)  # approximately cell centers
        jxw = np.asarray(evp.jxw)
        # reference radius 0.1 presumes the 80^2 mesh; widen on coarse meshes
        # so at least one cell center is sampled
        radius = max(0.1, float(np.linalg.norm(mesh.h)))
        inner = np.linalg.norm(centers, axis=1) < radius
        p_avg = (p_vals[inner] * jxw).sum()
        o_avg = jxw.sum() * inner.sum()

        # boundary face averages
        q1, w1 = gauss_quadrature(par.velocity_degree + 1)
        Vq, _ = ns.p_space.basis.tabulate(q1)
        press_b = one_b = 0.0
        for bid in [0]:
            for axis, end, fd, qcoords, V_face, jxw_f in (
                ns.p_space.boundary_face_quadrature(bid, par.velocity_degree + 1)
            ):
                pv = p[fd] @ V_face.T  # (n_faces, n_qf)
                press_b += (pv * jxw_f).sum()
                one_b += jxw_f.sum() * len(fd)

        sigma = par.surface_tension
        jump_exact = 2.0 * (dim - 1) * sigma
        pressure_jump = (
            (p_avg / o_avg - press_b / one_b - jump_exact) / jump_exact * 100.0
        )
        self._p(f"  Error in pressure jump: {fmt8(pressure_jump)} %")
        self._p(f"  Size spurious currents, absolute: {fmt8(norm_velocity)}")

    def run(self) -> None:
        from adaflo_tpu.functions import ZeroFunction

        par = self.parameters
        solver = self.solver
        solver.set_no_slip_boundary(0)
        solver.fix_pressure_constant(0)
        solver.setup_problem(ZeroFunction(par.dimension), initial_distance)
        while not solver.get_time_stepping().at_end():
            solver.advance_time_step()
            self.evaluate_spurious_velocities()


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "spurious_currents.prm"
    parameters = TwoPhaseParameters.from_file(paramfile)
    problem = MicroFluidicProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
