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
        is_forest = hasattr(ns.u_space, "h_cells")
        # max |u| over an equidistant lattice (spurious_currents.cc:120-150)
        pts = equidistant_points(par.velocity_degree + 3)
        u = np.asarray(ns.solution[0])
        cells = jnp.asarray(np.transpose(u[:, ns.u_space.cell_dofs], (1, 0, 2)))
        if is_forest:
            from adaflo_tpu.ops.tensor import VariableCellEvaluator

            ev = VariableCellEvaluator(
                dim, ns.u_space.basis, (pts, np.zeros_like(pts)),
                ns.u_space.h_cells,
            )
        else:
            ev = CellEvaluator(
                dim, ns.u_space.basis, (pts, np.zeros_like(pts)), mesh.h
            )
        vals = np.asarray(ev.values(cells))
        norm_velocity = float(np.sqrt((vals**2).sum(axis=1)).max())

        # pressure jump: average p over cells whose center is within 0.1 of
        # the origin minus the domain-boundary average — the reference's
        # exact criterion (spurious_currents.cc:185-206: ns_cell->center()
        # .norm() < 0.1; the central cell of the 15^dim mesh sits at the
        # origin, so the sample is well-defined on every config). An earlier
        # version widened the radius to |h| on coarse meshes, which pulled
        # cells at and beyond the smeared interface (r ~ 0.5) into the
        # "inner" average and produced a -55 % pressure-jump error on the
        # 3D config; the fallback below samples the single nearest cell
        # instead, which stays inside the bubble.
        p = np.asarray(ns.solution[1])
        if is_forest:
            from adaflo_tpu.ops.tensor import VariableCellEvaluator

            evp = VariableCellEvaluator(
                dim, ns.p_space.basis, par.velocity_degree + 1,
                ns.p_space.h_cells,
            )
            p_vals = np.asarray(
                evp.values(jnp.asarray(p[ns.p_space.cell_dofs]))
            )
            centers = (
                ns.p_space.cell_origin + 0.5 * ns.p_space.h_cells
            )
            jxw = np.asarray(evp.jxw_cells)  # (E, n_q)
        else:
            evp = CellEvaluator(
                dim, ns.p_space.basis, par.velocity_degree + 1, mesh.h
            )
            p_vals = np.asarray(evp.values(jnp.asarray(p[ns.p_space.cell_dofs])))
            qp = evp.quad_coords(mesh)
            centers = qp.mean(axis=1)  # approximately cell centers
            jxw = np.asarray(evp.jxw)
        rr = np.linalg.norm(centers, axis=1)
        inner = rr < 0.1
        if not inner.any():
            inner = rr == rr.min()
        if is_forest:
            p_avg = (p_vals[inner] * jxw[inner]).sum()
            o_avg = jxw[inner].sum()
        else:
            p_avg = (p_vals[inner] * jxw).sum()
            o_avg = jxw.sum() * inner.sum()

        # boundary face averages
        q1, w1 = gauss_quadrature(par.velocity_degree + 1)
        press_b = one_b = 0.0
        if is_forest:
            press_b, one_b = self._forest_boundary_pressure_average(
                p, par.velocity_degree + 1
            )
        else:
            for bid in [0]:
                for axis, end, fd, qcoords, V_face, jxw_f in (
                    ns.p_space.boundary_face_quadrature(
                        bid, par.velocity_degree + 1
                    )
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

    def _forest_boundary_pressure_average(self, p, n_q_1d):
        """(sum p dS, sum dS) over the outer box boundary of the forest:
        per (axis, side), boundary cells are those whose face lies on the
        domain box; the face integral is a tensor-Gauss rule scaled by the
        per-cell face area (forest cells are axis-aligned boxes)."""
        ns = self.solver.navier_stokes
        sp = ns.p_space
        dim = sp.dim
        q1, w1 = gauss_quadrature(n_q_1d)
        Vq, _ = sp.basis.tabulate(q1)
        lo = np.asarray(self.mesh.origin)
        hi = lo + np.asarray(self.mesh.lengths)
        origin = sp.cell_origin
        h = sp.h_cells
        press_b = one_b = 0.0
        for axis in range(dim):
            for side in (0, 1):
                if side == 0:
                    sel = np.abs(origin[:, axis] - lo[axis]) < 1e-12
                else:
                    sel = (
                        np.abs(origin[:, axis] + h[:, axis] - hi[axis])
                        < 1e-12
                    )
                if not sel.any():
                    continue
                loc = sp._face_local_indices(axis, side)
                fd = sp.cell_dofs[sel][:, loc]  # (n_faces, n_fd)
                rem = [a for a in range(dim) if a != axis]
                V_face = np.ones((1, 1))
                wq = np.ones(1)
                for a in reversed(rem):
                    V_face = np.kron(V_face, Vq)
                    wq = np.kron(wq, w1)
                area = np.prod(h[sel][:, rem], axis=1)  # (n_faces,)
                pv = p[fd] @ V_face.T  # (n_faces, n_qf)
                press_b += (pv * wq[None, :] * area[:, None]).sum()
                one_b += (wq.sum() * area).sum()
        return press_b, one_b

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
