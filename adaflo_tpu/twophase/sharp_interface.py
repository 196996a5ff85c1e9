"""Sharp-interface / front-tracking two-phase solvers (2D).

TPU-native counterpart of the reference's sharp-interface module
(/root/reference/include/adaflo/sharp_interface.h, sharp_interface_util.h):

- ``LevelSetSolver``: the standalone recomposition of the four OKZ operators
  on an externally-owned velocity field (sharp_interface.h:49-487; solve():
  extrapolate, advect, reinitialize).
- ``SurfaceMesh``: a closed codim-1 polyline moved with the flow velocity
  (the MappingFEField surface mesh of the reference, via point evaluation).
- ``FrontTrackingSolver``: phases classified by a winding-number inside test
  (replacing boost::geometry), surface tension integrated on the surface
  mesh and scattered to the background velocity space via point evaluation
  (sharp_interface.h:503-749).
- ``MixedLevelSetSolver``: level set advected on the background mesh with
  surface tension either sharp — from marching-squares contouring of the LS
  field (GridTools::MarchingCubeAlgorithm analog) — or regularized
  (sharp_interface.h:753-1074).

Surface-mesh bookkeeping runs on host numpy (off the device hot path); the
level-set and Navier-Stokes solves are the jitted device pipelines.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.ops.level_set import LevelSetOperators
from adaflo_tpu.ops.navier_stokes import Coefficients, TimeWeights
from adaflo_tpu.parameters import FlowParameters, Scheme
from adaflo_tpu.solvers.krylov import bicgstab, cg
from adaflo_tpu.solvers.preconditioner import (
    ChebyshevPreconditioner,
    DiagonalPreconditioner,
    estimate_lambda_max,
)
from adaflo_tpu.utils.point_eval import (
    evaluate_at_points,
    scatter_at_points,
    winding_number_inside,
)


# ---------------------------------------------------------------------------
class LevelSetSolver:
    """Standalone conservative level set advected by an external velocity
    (sharp_interface.h:49-487)."""

    def __init__(self, navier_stokes, parameters: FlowParameters) -> None:
        self.ns = navier_stokes
        self.parameters = parameters
        mesh = navier_stokes.mesh
        self.ls_space = ScalarSpace(
            mesh, parameters.concentration_subdivisions, "iso_q1"
        )
        con = Constraints(self.ls_space.n_dofs)
        con.close()
        cn = Constraints(self.ls_space.n_dofs)
        cn.close()
        ck = Constraints(self.ls_space.n_dofs)
        ck.close()
        self.con_ls = con
        cell_diameter = float(np.max(mesh.h))
        self.minimal_edge_length = float(np.min(mesh.h))
        self.epsilon_used = (
            parameters.epsilon / parameters.concentration_subdivisions * cell_diameter
        )
        self.ops = LevelSetOperators(
            parameters,
            self.ls_space,
            navier_stokes.u_space,
            navier_stokes.p_space,
            con,
            cn,
            ck,
            self.epsilon_used,
            cell_diameter,
            self.minimal_edge_length,
        )
        n = self.ls_space.n_dofs_padded
        self.solution = jnp.zeros(n)
        self.solution_old = jnp.zeros(n)
        self.solution_old_old = jnp.zeros(n)
        self.normal_vector_field = jnp.zeros((mesh.dim, n))
        self.curvature = jnp.zeros(n)
        self.mass_diag = self.ops.lumped_mass()
        self.inv_mass_diag = DiagonalPreconditioner(self.mass_diag).inverse
        self.proj_diag = self.ops.projection_diagonal()
        dinv = DiagonalPreconditioner(
            jnp.broadcast_to(self.proj_diag, (mesh.dim,) + self.proj_diag.shape)
        ).inverse
        self.proj_lambda = estimate_lambda_max(
            lambda nv: self.ops.projection_vmult_block(nv),
            dinv,
            jnp.zeros((mesh.dim, len(self.proj_diag))),
        )
        self.evaluated_normal_q = jnp.zeros(
            (mesh.n_cells, mesh.dim, self.ops.n_q)
        )

    def set_initial_condition(self, distance_fn) -> None:
        dist = np.asarray(distance_fn(self.ls_space.node_coords, 0.0))
        c0 = jnp.zeros_like(self.solution).at[: len(dist)].set(jnp.asarray(dist))
        self.solution = -jnp.tanh(c0 / (2.0 * self.epsilon_used))
        self.solution_old = self.solution
        self.solution_old_old = self.solution

    # -- pieces (mirror LevelSetOKZSolver without the TwoPhaseBase) -------
    def advance_concentration(self, tw: TimeWeights, bdf2_flag: bool) -> None:
        ops = self.ops
        ns = self.ns
        rhs, conv, nu_art = ops.advection_rhs(
            self.solution,
            self.solution_old,
            self.solution_old_old,
            ns.solution[0],
            ns.solution_old[0],
            ns.solution_old_old[0],
            tw,
            bdf2_flag,
            jnp.float64(self.ns.time_stepping.old_step_size()),
        )
        A = lambda x: ops.advection_vmult(x, conv, tw, self.mass_diag, nu_art)
        M = lambda r: self.inv_mass_diag * r
        tol = jnp.float64(0.05 * self.parameters.tol_nl_iteration)
        res = bicgstab(A, rhs, None, tol, 30, M=M)
        inc = res.x
        self.solution = self.solution + inc

    def compute_normal(self, fast: bool) -> None:
        ops = self.ops
        rhs = ops.normal_rhs(self.solution)
        cheb = ChebyshevPreconditioner(
            lambda nv: ops.projection_vmult_block(nv),
            jnp.broadcast_to(
                self.proj_diag, (self.ns.mesh.dim,) + self.proj_diag.shape
            ),
            self.proj_lambda,
            degree=5,
        )
        res = cg(
            lambda nv: ops.projection_vmult_block(nv),
            rhs,
            jnp.zeros_like(self.normal_vector_field),
            jnp.float64(1e-50),
            400,
            M=cheb,
            reduction=1e-5 if fast else 1e-7,
        )
        self.normal_vector_field = res.x

    def compute_curvature(self) -> None:
        self.compute_normal(False)
        ops = self.ops
        rhs = ops.curvature_rhs(self.normal_vector_field)
        cheb = ChebyshevPreconditioner(
            lambda k: ops.projection_vmult_scalar(k),
            self.proj_diag,
            self.proj_lambda,
            degree=5,
        )
        res = cg(
            lambda k: ops.projection_vmult_scalar(k),
            rhs,
            jnp.zeros_like(self.curvature),
            jnp.float64(1e-50),
            400,
            M=cheb,
            reduction=1e-8,
        )
        self.curvature = res.x

    def reinitialize(self, stab_steps: int, diff_steps: int = 0) -> None:
        par = self.parameters
        sub = par.concentration_subdivisions
        dim = self.ns.mesh.dim
        dtau_inv = max(
            0.95 / ((1.0 / dim**2) * self.minimal_edge_length / sub),
            1.0 / (5.0 * self.ns.time_stepping.step_size()),
        )
        for tau in range(diff_steps + stab_steps):
            first = tau == diff_steps
            if first:
                self.compute_normal(True)
            diffuse_only = tau < diff_steps
            rhs, en = self.ops.reinit_rhs(
                self.solution,
                self.normal_vector_field,
                first,
                self.evaluated_normal_q,
                diffuse_only,
            )
            self.evaluated_normal_q = en
            A = lambda x: self.ops.reinit_vmult(
                x, self.evaluated_normal_q, jnp.float64(dtau_inv), diffuse_only,
                self.mass_diag,
            )
            res = cg(
                A, rhs, jnp.zeros_like(rhs), jnp.float64(1e-50), 600,
                M=lambda r: self.inv_mass_diag * r, reduction=1e-6,
            )
            self.solution = self.solution + res.x
            if float(jnp.linalg.norm(res.x)) < 1e-6:
                break

    def solve(self) -> None:
        """Extrapolate, advect, reinitialize (sharp_interface.h:333-428)."""
        ts = self.ns.time_stepping
        k, ko = ts.step_size(), ts.old_step_size()
        if ko > 0:
            ext = (1 + k / ko) * self.solution - (k / ko) * self.solution_old
        else:
            ext = self.solution
        self.solution_old_old = self.solution_old
        self.solution_old = self.solution
        self.solution = ext
        tw = TimeWeights.from_time_stepping(ts)
        bdf2 = ts.scheme() == Scheme.bdf_2 and ts.step_no() > 1
        self.advance_concentration(tw, bdf2)
        self.reinitialize(self.parameters.n_reinit_steps)


# ---------------------------------------------------------------------------
class SurfaceMesh:
    """Closed 2D polyline interface (counterpart of the reference's codim-1
    Triangulation + MappingFEField)."""

    def __init__(self, points: np.ndarray) -> None:
        self.points = np.asarray(points, dtype=np.float64)

    @classmethod
    def hyper_sphere(cls, center, radius: float, n_points: int = 256):
        t = np.linspace(0, 2 * np.pi, n_points, endpoint=False)
        pts = np.stack(
            [center[0] + radius * np.cos(t), center[1] + radius * np.sin(t)], axis=1
        )
        return cls(pts)

    def move(self, u_space, velocity, dt: float) -> None:
        """Advect vertices with the background velocity (the reference's
        update_position_vector, sharp_interface_util.h:52-123); RK2."""
        u = np.asarray(velocity)
        v1 = evaluate_at_points(u_space, u, self.points).T
        mid = self.points + 0.5 * dt * v1
        v2 = evaluate_at_points(u_space, u, mid).T
        self.points = self.points + dt * v2

    def segment_data(self):
        """(midpoints, outward normals, lengths, curvature at midpoints)."""
        p = self.points
        nxt = np.roll(p, -1, axis=0)
        seg = nxt - p
        lengths = np.linalg.norm(seg, axis=1)
        mid = 0.5 * (p + nxt)
        # outward normal for counterclockwise orientation: rotate tangent -90
        tangent = seg / lengths[:, None]
        normal = np.stack([tangent[:, 1], -tangent[:, 0]], axis=1)
        # discrete curvature at vertices -> average onto segments
        prev = np.roll(p, 1, axis=0)
        a = p - prev
        b = nxt - p
        cross = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
        denom = (
            np.linalg.norm(a, axis=1)
            * np.linalg.norm(b, axis=1)
            * np.linalg.norm(nxt - prev, axis=1)
        )
        kappa_v = 2.0 * cross / np.maximum(denom, 1e-300)
        kappa = 0.5 * (kappa_v + np.roll(kappa_v, -1))
        # orientation: make normals outward (away from centroid)
        centroid = p.mean(axis=0)
        flip = np.einsum("sd,sd->s", normal, mid - centroid) < 0
        sign = np.where(flip.mean() > 0.5, -1.0, 1.0)
        return mid, sign * normal, lengths, -sign * kappa


def marching_squares(ls_space: ScalarSpace, c, n_sub: Optional[int] = None):
    """Zero-contour segments of the level-set field: (n_seg, 2, 2) array
    (the GridTools::MarchingCubeAlgorithm analog, sharp_interface_util.h:818-
    982). Reuses the sub-cell crossing logic of the bubble statistics."""
    from adaflo_tpu.fe.basis import equidistant_points
    from adaflo_tpu.ops.tensor import CellEvaluator

    mesh = ls_space.mesh
    sub = n_sub or ls_space.degree
    pts = equidistant_points(sub + 1)
    ev = CellEvaluator(2, ls_space.basis, (pts, np.zeros_like(pts)), mesh.h)
    cv = np.asarray(
        ev.values(jnp.asarray(np.asarray(c)[ls_space.cell_dofs]))
    )
    qc = ev.quad_coords(mesh)
    n1 = sub + 1
    cvals = cv.reshape(-1, n1, n1) + 1e-22
    qq = qc.reshape(-1, n1, n1, 2)
    c00 = cvals[:, :-1, :-1].reshape(-1)
    c01 = cvals[:, :-1, 1:].reshape(-1)
    c10 = cvals[:, 1:, :-1].reshape(-1)
    c11 = cvals[:, 1:, 1:].reshape(-1)
    p00 = qq[:, :-1, :-1, :].reshape(-1, 2)
    p01 = qq[:, :-1, 1:, :].reshape(-1, 2)
    p10 = qq[:, 1:, :-1, :].reshape(-1, 2)
    p11 = qq[:, 1:, 1:, :].reshape(-1, 2)

    def crossing(a, b, pa, pb):
        has = a * b <= 0
        r = np.where(has, a / np.where(has, a - b, 1.0), -1.0)
        return r, pa + (pb - pa) * r[:, None]

    rx0, px0 = crossing(c00, c01, p00, p01)
    rx1, px1 = crossing(c10, c11, p10, p11)
    ry0, py0 = crossing(c00, c10, p00, p10)
    ry1, py1 = crossing(c01, c11, p01, p11)
    segs = []
    for (ra, pa), (rb, pb), extra in [
        ((rx0, px0), (ry0, py0), None),
        ((rx0, px0), (ry1, py1), None),
        ((rx1, px1), (ry0, py0), None),
        ((rx1, px1), (ry1, py1), None),
    ]:
        m = (ra > 0) & (rb > 0)
        if m.any():
            segs.append(np.stack([pa[m], pb[m]], axis=1))
    m = (rx0 > 0) & (rx1 > 0) & (ry0 < 0) & (ry1 < 0)
    if m.any():
        segs.append(np.stack([px0[m], px1[m]], axis=1))
    m = (ry0 > 0) & (ry1 > 0) & (rx0 < 0) & (rx1 < 0)
    if m.any():
        segs.append(np.stack([py0[m], py1[m]], axis=1))
    if not segs:
        return np.zeros((0, 2, 2))
    return np.concatenate(segs, axis=0)


def marching_tetrahedra(ls_space: ScalarSpace, c, n_sub: Optional[int] = None):
    """Zero-contour triangle soup (n_tri, 3, 3) of a 3D level-set field:
    per-cell equidistant sub-lattice corners fed through the ambiguity-free
    6-tet decomposition (utils/point_eval.py marching_tetrahedra_cells) —
    the GridTools::MarchingCubeAlgorithm analog of
    sharp_interface_util.h:833."""
    from adaflo_tpu.fe.basis import equidistant_points
    from adaflo_tpu.ops.tensor import CellEvaluator
    from adaflo_tpu.utils.point_eval import marching_tetrahedra_cells

    mesh = ls_space.mesh
    sub = n_sub or ls_space.degree
    pts = equidistant_points(sub + 1)
    ev = CellEvaluator(3, ls_space.basis, (pts, np.zeros_like(pts)), mesh.h)
    cv = np.asarray(
        ev.values(jnp.asarray(np.asarray(c)[ls_space.cell_dofs]))
    )
    qc = ev.quad_coords(mesh)
    n1 = sub + 1
    V = cv.reshape(-1, n1, n1, n1)  # (E, z, y, x)
    Q = qc.reshape(-1, n1, n1, n1, 3)

    def corners(A):
        return np.stack(
            [
                A[:, :-1, :-1, :-1], A[:, :-1, :-1, 1:],
                A[:, :-1, 1:, :-1], A[:, :-1, 1:, 1:],
                A[:, 1:, :-1, :-1], A[:, 1:, :-1, 1:],
                A[:, 1:, 1:, :-1], A[:, 1:, 1:, 1:],
            ],
            axis=-1,
        ).reshape(-1, 8)

    cvals = corners(V)
    ccoords = np.stack([corners(Q[..., d]) for d in range(3)], axis=-1)
    # only sub-cells straddling zero contribute
    straddle = (cvals.min(axis=1) <= 0) & (cvals.max(axis=1) >= 0)
    return marching_tetrahedra_cells(cvals[straddle], ccoords[straddle])


def compute_force_vector_sharp_interface(
    u_space, segments: np.ndarray, sigma: float, kappa_at, normal_at
):
    """Surface-tension force integral over interface elements, scattered to
    the background velocity space (compute_force_vector_sharp_interface,
    sharp_interface_util.h:332-441): sum_s sigma kappa(x_s) n(x_s) |s|
    phi_i(x_s) with midpoint/centroid quadrature. `segments` is a
    (n, 2, 2) segment array (2D) or a (n, 3, 3) triangle soup (3D)."""
    dim = 2 if (len(segments) == 0 or segments.shape[1] == 2) else 3
    if len(segments) == 0:
        return np.zeros((dim, u_space.n_dofs_padded))
    mid = segments.mean(axis=1)
    if dim == 2:
        seg = segments[:, 1] - segments[:, 0]
        measure = np.linalg.norm(seg, axis=1)
    else:
        cr = np.cross(
            segments[:, 1] - segments[:, 0], segments[:, 2] - segments[:, 0]
        )
        measure = 0.5 * np.linalg.norm(cr, axis=1)
    kappa = kappa_at(mid)
    normal = normal_at(mid)
    w = sigma * kappa[None, :] * normal * measure[None, :]
    return scatter_at_points(u_space, mid, w, n_components=dim)


# ---------------------------------------------------------------------------
class SharpInterfaceSolver:
    """Common driver interface (sharp_interface.h:491-499)."""

    def advance_time_step(self):
        raise NotImplementedError

    def output_solution(self, filename: str) -> None:
        pass


class FrontTrackingSolver(SharpInterfaceSolver):
    """Explicit interface tracking (sharp_interface.h:503-749)."""

    def __init__(self, navier_stokes, surface_mesh: SurfaceMesh) -> None:
        self.ns = navier_stokes
        self.surface = surface_mesh
        self._update_phases()

    def _update_phases(self) -> None:
        ns = self.ns
        par = ns.parameters
        if par.density_diff == 0 and par.viscosity_diff == 0:
            return
        qp = ns.operator.ev_u.quad_coords(ns.mesh).reshape(-1, ns.dim)
        # heaviside = 1 outside the bubble (positive level set outside in
        # the rising-bubble convention)
        if ns.dim == 3:
            from adaflo_tpu.utils.point_eval import solid_angle_inside

            inside = solid_angle_inside(
                self.surface.points, self.surface.triangles, qp
            )
        else:
            inside = winding_number_inside(self.surface.points, qp)
        H = np.where(inside, 0.0, 1.0).reshape(ns.mesh.n_cells, -1)
        rho = par.density + par.density_diff * H
        mu = par.viscosity + par.viscosity_diff * H
        ns.coefficients = Coefficients(jnp.asarray(rho), jnp.asarray(mu), None)

    def _compute_force(self) -> None:
        ns = self.ns
        par = ns.parameters
        if ns.dim == 3:
            mid, normal, lengths, kappa = self.surface.triangle_data()
        else:
            mid, normal, lengths, kappa = self.surface.segment_data()
        w = par.surface_tension * kappa[None, :] * normal.T * lengths[None, :]
        f = scatter_at_points(ns.u_space, mid, w, n_components=ns.dim)
        # gravity body force
        rho = ns.coefficients.rho
        if rho is None:
            rho = par.density
        g_cells = ns.operator.ev_u.integrate_values(
            -par.gravity * (rho if not np.isscalar(rho) else rho * jnp.ones(
                (ns.mesh.n_cells, ns.operator.ev_u.n_q)))
        )
        g = ns.operator.lat_u.scatter_add(g_cells)
        user = jnp.asarray(f)
        user = user.at[ns.dim - 1].add(g)
        for c in range(ns.dim):
            cd = ns.constraints_u[c].constrained_dofs
            if len(cd):
                user = user.at[c, cd].set(0.0)
        ns.user_rhs[0] = user

    def advance_time_step(self):
        ns = self.ns
        ns.init_time_advance()
        # move the interface with the (extrapolated) velocity
        self.surface.move(
            ns.u_space, ns.solution[0], ns.time_stepping.step_size()
        )
        self._update_phases()
        self._compute_force()
        return ns.evaluate_time_step()


class MixedLevelSetSolver(SharpInterfaceSolver):
    """Level set on the background mesh; surface tension sharp (from
    marching-squares contouring) or regularized (sharp_interface.h:753-1074).
    """

    def __init__(
        self,
        navier_stokes,
        initial_distance_fn,
        sharp: bool = True,
        surface_mesh: Optional[SurfaceMesh] = None,
    ) -> None:
        self.ns = navier_stokes
        self.sharp = sharp
        self.surface = surface_mesh
        self.level_set = LevelSetSolver(navier_stokes, navier_stokes.parameters)
        self.level_set.set_initial_condition(initial_distance_fn)
        self.level_set.reinitialize(
            navier_stokes.parameters.n_initial_reinit_steps
        )

    def _heaviside(self):
        from adaflo_tpu.twophase.level_set_okz import _discrete_heaviside

        par = self.ns.parameters
        c = self.level_set.solution
        cutoff = np.tanh(2.0)
        eps = 1e-12
        c_cl = jnp.clip(c, -1 + eps, 1 - eps)
        distance = jnp.where(
            c < -cutoff,
            -3.0,
            jnp.where(c > cutoff, 3.0, jnp.log((1 + c_cl) / (1 - c_cl))),
        )
        distance = distance * (par.epsilon * 2.0 / par.concentration_subdivisions)
        return _discrete_heaviside(distance)

    def _compute_force(self) -> None:
        ns = self.ns
        par = ns.parameters
        ls = self.level_set
        ls.compute_curvature()
        heav = self._heaviside()
        # variable coefficients from the heaviside
        user, rho_q, mu_q = ls.ops.compute_force(heav, ls.curvature)
        if self.sharp:
            # replace the regularized surface-tension part with the sharp
            # surface integral over the reconstructed contour
            if ns.dim == 3:
                segs = marching_tetrahedra(ls.ls_space, ls.solution)
            else:
                segs = marching_squares(ls.ls_space, ls.solution)
            kappa_at = lambda x: evaluate_at_points(
                ls.ls_space, np.asarray(ls.curvature), x
            )
            nrm = np.asarray(ls.normal_vector_field)

            def normal_at(x):
                nv = evaluate_at_points(ls.ls_space, nrm, x)
                nn = np.linalg.norm(nv, axis=0)
                return nv / np.maximum(nn, 1e-12)

            f_sharp = compute_force_vector_sharp_interface(
                ns.u_space, segs, par.surface_tension, kappa_at, normal_at
            )
            # user currently holds regularized tension + gravity; rebuild:
            # gravity only + sharp tension
            rho = rho_q if rho_q is not None else par.density
            g_cells = ns.operator.ev_u.integrate_values(
                -par.gravity
                * (
                    rho
                    if not np.isscalar(rho)
                    else rho * jnp.ones((ns.mesh.n_cells, ns.operator.ev_u.n_q))
                )
            )
            g = ns.operator.lat_u.scatter_add(g_cells)
            user = jnp.asarray(f_sharp)
            user = user.at[ns.dim - 1].add(g)
        for c in range(ns.dim):
            cd = ns.constraints_u[c].constrained_dofs
            if len(cd):
                user = user.at[c, cd].set(0.0)
        ns.user_rhs[0] = user
        if rho_q is not None:
            ns.coefficients = Coefficients(rho_q, mu_q, None)

    def advance_time_step(self):
        ns = self.ns
        ns.init_time_advance()
        self.level_set.solve()
        if self.surface is not None:
            self.surface.move(
                ns.u_space, ns.solution[0], ns.time_stepping.step_size()
            )
        self._compute_force()
        return ns.evaluate_time_step()


# ---------------------------------------------------------------------------
class TriSurfaceMesh:
    """Closed 3D triangle-mesh interface (the codim-1 surface Triangulation
    of the reference's dim-templated front tracking, sharp_interface.h:503-
    749). Vertices move with the flow; triangles stay fixed topology."""

    def __init__(self, vertices: np.ndarray, triangles: np.ndarray) -> None:
        self.points = np.asarray(vertices, dtype=np.float64)
        self.triangles = np.asarray(triangles, dtype=np.int64)

    @classmethod
    def hyper_sphere(cls, center, radius: float, n_refinements: int = 3):
        """Icosphere: subdivided icosahedron projected to the sphere,
        consistently outward-oriented."""
        phi = (1.0 + np.sqrt(5.0)) / 2.0
        v = np.array(
            [
                [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
                [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
                [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
            ],
            dtype=np.float64,
        )
        v /= np.linalg.norm(v, axis=1)[:, None]
        f = np.array(
            [
                [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
            ]
        )
        for _ in range(n_refinements):
            mid_cache = {}
            verts = list(v)

            def midpoint(a, b):
                key = (min(a, b), max(a, b))
                if key not in mid_cache:
                    m = verts[a] + verts[b]
                    m /= np.linalg.norm(m)
                    mid_cache[key] = len(verts)
                    verts.append(m)
                return mid_cache[key]

            nf = []
            for a, b, c in f:
                ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
                nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
            v = np.asarray(verts)
            f = np.asarray(nf)
        center = np.asarray(center, dtype=np.float64)
        return cls(center[None, :] + radius * v, f)

    def move(self, u_space, velocity, dt: float) -> None:
        """RK2 vertex advection with the background velocity (the
        update_position_vector analog, sharp_interface_util.h:52-123)."""
        u = np.asarray(velocity)
        v1 = evaluate_at_points(u_space, u, self.points).T
        mid = self.points + 0.5 * dt * v1
        v2 = evaluate_at_points(u_space, u, mid).T
        self.points = self.points + dt * v2

    def triangle_data(self):
        """(centroids (T,3), unit normals (T,3), areas (T,), mean curvature
        at centroids (T,)). Normals follow the construction orientation
        (outward for hyper_sphere); curvature from the cotangent-Laplacian
        mean-curvature vector averaged onto triangles (the surface
        compute_curvature projection analog, sharp_interface_util.h:443-537)."""
        p = self.points
        t = self.triangles
        tri = p[t]  # (T, 3, 3)
        e1 = tri[:, 1] - tri[:, 0]
        e2 = tri[:, 2] - tri[:, 0]
        cr = np.cross(e1, e2)
        areas2 = np.linalg.norm(cr, axis=1)
        normals = cr / np.maximum(areas2, 1e-300)[:, None]
        areas = 0.5 * areas2
        centroids = tri.mean(axis=1)

        # cotangent Laplacian: H_i = (1 / (2 A_i)) sum_j (cot a + cot b)(x_i - x_j)
        nv = len(p)
        Hvec = np.zeros((nv, 3))
        Avor = np.zeros(nv)
        for k in range(3):
            i = t[:, k]
            j = t[:, (k + 1) % 3]
            o = t[:, (k + 2) % 3]
            # cot of the angle at o, opposite edge (i, j)
            u_ = p[i] - p[o]
            v_ = p[j] - p[o]
            cot = np.einsum("td,td->t", u_, v_) / np.maximum(
                np.linalg.norm(np.cross(u_, v_), axis=1), 1e-300
            )
            d = p[i] - p[j]
            np.add.at(Hvec, i, 0.5 * cot[:, None] * d)
            np.add.at(Hvec, j, -0.5 * cot[:, None] * d)
            np.add.at(Avor, i, areas / 3.0)
        Hvec /= np.maximum(Avor, 1e-300)[:, None]
        # signed mean curvature: positive when the curvature vector points
        # AGAINST the outward normal (sphere: kappa = 2/R ... sign matches
        # the 2D convention of segment_data)
        vn = np.zeros((nv, 3))
        np.add.at(vn, t[:, 0], cr)
        np.add.at(vn, t[:, 1], cr)
        np.add.at(vn, t[:, 2], cr)
        vn /= np.maximum(np.linalg.norm(vn, axis=1), 1e-300)[:, None]
        kappa_v = -np.einsum("vd,vd->v", Hvec, vn)
        kappa = kappa_v[t].mean(axis=1)
        return centroids, normals, areas, kappa
