"""Matrix-free operators of the conservative (OKZ) level-set method.

TPU-native re-design of the reference's four operator classes
(level_set_okz_advance_concentration.cc, level_set_okz_compute_normal.cc,
level_set_okz_compute_curvature.cc, level_set_okz_reinitialization.cc) plus
the shared projection operator (level_set_okz.cc:239-313) and the surface
tension force kernel (level_set_okz.cc:317-409):

- LS advection: rhs = -(c w + u . grad c + BDF old terms), system
  (c w + u . grad c) with frozen per-q-point `evaluated_convection`,
- normal projection: rhs (v, grad c); system = the damped-Helmholtz
  projection operator: mass + 4 max(h/sub, eps_used/eps)^2 Laplacian,
- curvature: rhs (v, -div(n/|n|)) with dof-level normalization, same system,
- OKZ reinitialization: compression-diffusion steps with the normal frozen
  at the first reinit step.

The concentration space is FE_Q_iso_Q1 (hat functions on a subdivided
lattice), evaluated at the QIterated(Gauss 2, subdiv) rule — the same batched
tensor-contraction machinery as every other operator, only the tabulated 1D
matrices differ. Solvers replace the reference's assembled Trilinos
projection matrix + ILU with matrix-free CG + Chebyshev/Jacobi.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.basis import iterated_gauss_quadrature
from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.ops.lattice import LatticeOps
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.ops.tensor import CellEvaluator
from adaflo_tpu.parameters import FlowParameters


class LevelSetOperators:
    def __init__(
        self,
        parameters: FlowParameters,
        ls_space: ScalarSpace,
        u_space: ScalarSpace,
        p_space: ScalarSpace,
        constraints_ls: Constraints,
        constraints_normals: Constraints,
        constraints_curvature: Constraints,
        epsilon_used: float,
        cell_diameter: float,
        minimal_edge_length: float,
    ) -> None:
        self.parameters = parameters
        self.ls_space = ls_space
        self.u_space = u_space
        self.p_space = p_space
        self.con_ls = constraints_ls
        self.con_nrm = constraints_normals
        self.con_curv = constraints_curvature
        self.dim = ls_space.dim
        mesh = ls_space.mesh
        sub = parameters.concentration_subdivisions
        self.subdiv = sub
        self.is_forest = getattr(ls_space, "is_forest", False)
        self.is_simplex = getattr(ls_space, "is_simplex", False)
        self.is_mapped = (
            getattr(ls_space, "is_mapped", False) and not self.is_simplex
        )

        q_ls = iterated_gauss_quadrature(sub, 2)
        nq_ns = parameters.velocity_degree + 1
        if self.is_simplex:
            # simplex meshes: QGaussSimplex(deg+1) rules (two_phase_base.cc
            # simplex quadrature branch); LS space is FE_SimplexP(sub)
            from adaflo_tpu.ops.lattice import IndexMapOps
            from adaflo_tpu.ops.mapped import SimplexEvaluator

            n_ls = ls_space.degree + 1
            self.ev_ls = SimplexEvaluator(ls_space, n_ls)
            self.ev_u_lsq = SimplexEvaluator(u_space, n_ls)
            self.ev_ls_nsq = SimplexEvaluator(ls_space, nq_ns)
            self.ev_p_nsq = SimplexEvaluator(p_space, nq_ns)
            self.ev_u_nsq = SimplexEvaluator(u_space, nq_ns)
            self.lat_ls = IndexMapOps.for_space(ls_space)
            self.lat_u = IndexMapOps.for_space(u_space)
        elif self.is_forest:
            # adaptive forest: per-cell geometry + index-map gather/scatter
            from adaflo_tpu.ops.lattice import IndexMapOps
            from adaflo_tpu.ops.tensor import VariableCellEvaluator

            hc = ls_space.h_cells
            self.ev_ls = VariableCellEvaluator(self.dim, ls_space.basis, q_ls, hc)
            self.ev_u_lsq = VariableCellEvaluator(self.dim, u_space.basis, q_ls, hc)
            self.ev_ls_nsq = VariableCellEvaluator(self.dim, ls_space.basis, nq_ns, hc)
            self.ev_p_nsq = VariableCellEvaluator(self.dim, p_space.basis, nq_ns, hc)
            self.ev_u_nsq = VariableCellEvaluator(self.dim, u_space.basis, nq_ns, hc)
            self.lat_ls = IndexMapOps.for_space(ls_space)
            self.lat_u = IndexMapOps.for_space(u_space)
        elif getattr(ls_space, "is_extruded", False):
            # curved 2D base x z-lattice (3D micro_particle)
            from adaflo_tpu.ops.lattice import IndexMapOps
            from adaflo_tpu.ops.mapped import Extruded3DEvaluator

            self.ev_ls = Extruded3DEvaluator(ls_space, q_ls)
            self.ev_u_lsq = Extruded3DEvaluator(u_space, q_ls)
            self.ev_ls_nsq = Extruded3DEvaluator(ls_space, nq_ns)
            self.ev_p_nsq = Extruded3DEvaluator(p_space, nq_ns)
            self.ev_u_nsq = Extruded3DEvaluator(u_space, nq_ns)
            self.lat_ls = IndexMapOps.for_space(ls_space)
            self.lat_u = IndexMapOps.for_space(u_space)
        elif self.is_mapped:
            # unstructured (curved) meshes: full-Jacobian evaluators shared
            # through the spaces' CellMapping
            from adaflo_tpu.ops.lattice import IndexMapOps
            from adaflo_tpu.ops.mapped import MappedEvaluator

            mp = ls_space.mapping
            self.ev_ls = MappedEvaluator(self.dim, ls_space.basis, q_ls, mp)
            self.ev_u_lsq = MappedEvaluator(self.dim, u_space.basis, q_ls, mp)
            self.ev_ls_nsq = MappedEvaluator(self.dim, ls_space.basis, nq_ns, mp)
            self.ev_p_nsq = MappedEvaluator(self.dim, p_space.basis, nq_ns, mp)
            self.ev_u_nsq = MappedEvaluator(self.dim, u_space.basis, nq_ns, mp)
            self.lat_ls = IndexMapOps.for_space(ls_space)
            self.lat_u = IndexMapOps.for_space(u_space)
        else:
            self.ev_ls = CellEvaluator(self.dim, ls_space.basis, q_ls, mesh.h)
            self.ev_u_lsq = CellEvaluator(self.dim, u_space.basis, q_ls, mesh.h)
            # NS quadrature (Gauss velocity_degree+1) for the force kernel
            self.ev_ls_nsq = CellEvaluator(self.dim, ls_space.basis, nq_ns, mesh.h)
            self.ev_p_nsq = CellEvaluator(self.dim, p_space.basis, nq_ns, mesh.h)
            self.ev_u_nsq = CellEvaluator(self.dim, u_space.basis, nq_ns, mesh.h)
            self.lat_ls = LatticeOps.for_space(ls_space)
            self.lat_u = LatticeOps.for_space(u_space)

        self.cd_ls = jnp.asarray(ls_space.cell_dofs)
        self.cd_u = jnp.asarray(u_space.cell_dofs)
        self.cd_p = jnp.asarray(p_space.cell_dofs)
        self.n_q = self.ev_ls.n_q

        self.epsilon_used = epsilon_used
        self.cell_diameter = cell_diameter  # max |J eigenvalue| = max(h)
        self.minimal_edge_length = minimal_edge_length
        if self.is_forest or self.is_mapped or self.is_simplex:
            # per-cell diameter = max Jacobian eigenvalue (util.h:47-120);
            # diffusion/damping follow the per-cell formulas of
            # reinit.cc:82-86 and compute_normal.cc:108-112
            if self.is_forest:
                diam = np.max(ls_space.h_cells, axis=1)  # (E,)
            elif self.is_simplex:
                from adaflo_tpu.fe.simplex import simplex_cell_diameters

                diam, _, _ = simplex_cell_diameters(ls_space.mesh)
            elif getattr(ls_space, "is_extruded", False):
                diam, _, _ = ls_space.mesh.diameters()  # (E3,)
            else:
                diam, _, _ = ls_space.mapping.cell_diameters()
            self.reinit_diffusion = jnp.asarray(np.maximum(epsilon_used, diam / sub))
            self.projection_damping = jnp.asarray(
                4.0
                * np.maximum(epsilon_used / parameters.epsilon, diam / sub) ** 2
            )
        else:
            # uniform mesh: plain scalars
            # reinit diffusion: max(eps_used, h/sub) (reinit.cc:82-86)
            self.reinit_diffusion = max(epsilon_used, cell_diameter / sub)
            # projection damping: 4 max(h/sub, eps_used/eps)^2 (okz.cc:270-281)
            self.projection_damping = 4.0 * max(
                epsilon_used / parameters.epsilon, cell_diameter / sub
            ) ** 2
            # normal-operator damping (damping_scale_factor = 4,
            # compute_normal.h:66) coincides with projection_damping here

        # residual-based artificial-viscosity stabilization of the
        # advection equation (adv.cc:344-369 per-cell viscosity, 420-474
        # volume terms, 569-620 boundary-flux correction)
        self.stabilization = bool(
            getattr(parameters, "convection_stabilization", False)
        )
        self._stab_faces_general = None
        if self.stabilization:
            if (
                self.is_mapped
                or self.is_simplex
                or getattr(ls_space, "is_extruded", False)
            ):
                # curved / simplex / extruded meshes: the boundary-flux
                # correction uses REAL per-face quadrature with the full
                # cell geometry (one dense (n_loc, n_loc) matrix per
                # boundary face; the reference's FEFaceValues path,
                # adv.cc:569-620). The volume terms already ride the
                # general evaluators; the per-cell viscosity length scale
                # is the Jacobian-eigenvalue diameter computed above.
                verts = self._mesh_vertices_for_diameter(ls_space)
                self.omega_diameter = float(
                    np.linalg.norm(verts.max(axis=0) - verts.min(axis=0))
                )
                self._stab_cell_diameter = jnp.asarray(diam)
                self._stab_faces = {}
                self._stab_faces_general = self._build_stab_faces_general()
            else:
                # diameter_on_coarse_grid of a hyper-rectangle = its
                # diagonal
                self.omega_diameter = float(np.linalg.norm(mesh.lengths))
                if self.is_forest:
                    # per-cell viscosity length scale (adv.cc:344-369
                    # reads the cell diameter per cell)
                    self._stab_cell_diameter = jnp.asarray(
                        np.max(np.asarray(ls_space.h_cells), axis=1)
                    )
                else:
                    self._stab_cell_diameter = self.cell_diameter
                self._stab_faces = self._build_stab_faces()

        # interpolation of the concentration space onto pressure support
        # points (level_set_base.cc:65-137), for grad-pressure-compatible
        # surface tension: (n_p_local, n_ls_local)
        if self.is_simplex:
            P, _ = ls_space.element.tabulate(p_space.element.nodes)
        else:
            Vp1, _ = ls_space.basis.tabulate(p_space.basis.nodes)
            P = Vp1
            for _ in range(self.dim - 1):
                P = np.kron(Vp1, P)
        self.interp_ls_to_p = jnp.asarray(P)

    # -- gather/scatter helpers -----------------------------------------
    def _percell(self, fac, arr):
        """Multiply (E, ..., n_q) by a scalar or per-cell (E,) factor."""
        if np.isscalar(fac):
            return arr * fac
        return arr * fac.reshape((-1,) + (1,) * (arr.ndim - 1))

    def _gather_ls(self, c, con: Optional[Constraints] = None):
        if con is not None:
            c = con.resolve(c)
        return self.lat_ls.gather(c)

    def _scatter_ls(self, r_cells, con: Optional[Constraints] = None):
        r = self.lat_ls.scatter_add(r_cells)
        if con is not None:
            r = con.condense(r)
        return r

    def _gather_nrm(self, nv, con: Optional[Constraints] = None):
        if con is not None:
            nv = jnp.stack([con.resolve(nv[d]) for d in range(self.dim)])
        return jnp.stack(
            [self.lat_ls.gather(nv[d]) for d in range(self.dim)], axis=1
        )

    def _scatter_nrm(self, r_cells, con: Optional[Constraints] = None):
        rows = []
        for d in range(self.dim):
            r = self.lat_ls.scatter_add(r_cells[:, d, :])
            if con is not None:
                r = con.condense(r)
            rows.append(r)
        return jnp.stack(rows)

    # -- lumped mass / diagonals ----------------------------------------
    def lumped_mass(self):
        """Lumped LS mass diagonal (initialize_mass_matrix_diagonal,
        level_set_okz_preconditioner.h:31-76)."""
        ones = jnp.ones((self.ls_space.mesh.n_cells, self.n_q))
        return self._scatter_ls(self.ev_ls.integrate_values(ones))

    def projection_diagonal(self, damping=None):
        """Exact diagonal of the projection operator (mass + damped
        Laplacian), for Chebyshev/Jacobi. `damping` overrides the default
        projection damping (the matrix-based OKZ variant uses different
        constants, level_set_okz_matrix.cc:646-649, 750-753)."""
        E = self.ls_space.mesh.n_cells
        n_loc = self.ls_space.n_local
        units = jnp.eye(n_loc)
        if damping is None:
            damping = self.projection_damping

        def apply_unit(unit):
            pc = jnp.broadcast_to(unit[None], (E, n_loc))
            r = self.ev_ls.integrate_values(self.ev_ls.values(pc))
            r = r + self.ev_ls.integrate_gradients(
                self._percell(damping, self.ev_ls.gradients(pc))
            )
            return r

        # batch 4: see navier_stokes.velocity_block_diagonal (tile-padded
        # per-batch gradient temporaries)
        out = jax.lax.map(apply_unit, units, batch_size=min(n_loc, 4))
        idx = jnp.arange(n_loc)
        diag_loc = jnp.transpose(out[idx, :, idx], (1, 0))
        return self.lat_ls.scatter_add(diag_loc)

    # -- advection (adv.cc:288-397, 217-258) ----------------------------
    def _build_stab_faces(self):
        """Per boundary face (axis, side): the h-FREE local matrix
        T_unit[i, j] = sum_qf phi_i (n . d_a phi_j) w of the stabilization
        boundary-flux correction (adv.cc:569-620), plus a per-cell SCALE
        array carrying the geometry: prod_{b != a} h_b / h_a on cells whose
        (axis, side) face lies on the domain boundary, 0 elsewhere. The
        separation is exact on axis-aligned cells (uniform lattices AND
        adaptive forests), so one constant matrix serves variable cell
        sizes. Symmetry faces are excluded (the reference skips them) via
        set_stab_symmetry_faces."""
        mesh = self.ls_space.mesh
        basis = self.ls_space.basis
        pts, wts = iterated_gauss_quadrature(self.subdiv, 2)
        V1, _ = basis.tabulate(pts)
        Ve, De = basis.tabulate(np.array([0.0, 1.0]))
        d = self.dim
        if self.is_forest:
            centers = np.asarray(self.ls_space.cell_center, np.float64)
            h_cells = np.asarray(self.ls_space.h_cells, np.float64)
            origin = np.asarray(mesh.origin, np.float64)
            far = origin + np.asarray(mesh.lengths, np.float64)
        else:
            h_uni = np.asarray(mesh.h, np.float64)
        faces = {}
        for a in range(d):
            for side in (0, 1):
                mats_phi, mats_dn, wlist = [], [], []
                # kron order: slowest (z) axis first, x last — matching the
                # lexicographic x-fastest local dof flattening
                for b in reversed(range(d)):
                    if b == a:
                        mats_phi.append(Ve[side : side + 1, :])
                        mats_dn.append(De[side : side + 1, :])
                    else:
                        mats_phi.append(V1)
                        mats_dn.append(V1)
                        wlist.append(wts)
                Phi, Dn = mats_phi[0], mats_dn[0]
                for mp_, md_ in zip(mats_phi[1:], mats_dn[1:]):
                    Phi = np.kron(Phi, mp_)
                    Dn = np.kron(Dn, md_)
                wf = wlist[0] if wlist else np.ones(1)
                for w2 in wlist[1:]:
                    wf = np.kron(wf, w2)
                sign = -1.0 if side == 0 else 1.0
                T = (Phi * wf[:, None]).T @ (sign * Dn)
                rest = [b for b in range(d) if b != a]
                if self.is_forest:
                    face_pos = centers[:, a] + (
                        0.5 if side == 1 else -0.5
                    ) * h_cells[:, a]
                    bound = far[a] if side == 1 else origin[a]
                    on = (
                        np.abs(face_pos - bound)
                        < 1e-10 * max(1.0, abs(bound))
                    )
                    m = np.where(
                        on,
                        np.prod(h_cells[:, rest], axis=1) / h_cells[:, a],
                        0.0,
                    )
                else:
                    scale = float(np.prod(h_uni[rest]) / h_uni[a])
                    cshape = tuple(reversed(mesh.n_cells_axis))
                    m = np.zeros(cshape, np.float64)
                    idx = [slice(None)] * d
                    idx[d - 1 - a] = (
                        0 if side == 0 else mesh.n_cells_axis[a] - 1
                    )
                    m[tuple(idx)] = scale
                    m = m.reshape(-1)
                faces[(a, side)] = (jnp.asarray(T), jnp.asarray(m))
        return faces

    def set_stab_symmetry_faces(self, axis_sides) -> None:
        """Drop the stabilization boundary term on symmetry faces
        (adv.cc:432-434): axis_sides = iterable of (axis, side)."""
        if not self.stabilization:
            return
        for key in axis_sides:
            self._stab_faces.pop(tuple(key), None)
        if self._stab_faces_general is not None:
            drop = {tuple(k) for k in axis_sides}
            cells, T, tags = self._stab_faces_general
            keep = np.array(
                [t not in drop for t in tags], dtype=bool
            )
            self._stab_faces_general = (
                cells[np.where(keep)[0]], T[np.where(keep)[0]],
                [t for t, k in zip(tags, keep) if k],
            )

    def _stab_face_term(self, c_loc, nu_art):
        """(E, n_loc) local dofs -> (E, n_loc) boundary flux
        T(v)_i = sum_faces \\oint phi_i (n . nu grad v) dS."""
        out = jnp.zeros_like(c_loc)
        for T, m in self._stab_faces.values():
            out = out + (m * nu_art)[:, None] * (c_loc @ T.T)
        if self._stab_faces_general is not None:
            cells, Tg, _ = self._stab_faces_general
            if len(cells):
                contrib = jnp.einsum(
                    "fij,fj->fi", Tg, c_loc[cells]
                ) * (
                    nu_art[cells][:, None]
                    if not np.isscalar(nu_art) and jnp.ndim(nu_art)
                    else nu_art
                )
                out = out.at[cells].add(contrib)
        return out

    @staticmethod
    def _mesh_vertices_for_diameter(sp) -> np.ndarray:
        """All mesh vertex coordinates (for the coarse-grid diameter of
        the artificial-viscosity scaling, adv.cc get_diameter)."""
        if getattr(sp, "is_extruded", False):
            base = sp.mesh.base.vertices
            lo = np.concatenate([base.min(axis=0), [sp.mesh.z0]])
            hi = np.concatenate(
                [base.max(axis=0), [sp.mesh.z0 + sp.mesh.height]]
            )
            return np.stack([lo, hi])
        return np.asarray(sp.mesh.vertices)

    @staticmethod
    def _tensor_tab(basis, pts):
        """Full tensor tabulation of a 1D basis at 2D reference points:
        (V (n_p, n_loc), D (n_p, n_loc, 2)), x-fastest local flattening."""
        Vx, Dx = basis.tabulate(pts[:, 0])
        Vy, Dy = basis.tabulate(pts[:, 1])
        V = np.einsum("pj,pi->pji", Vy, Vx).reshape(len(pts), -1)
        D0 = np.einsum("pj,pi->pji", Vy, Dx).reshape(len(pts), -1)
        D1 = np.einsum("pj,pi->pji", Dy, Vx).reshape(len(pts), -1)
        return V, np.stack([D0, D1], axis=-1)

    def _mapped_face_mats(self, sp, t, w):
        """Per boundary face of a curved-quad base: (cell, T (n,n), tag)
        with T[i,j] = oint phi_i (n . grad phi_j) dS on the face, built
        from the isoparametric mapping's Jacobians (exact for the
        piecewise basis with the iterated rule in `t`, `w`)."""
        mesh = sp.mesh
        mp = sp.mapping
        z = np.zeros_like(t)
        o = np.ones_like(t)
        ref = {
            0: np.stack([t, z], 1),
            1: np.stack([t, o], 1),
            2: np.stack([z, t], 1),
            3: np.stack([o, t], 1),
        }
        tab = {lf: self._tensor_tab(sp.basis, ref[lf]) for lf in range(4)}
        jac = {lf: mp.jacobians(ref[lf]) for lf in range(4)}
        centers = mesh.cell_centers()
        param_axis = {0: 0, 1: 0, 2: 1, 3: 1}
        out = []
        for key in mesh.boundary_edge_keys:
            e, lf = sp._edge_adj[key]
            V2, D2 = tab[lf]
            J, X = jac[lf]
            Je, Xe = J[e], X[e]  # (n_q, 2, 2), (n_q, 2)
            Jinv = np.linalg.inv(Je)  # (n_q, 2, 2)
            grad = np.einsum("qba,qjb->qja", Jinv, D2)  # J^{-T} D
            tang = Je[:, :, param_axis[lf]]  # (n_q, 2)
            tlen = np.linalg.norm(tang, axis=1)
            nrm = np.stack([tang[:, 1], -tang[:, 0]], 1) / tlen[:, None]
            if np.dot(nrm.mean(axis=0), Xe.mean(axis=0) - centers[e]) < 0:
                nrm = -nrm
            ndg = np.einsum("qa,qja->qj", nrm, grad)  # (n_q, n_loc)
            T = np.einsum("q,qi,qj->ij", w * tlen, V2, ndg)
            tag = None
            if np.allclose(nrm, nrm[0:1], atol=1e-12):
                for a in range(2):
                    if abs(abs(nrm[0, a]) - 1.0) < 1e-12:
                        tag = (a, 1 if nrm[0, a] > 0 else 0)
            out.append((e, T, tag, nrm, tlen, V2, ndg, w))
        return out

    def _build_stab_faces_general(self):
        """(cells (F,), T (F, n_loc, n_loc), tags) for every domain-
        boundary face on mapped / simplex / extruded meshes — the
        FEFaceValues-grade counterpart of the lattice path's separable
        matrices (adv.cc:569-620)."""
        sp = self.ls_space
        t, w = iterated_gauss_quadrature(self.subdiv, 2)
        cells, mats, tags = [], [], []
        if self.is_simplex:
            from adaflo_tpu.mesh.unstructured import TriMesh

            mesh = sp.mesh
            centers = mesh.cell_centers()
            V1d = None
            for key in mesh.boundary_edge_keys:
                e, lf = sp._edge_adj[key]
                cell = mesh.cells[e]
                a, b = TriMesh._LOCAL_EDGES[lf]
                # reference triangle vertices
                rv = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
                pts = rv[a][None, :] + t[:, None] * (rv[b] - rv[a])[None, :]
                V, D = sp.element.tabulate(pts)  # (n_q, n), (n_q, n, 2)
                v = mesh.vertices[cell]
                Jc = np.stack([v[1] - v[0], v[2] - v[0]], axis=-1)
                Jinv = np.linalg.inv(Jc)
                grad = np.einsum("ba,qjb->qja", Jinv, D)
                pa, pb = mesh.vertices[cell[a]], mesh.vertices[cell[b]]
                tangp = pb - pa
                tlen = np.linalg.norm(tangp)
                nrm = np.array([tangp[1], -tangp[0]]) / tlen
                mid = 0.5 * (pa + pb)
                if np.dot(nrm, mid - centers[e]) < 0:
                    nrm = -nrm
                ndg = np.einsum("a,qja->qj", nrm, grad)
                T = np.einsum("q,qi,qj->ij", w * tlen, V, ndg)
                cells.append(e)
                mats.append(T)
                tag = None
                for ax in range(2):
                    if abs(abs(nrm[ax]) - 1.0) < 1e-12:
                        tag = (ax, 1 if nrm[ax] > 0 else 0)
                tags.append(tag)
        elif getattr(sp, "is_extruded", False):
            mesh = sp.mesh
            bsp = sp.base_space
            E2 = mesh.base.n_cells
            Nz = mesh.n_slices
            n12 = bsp.n_local
            # 1D z factors on the iterated rule
            Vz, Dz = sp.basis.tabulate(t)
            Mz = (Vz * w[:, None]).T @ Vz * mesh.h_z  # (n1, n1)
            # lateral faces: base boundary-edge matrix x z mass
            for e2, T2, tag, *_ in self._mapped_face_mats(bsp, t, w):
                T3 = np.kron(Mz, T2)  # lz-major local ordering
                for kz in range(Nz):
                    cells.append(kz * E2 + e2)
                    mats.append(T3)
                    tags.append(tag)
            # top/bottom: +-dphi_z/dz x curved base mass
            Vq, _ = self._tensor_tab(bsp.basis, np.stack(
                [np.tile(t, len(t)), np.repeat(t, len(t))], axis=1
            ))
            J2, _ = bsp.mapping.jacobians(np.stack(
                [np.tile(t, len(t)), np.repeat(t, len(t))], axis=1
            ))
            detJ = np.abs(np.linalg.det(J2))  # (E2, n_q2)
            w2 = np.kron(w, w)
            M2 = np.einsum("eq,q,qi,qj->eij", detJ, w2, Vq, Vq)
            Ve, De = sp.basis.tabulate(np.array([0.0, 1.0]))
            for side, kz, sgn in ((0, 0, -1.0), (1, Nz - 1, 1.0)):
                Tz = sgn * np.outer(Ve[side], De[side]) / mesh.h_z
                for e2 in range(E2):
                    cells.append(kz * E2 + e2)
                    mats.append(np.kron(Tz, M2[e2]))
                    tags.append((2, side))
        else:  # curved 2D quads
            for e, T, tag, *_ in self._mapped_face_mats(sp, t, w):
                cells.append(e)
                mats.append(T)
                tags.append(tag)
        if not cells:
            return (
                jnp.asarray(np.empty(0, np.int64)),
                jnp.asarray(
                    np.empty((0, sp.n_local, sp.n_local))
                ),
                [],
            )
        return (
            jnp.asarray(np.asarray(cells, np.int64)),
            jnp.asarray(np.stack(mats)),
            tags,
        )

    def advection_rhs(
        self,
        c,
        c_old,
        c_old_old,
        u,
        u_old,
        u_old_old,
        tw,
        bdf2_old_old,
        old_dt=None,
    ):
        """Returns (rhs, evaluated_convection (E, dim, n_q), nu_art) where
        nu_art is the per-cell artificial viscosity (None when convection
        stabilization is off, adv.cc:344-369)."""
        cc = self._gather_ls(c)
        co = self._gather_ls(c_old)
        coo = self._gather_ls(c_old_old)
        c_val = self.ev_ls.values(cc)
        c_grad = self.ev_ls.gradients(cc)
        co_val = self.ev_ls.values(co)
        coo_val = self.ev_ls.values(coo)
        uc = jnp.stack([self.lat_u.gather(u[d]) for d in range(self.dim)], axis=1)
        u_val = self.ev_u_lsq.values(uc)  # (E, dim, n_q)

        nu_art = None
        if self.stabilization:
            co_grad = self.ev_ls.gradients(co)
            coo_grad = self.ev_ls.gradients(coo)
            uo = jnp.stack(
                [self.lat_u.gather(u_old[d]) for d in range(self.dim)], axis=1
            )
            uoo = jnp.stack(
                [self.lat_u.gather(u_old_old[d]) for d in range(self.dim)],
                axis=1,
            )
            u_sum = self.ev_u_lsq.values(uo) + self.ev_u_lsq.values(uoo)
            dt_safe = jnp.maximum(jnp.asarray(old_dt, co_val.dtype), 1e-30)
            dc_dt = (co_val - coo_val) / dt_safe
            resid = jnp.abs(
                dc_dt
                + 0.25
                * jnp.einsum("edq,edq->eq", u_sum, co_grad + coo_grad)
            )
            max_res = jnp.max(resid, axis=-1)  # (E,)
            max_vel = jnp.max(
                jnp.sqrt(jnp.sum(u_sum * u_sum, axis=1)), axis=-1
            )
            # global max velocity at the SAME quadrature (the reference's
            # get_maximal_velocity over the current velocity, adv.cc:548-551)
            gmax = jnp.max(jnp.sqrt(jnp.sum(u_val * u_val, axis=1)))
            scaling = jnp.maximum(gmax * 2.0 * self.omega_diameter, 1e-30)
            nu_art = (
                0.03
                * max_vel
                * self._stab_cell_diameter  # per-cell on forests
                * jnp.minimum(1.0, max_res / scaling)
            )

        old_value = tw.weight_old * co_val
        if bdf2_old_old:
            old_value = old_value + tw.weight_old_old * coo_val
        residual = -(
            c_val * tw.weight
            + jnp.einsum("edq,edq->eq", u_val, c_grad)
            + old_value
        )
        r_cells = self.ev_ls.integrate_values(residual)
        if nu_art is not None:
            r_cells = r_cells + self.ev_ls.integrate_gradients(
                -nu_art[:, None, None] * c_grad
            )
            r_cells = r_cells + self._stab_face_term(cc, nu_art)
        rhs = self._scatter_ls(r_cells, self.con_ls)
        return rhs, u_val, nu_art

    def advection_vmult(self, dc, evaluated_convection, tw, mass_diag, nu_art=None):
        """(v, w dc + u* . grad dc) (+ stabilization terms, adv.cc:246-257 &
        420-474); constrained rows get the mass diagonal (adv.cc:476-479)."""
        cc = self._gather_ls(dc, self.con_ls)
        val = self.ev_ls.values(cc)
        grad = self.ev_ls.gradients(cc)
        res = val * tw.weight + jnp.einsum("edq,edq->eq", evaluated_convection, grad)
        r_cells = self.ev_ls.integrate_values(res)
        if nu_art is not None:
            r_cells = r_cells + self.ev_ls.integrate_gradients(
                nu_art[:, None, None] * grad
            )
            r_cells = r_cells - self._stab_face_term(cc, nu_art)
        out = self._scatter_ls(r_cells, self.con_ls)
        cd = self.con_ls.constrained_dofs
        if len(cd):
            out = out.at[cd].set(mass_diag[cd] * dc[cd])
        return out

    # -- normal (normal.cc:82-156, 207-278) ------------------------------
    def normal_rhs(self, c):
        cc = self._gather_ls(c)
        grad = self.ev_ls.gradients(cc)  # (E, dim, n_q)
        r = self.ev_ls.integrate_values(grad)  # batch over (E, dim)
        return self._scatter_nrm(r, self.con_nrm)

    def projection_vmult_block(self, nv, damping=None):
        """Projection operator applied to a (dim, n) block field."""
        if damping is None:
            damping = self.projection_damping
        cc = self._gather_nrm(nv, self.con_nrm)
        val = self.ev_ls.values(cc)
        grad = self.ev_ls.gradients(cc)
        r = self.ev_ls.integrate_values(val) + self.ev_ls.integrate_gradients(
            self._percell(damping, grad)
        )
        out = self._scatter_nrm(r, self.con_nrm)
        cd = self.con_nrm.constrained_dofs
        if len(cd):
            out = out.at[:, cd].set(nv[:, cd])
        return out

    def projection_vmult_scalar(self, kappa, damping=None):
        if damping is None:
            damping = self.projection_damping
        cc = self._gather_ls(kappa, self.con_curv)
        val = self.ev_ls.values(cc)
        grad = self.ev_ls.gradients(cc)
        r = self.ev_ls.integrate_values(val) + self.ev_ls.integrate_gradients(
            self._percell(damping, grad)
        )
        out = self._scatter_ls(r, self.con_curv)
        cd = self.con_curv.constrained_dofs
        if len(cd):
            out = out.at[cd].set(kappa[cd])
        return out

    # -- curvature (curv.cc:212-259) -------------------------------------
    def curvature_rhs(self, normal_field):
        """(v, -div(n/|n|)) with normalization at dof level
        (curv.cc:212-259: values >= 1e-2 in norm -> unit, else 0)."""
        nc = self._gather_nrm(normal_field)  # (E, dim, n_loc) plain read
        norm = jnp.sqrt(jnp.sum(nc * nc, axis=1, keepdims=True))
        nc = jnp.where(norm > 1e-2, nc / jnp.maximum(norm, 1e-30), 0.0)
        grad = self.ev_ls.gradients(nc)  # (E, dim, dim, n_q)
        div = jnp.trace(grad, axis1=1, axis2=2)
        return self._scatter_ls(self.ev_ls.integrate_values(-div), self.con_curv)

    # -- reinitialization (reinit.cc:53-189) ------------------------------
    def reinit_rhs(self, c, normal_field, first_step: bool, evaluated_normal, diffuse_only: bool):
        """Returns (rhs, evaluated_normal). evaluated_normal (E, dim, n_q) is
        refreshed when first_step."""
        cc = self._gather_ls(c)
        val = self.ev_ls.values(cc)
        grad = self.ev_ls.gradients(cc)
        diffusion = self.reinit_diffusion
        if diffuse_only:
            g = -self._percell(diffusion, grad)
            r = self.ev_ls.integrate_gradients(g)
            return self._scatter_ls(r, self.con_ls), evaluated_normal
        if first_step:
            nc = self._gather_nrm(normal_field)
            n_val = self.ev_ls.values(nc)
            nn = jnp.sqrt(jnp.sum(n_val * n_val, axis=1, keepdims=True))
            evaluated_normal = n_val / jnp.maximum(nn, 1e-4)
        n = evaluated_normal
        ngrad = jnp.einsum("edq,edq->eq", n, grad)
        coef = 0.5 * (1.0 - val * val) - self._percell(diffusion, ngrad)
        g = n * coef[:, None, :]
        r = self.ev_ls.integrate_gradients(g)
        return self._scatter_ls(r, self.con_ls), evaluated_normal

    def reinit_vmult(self, dc, evaluated_normal, dtau_inv, diffuse_only: bool, mass_diag):
        cc = self._gather_ls(dc, self.con_ls)
        val = self.ev_ls.values(cc)
        grad = self.ev_ls.gradients(cc)
        diffusion = self.reinit_diffusion
        if diffuse_only:
            g = self._percell(diffusion, grad)
        else:
            n = evaluated_normal
            ngrad = jnp.einsum("edq,edq->eq", n, grad)
            g = n * self._percell(diffusion, ngrad)[:, None, :]
        r = self.ev_ls.integrate_values(dtau_inv * val) + self.ev_ls.integrate_gradients(g)
        out = self._scatter_ls(r, self.con_ls)
        cd = self.con_ls.constrained_dofs
        if len(cd):
            out = out.at[cd].set(mass_diag[cd] * dc[cd])
        return out

    # -- surface tension force + variable coefficients (okz.cc:317-432) ---
    def compute_force(self, heaviside, curvature):
        """Returns (user_rhs_u (dim, n_u), rho_q (E, n_q_ns), mu_q) evaluated
        at the NS quadrature."""
        par = self.parameters
        hv = self.lat_ls.gather(heaviside)  # plain read
        kv = self.lat_ls.gather(curvature)
        h_val = self.ev_ls_nsq.values(hv)
        kappa = self.ev_ls_nsq.values(kv)

        use_var = par.density_diff != 0 or par.viscosity_diff != 0
        rho_q = mu_q = None
        if use_var:
            rho_q = par.density + par.density_diff * h_val
            mu_q = par.viscosity + par.viscosity_diff * h_val

        if par.interpolate_grad_onto_pressure:
            hp = jnp.einsum("ij,ej->ei", self.interp_ls_to_p, hv)
            grad_h = self.ev_p_nsq.gradients(hp)
        else:
            grad_h = self.ev_ls_nsq.gradients(hv)

        force = (par.surface_tension * kappa)[:, None, :] * grad_h
        rho_for_g = rho_q if use_var else par.density
        gravity_term = par.gravity * rho_for_g
        force = force.at[:, self.dim - 1, :].add(-gravity_term)

        r = self.ev_u_nsq.integrate_values(force)  # (E, dim, n_loc_u)
        rows = [self.lat_u.scatter_add(r[:, d, :]) for d in range(self.dim)]
        return jnp.stack(rows), rho_q, mu_q
