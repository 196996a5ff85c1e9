"""Cell evaluation/integration with full (non-Cartesian) Jacobians.

The unstructured-mesh counterpart of ops/tensor.py's evaluators: cells are
arbitrary mapped quadrilaterals (curved near manifolds, MappingQ-style), so
physical gradients apply the per-(cell, quadrature-point) inverse Jacobian
and the quadrature factor carries det J. This is exactly the general-path
geometry storage of deal.II's MatrixFree (the reference relies on it for the
flow_past_cylinder meshes, /root/reference/tests/flow_past_cylinder.cc).

Shapes follow the VariableCellEvaluator convention so operators are
evaluator-agnostic: inputs (E, ..., n_local) with cells leading; values
(E, ..., n_q); gradients carry the derivative axis at -2:
(E, ..., dim, n_q). Basis contractions use dense tabulated (n_q, n_loc)
matrices — for the small n_loc of Q1..Q4 cells these are batched GEMMs that
map straight onto the MXU; sum-factorization buys nothing at these sizes
once the Jacobian application is q-point-wise anyway.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.basis import LagrangeBasis1D, gauss_quadrature


def tensor_reference_basis(basis: LagrangeBasis1D, q1: np.ndarray):
    """Dense 2D tensor-product tabulation at the tensor points of a 1D rule.

    Returns (V (n_q, n_loc), D (n_q, n_loc, 2)) with both the local lattice
    and the quadrature lattice ordered x-fastest (matching ops/tensor.py)."""
    V1, D1 = basis.tabulate(q1)
    # lattice (y, x): phi_{jy,jx}(qy,qx) = V1[qy,jy] V1[qx,jx]
    V = np.einsum("ai,bj->abij", V1, V1)  # (qy, qx, jy, jx)
    Dx = np.einsum("ai,bj->abij", V1, D1)
    Dy = np.einsum("ai,bj->abij", D1, V1)
    n_q = len(q1) ** 2
    n_loc = basis.n_dofs**2
    V = V.reshape(n_q, n_loc)
    D = np.stack([Dx.reshape(n_q, n_loc), Dy.reshape(n_q, n_loc)], axis=-1)
    return V, D


class MappedEvaluatorBase:
    """Shared contraction machinery of mapped evaluators; subclasses fill
    self.V, self.D and call _set_geometry()."""

    def _set_geometry(self, J, X, w, dtype) -> None:
        """J (E, n_q, dim, dim) Jacobians at quad points, X (E, n_q, dim)
        physical coords, w (n_q,) reference weights."""
        detJ = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
        if not (detJ > 0).all():
            bad = int((detJ <= 0).any(axis=1).sum())
            raise ValueError(
                f"{bad} cells have non-positive Jacobian determinant "
                "(inverted or degenerate mapping)"
            )
        Jinv = np.empty_like(J)
        Jinv[..., 0, 0] = J[..., 1, 1]
        Jinv[..., 0, 1] = -J[..., 0, 1]
        Jinv[..., 1, 0] = -J[..., 1, 0]
        Jinv[..., 1, 1] = J[..., 0, 0]
        Jinv /= detJ[..., None, None]
        # stored as Jinv[e, q, b, a] = (J^{-1})_{ba} = d xi_b / d x_a
        self.Jinv = jnp.asarray(Jinv, dtype)
        self.jxw_cells = jnp.asarray(w[None, :] * detJ, dtype)  # (E, n_q)
        self._qcoords = X
        self.w = w

    # grad_phys[a] = sum_b dref[b] * Jinv[b, a]
    def _to_phys(self, gref):
        """(E, ..., dim_ref, n_q) -> (E, ..., dim_phys, n_q)"""
        return jnp.einsum("eqba,e...bq->e...aq", self.Jinv, gref)

    def _to_ref(self, gphys):
        """transpose of _to_phys (same Jinv, contracted over phys axis)."""
        return jnp.einsum("eqba,e...aq->e...bq", self.Jinv, gphys)

    # -- evaluation ---------------------------------------------------------
    def values(self, u):
        """(E, ..., n_local) -> (E, ..., n_q)"""
        return jnp.einsum("qi,e...i->e...q", self.V, u)

    def gradients(self, u):
        """(E, ..., n_local) -> (E, ..., dim, n_q)"""
        gref = jnp.einsum("qib,e...i->e...bq", self.D, u)
        return self._to_phys(gref)

    # -- integration (transpose ops, both include jxw) -----------------------
    def _jxw_b(self, arr):
        s = self.jxw_cells.reshape(
            (self.jxw_cells.shape[0],) + (1,) * (arr.ndim - 2) + (self.n_q,)
        )
        return arr * s

    def integrate_values(self, f):
        """(E, ..., n_q) -> (E, ..., n_local)"""
        return jnp.einsum("qi,e...q->e...i", self.V, self._jxw_b(f))

    def integrate_gradients(self, g):
        """(E, ..., dim, n_q) -> (E, ..., n_local)"""
        gref = self._to_ref(self._jxw_b(g))
        return jnp.einsum("qib,e...bq->e...i", self.D, gref)

    # -- coordinates ---------------------------------------------------------
    def quad_coords(self, space=None) -> np.ndarray:
        """(E, n_q, dim) physical quadrature coordinates."""
        return self._qcoords


class MappedEvaluator(MappedEvaluatorBase):
    """Tensor-product (Q_k) evaluation on mapped quadrilateral cells.

    Geometry (inverse Jacobians, JxW, physical quad coords) comes from a
    CellMapping (fe/mapped_space.py) shared by all spaces on the mesh, so
    velocity and pressure integrate against the same geometry like deal.II's
    single Mapping object."""

    def __init__(self, dim, basis, quad_points_1d, mapping, dtype=None) -> None:
        import jax as _jax

        if dtype is None:
            dtype = jnp.float64 if _jax.config.jax_enable_x64 else jnp.float32
        assert dim == 2, "mapped evaluation currently supports dim=2"
        self.dim = dim
        self.dtype = dtype
        if isinstance(quad_points_1d, (int, np.integer)):
            q1, w1 = gauss_quadrature(int(quad_points_1d))
        else:
            q1, w1 = quad_points_1d
        self.n_q_1d = len(q1)
        self.n_q = self.n_q_1d**dim
        self.n_1d = basis.n_dofs
        self.n_local = self.n_1d**dim
        self.q_points_1d = q1
        V, D = tensor_reference_basis(basis, q1)
        self.V = jnp.asarray(V, dtype)
        self.D = jnp.asarray(D, dtype)  # (n_q, n_loc, dim) reference gradients
        # tensor quad weights, x fastest
        w = np.einsum("a,b->ab", w1, w1).reshape(-1)
        qx, qy = np.meshgrid(q1, q1, indexing="xy")
        ref_pts = np.stack([qx.reshape(-1), qy.reshape(-1)], axis=1)  # (n_q, 2)
        J, X = mapping.jacobians(ref_pts)  # (E, n_q, 2, 2), (E, n_q, 2)
        self._set_geometry(J, X, w, dtype)


class SimplexEvaluator(MappedEvaluatorBase):
    """P_k evaluation on affine triangles (FE_SimplexP + QGaussSimplex of
    the reference's simplex-mesh configurations, parameters.cc 'simplex
    mesh'). The per-cell Jacobian is constant (affine mapping), broadcast to
    the quadrature points of the chosen simplex rule."""

    def __init__(self, space, n_points_1d: int, dtype=None) -> None:
        import jax as _jax

        from adaflo_tpu.fe.simplex import simplex_quadrature

        if dtype is None:
            dtype = jnp.float64 if _jax.config.jax_enable_x64 else jnp.float32
        self.dim = 2
        self.dtype = dtype
        pts, w = simplex_quadrature(n_points_1d)
        self.n_q = len(w)
        self.n_local = space.n_local
        V, D = space.element.tabulate(pts)
        self.V = jnp.asarray(V, dtype)
        self.D = jnp.asarray(D, dtype)
        mesh = space.mesh
        v = mesh.vertices[mesh.cells]  # (E, 3, 2)
        Jc = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]], axis=-1)  # (E,2,2)
        J = np.broadcast_to(Jc[:, None, :, :], (len(v), self.n_q, 2, 2)).copy()
        X = v[:, None, 0, :] + np.einsum("qb,eab->eqa", pts, Jc)
        self._set_geometry(J, X, w, dtype)


class Extruded3DEvaluator:
    """Tensor-product evaluation on extruded prismatic-hex cells.

    The 3D Jacobian of an extruded cell is block-diagonal
    (J3 = diag(J2(x, y), h_z)), so instead of materializing per-3D-cell
    geometry this evaluator keeps the 2D base geometry (Jinv2, detJ2 from
    the shared CellMapping) and broadcasts it over the z-slices inside the
    contractions — the per-cell data streamed from HBM stays O(E_2d), not
    O(E_2d * n_slices). Quadrature = (1D rule)^2 in-plane x same rule in z,
    flat q index z-outer / in-plane-inner; local dofs lz-outer / l2-inner
    (matching fe/extruded_space.py cell_dofs).

    Reference parity: FEEvaluation<3> on the extruded triangulation of
    micro_particle.cc:326.
    """

    def __init__(self, space, quad_points_1d, dtype=None) -> None:
        import jax as _jax

        if dtype is None:
            dtype = jnp.float64 if _jax.config.jax_enable_x64 else jnp.float32
        self.dim = 3
        self.dtype = dtype
        basis = space.basis
        mesh = space.mesh
        mapping = space.mapping
        if isinstance(quad_points_1d, (int, np.integer)):
            q1, w1 = gauss_quadrature(int(quad_points_1d))
        else:
            q1, w1 = quad_points_1d
        nq1 = len(q1)
        self.n_q_1d = nq1
        self.nq2 = nq1 * nq1
        self.nqz = nq1
        self.n_q = nq1 ** 3
        n1 = basis.n_dofs
        self.n1 = n1
        self.nloc2 = n1 * n1
        self.n_local = n1 ** 3
        self.Nz = mesh.n_slices
        self.E2 = mesh.base.n_cells
        self.h_z = mesh.h_z
        self.z0 = mesh.z0

        # tables: 2D tensor + 1D z
        V2, D2 = tensor_reference_basis(basis, q1)  # (nq2, nloc2[, 2])
        Vz, Dz = basis.tabulate(q1)  # (nqz, n1)
        self.V2 = jnp.asarray(V2, dtype)
        self.D2 = jnp.asarray(D2, dtype)
        self.Vz = jnp.asarray(Vz, dtype)
        self.Dz = jnp.asarray(Dz, dtype)
        # fused 3D tables for value/ref-gradient contraction (tiny)
        V3 = np.einsum("zk,qi->zqki", Vz, V2).reshape(self.n_q, self.n_local)
        D3 = np.empty((self.n_q, self.n_local, 3))
        for a in range(2):
            D3[:, :, a] = np.einsum("zk,qi->zqki", Vz, D2[:, :, a]).reshape(
                self.n_q, self.n_local
            )
        D3[:, :, 2] = np.einsum("zk,qi->zqki", Dz, V2).reshape(
            self.n_q, self.n_local
        )
        self.V = jnp.asarray(V3, dtype)
        self.D = jnp.asarray(D3, dtype)

        # 2D base geometry at the in-plane quadrature
        qx, qy = np.meshgrid(q1, q1, indexing="xy")
        ref2 = np.stack([qx.reshape(-1), qy.reshape(-1)], axis=1)
        J2, X2 = mapping.jacobians(ref2)  # (E2, nq2, 2, 2), (E2, nq2, 2)
        det2 = J2[..., 0, 0] * J2[..., 1, 1] - J2[..., 0, 1] * J2[..., 1, 0]
        if not (det2 > 0).all():
            raise ValueError("extruded base has non-positive Jacobians")
        Jinv2 = np.empty_like(J2)
        Jinv2[..., 0, 0] = J2[..., 1, 1]
        Jinv2[..., 0, 1] = -J2[..., 0, 1]
        Jinv2[..., 1, 0] = -J2[..., 1, 0]
        Jinv2[..., 1, 1] = J2[..., 0, 0]
        Jinv2 /= det2[..., None, None]
        self.Jinv2 = jnp.asarray(Jinv2, dtype)  # [e2, q2, b, a]
        w2 = np.einsum("a,b->ab", w1, w1).reshape(-1)
        # jxw for one slice, (E2, n_q): z-outer x in-plane-inner
        jxw_slice = np.einsum(
            "z,eq->ezq", w1 * self.h_z, w2[None, :] * det2
        ).reshape(self.E2, self.n_q)
        self._jxw_slice = jnp.asarray(jxw_slice, dtype)
        self._X2 = X2
        self._q1 = q1
        self._qcoords = None

    # -- API parity with MappedEvaluatorBase --------------------------------
    @property
    def jxw_cells(self):
        """(E3, n_q) — materialized tile (API compatibility)."""
        return jnp.tile(self._jxw_slice, (self.Nz, 1))

    def quad_coords(self, space=None) -> np.ndarray:
        if self._qcoords is None:
            E3 = self.Nz * self.E2
            qc = np.empty((E3, self.n_q, 3))
            xy = np.tile(self._X2, (1, self.nqz, 1))  # (E2, n_q, 2)
            for kz in range(self.Nz):
                blk = qc[kz * self.E2 : (kz + 1) * self.E2]
                blk[:, :, :2] = xy
                zq = self.z0 + self.h_z * (kz + self._q1)
                blk[:, :, 2] = np.repeat(zq, self.nq2)[None, :]
            self._qcoords = qc
        return self._qcoords

    def _split(self, arr):
        """(E3, ..., X) -> (Nz, E2, ..., X)"""
        return arr.reshape((self.Nz, self.E2) + arr.shape[1:])

    def _flat(self, arr):
        return arr.reshape((self.Nz * self.E2,) + arr.shape[2:])

    # -- evaluation -----------------------------------------------------------
    def values(self, u):
        """(E3, ..., n_local) -> (E3, ..., n_q)"""
        return jnp.einsum("qi,e...i->e...q", self.V, u)

    def gradients(self, u):
        """(E3, ..., n_local) -> (E3, ..., 3, n_q) physical gradients."""
        gref = jnp.einsum("qib,e...i->e...bq", self.D, u)  # b = ref axes
        g = self._split(gref)  # (Nz, E2, ..., 3, n_q)
        gxy = self._inplane(g[..., :2, :], to_phys=True)
        gz = g[..., 2:, :] / self.h_z
        out = jnp.concatenate([gxy, gz], axis=-2)
        return self._flat(out)

    def _inplane(self, gxy, to_phys: bool):
        """(Nz, E2, ..., 2, n_q) -> same shape: contract the in-plane pair
        with Jinv2 (E2, nq2, b, a) broadcast over z. to_phys applies
        grad_phys[a] = sum_b gref[b] Jinv2[b, a]; otherwise the transpose
        (phys -> ref, contracting the physical axis)."""
        sh = gxy.shape
        gxy = gxy.reshape(sh[:-1] + (self.nqz, self.nq2))
        if to_phys:
            out = jnp.einsum("eqba,ze...bwq->ze...awq", self.Jinv2, gxy)
        else:
            out = jnp.einsum("eqba,ze...awq->ze...bwq", self.Jinv2, gxy)
        return out.reshape(sh)

    # -- integration ----------------------------------------------------------
    def _jxw_b(self, arr):
        """multiply (Nz, E2, ..., n_q) by jxw_slice (E2, n_q)"""
        s = self._jxw_slice.reshape(
            (1, self.E2) + (1,) * (arr.ndim - 3) + (self.n_q,)
        )
        return arr * s

    def integrate_values(self, f):
        """(E3, ..., n_q) -> (E3, ..., n_local)"""
        fw = self._flat(self._jxw_b(self._split(f)))
        return jnp.einsum("qi,e...q->e...i", self.V, fw)

    def integrate_gradients(self, g):
        """(E3, ..., 3, n_q) -> (E3, ..., n_local)"""
        gs = self._jxw_b_grad(self._split(g))  # (Nz, E2, ..., 3, n_q)
        gxy = self._inplane(gs[..., :2, :], to_phys=False)
        gz = gs[..., 2:, :] / self.h_z
        gref = self._flat(jnp.concatenate([gxy, gz], axis=-2))
        return jnp.einsum("qib,e...bq->e...i", self.D, gref)

    def _jxw_b_grad(self, arr):
        """multiply (Nz, E2, ..., 3, n_q) by jxw_slice (E2, n_q)"""
        s = self._jxw_slice.reshape(
            (1, self.E2) + (1,) * (arr.ndim - 3) + (self.n_q,)
        )
        return arr * s
