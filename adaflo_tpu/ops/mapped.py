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
