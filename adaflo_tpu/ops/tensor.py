"""Sum-factorized cell evaluation/integration as batched tensor contractions.

This is the TPU-native equivalent of deal.II's FEEvaluation
evaluate()/integrate() (the engine under every hot kernel of the reference,
e.g. /root/reference/source/navier_stokes_matrix.cc:601-916): a local dof
vector on a Q_k tensor-product cell is contracted axis-by-axis with small
tabulated 1D (n_q x n_1d) matrices. Cells (and components) are leading batch
axes, which XLA maps to batched GEMMs on the MXU / VPU lanes — cells play the
role the reference gives to VectorizedArray SIMD lanes.

Geometry is Cartesian (diagonal Jacobian): physical gradients are reference
gradients scaled by 1/h per axis; the quadrature factor is w_q * prod(h).
Per-cell h (mixed-level AMR meshes) broadcasts through the same code path.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.basis import LagrangeBasis1D, gauss_quadrature


class CellEvaluator:
    """Tabulated evaluation of one scalar basis at one quadrature rule.

    Arrays:
      V: (n_q_1d, n_1d) values, D: (n_q_1d, n_1d) derivatives on [0,1]
      w: (n_q_1d,) quadrature weights on [0,1]
    Contractions operate on arrays shaped (..., n_1d**dim) and return
    (..., n_q_1d**dim); gradients carry an extra axis of length dim placed
    right before the quad axis.
    """

    def __init__(
        self,
        dim: int,
        basis: LagrangeBasis1D,
        quad_points_1d: int | np.ndarray,
        h: Sequence[float],
        dtype=None,
    ) -> None:
        import jax as _jax

        if dtype is None:
            dtype = jnp.float64 if _jax.config.jax_enable_x64 else jnp.float32
        self.dim = dim
        self.n_1d = basis.n_dofs
        if isinstance(quad_points_1d, (int, np.integer)):
            q, w = gauss_quadrature(int(quad_points_1d))
        elif isinstance(quad_points_1d, tuple):
            q, w = quad_points_1d  # explicit (points, weights) on [0, 1]
        else:
            raise TypeError(quad_points_1d)
        V, D = basis.tabulate(q)
        self.n_q_1d = len(q)
        self.n_q = self.n_q_1d**dim
        self.n_local = self.n_1d**dim
        self.q_points_1d = q
        self.V = jnp.asarray(V, dtype)
        self.D = jnp.asarray(D, dtype)
        self.w1 = np.asarray(w)
        self.dtype = dtype
        self.set_geometry(h)

    def set_geometry(self, h: Sequence[float]) -> None:
        """Cartesian cell extents per axis (scalars: uniform mesh)."""
        h = np.asarray(h, dtype=np.float64)
        self.h = h
        self.inv_h = jnp.asarray(1.0 / h, self.dtype)
        # jxw over the tensor quadrature (x fastest), shape (n_q,)
        w = self.w1
        if self.dim == 1:
            jw = w * h[0]
        elif self.dim == 2:
            jw = np.einsum("a,b->ab", w * h[1], w * h[0]).reshape(-1)
        else:
            jw = np.einsum("a,b,c->abc", w * h[2], w * h[1], w * h[0]).reshape(-1)
        self.jxw = jnp.asarray(jw, self.dtype)

    # -- helpers -----------------------------------------------------------
    def _to_lattice(self, u):
        return u.reshape(u.shape[:-1] + (self.n_1d,) * self.dim)

    def _to_qlattice(self, f):
        return f.reshape(f.shape[:-1] + (self.n_q_1d,) * self.dim)

    # -- evaluation --------------------------------------------------------
    def values(self, u):
        """(..., n_local) -> (..., n_q)"""
        ul = self._to_lattice(u)
        V = self.V
        if self.dim == 1:
            out = jnp.einsum("ai,...i->...a", V, ul)
        elif self.dim == 2:
            out = jnp.einsum("ai,bj,...ij->...ab", V, V, ul)
        else:
            out = jnp.einsum("ai,bj,ck,...ijk->...abc", V, V, V, ul)
        return out.reshape(u.shape[:-1] + (self.n_q,))

    def gradients(self, u):
        """(..., n_local) -> (..., dim, n_q); axis -2 indexes d/dx_0..d/dx_{dim-1}."""
        ul = self._to_lattice(u)
        V, D = self.V, self.D
        outs = []
        if self.dim == 1:
            outs.append(jnp.einsum("ai,...i->...a", D, ul) * self.inv_h[0])
        elif self.dim == 2:
            # lattice axes are (y, x)
            outs.append(jnp.einsum("ai,bj,...ij->...ab", V, D, ul) * self.inv_h[0])
            outs.append(jnp.einsum("ai,bj,...ij->...ab", D, V, ul) * self.inv_h[1])
        else:
            outs.append(
                jnp.einsum("ai,bj,ck,...ijk->...abc", V, V, D, ul) * self.inv_h[0]
            )
            outs.append(
                jnp.einsum("ai,bj,ck,...ijk->...abc", V, D, V, ul) * self.inv_h[1]
            )
            outs.append(
                jnp.einsum("ai,bj,ck,...ijk->...abc", D, V, V, ul) * self.inv_h[2]
            )
        out = jnp.stack(outs, axis=-1 - self.dim)  # before the q lattice axes
        return out.reshape(u.shape[:-1] + (self.dim, self.n_q))

    # -- integration (transpose ops, both include jxw) ----------------------
    def integrate_values(self, f):
        """sum_q f_q phi_i(q) jxw_q : (..., n_q) -> (..., n_local)"""
        fl = self._to_qlattice(f * self.jxw)
        V = self.V
        if self.dim == 1:
            out = jnp.einsum("ai,...a->...i", V, fl)
        elif self.dim == 2:
            out = jnp.einsum("ai,bj,...ab->...ij", V, V, fl)
        else:
            out = jnp.einsum("ai,bj,ck,...abc->...ijk", V, V, V, fl)
        return out.reshape(f.shape[:-1] + (self.n_local,))

    def integrate_gradients(self, g):
        """sum_q g_q . grad(phi_i)(q) jxw_q : (..., dim, n_q) -> (..., n_local)"""
        V, D = self.V, self.D
        gl = self._to_qlattice(g * self.jxw)
        if self.dim == 1:
            out = jnp.einsum("ai,...a->...i", D, gl[..., 0, :] * self.inv_h[0])
        elif self.dim == 2:
            gx = gl[..., 0, :, :] * self.inv_h[0]
            gy = gl[..., 1, :, :] * self.inv_h[1]
            out = jnp.einsum("ai,bj,...ab->...ij", V, D, gx) + jnp.einsum(
                "ai,bj,...ab->...ij", D, V, gy
            )
        else:
            gx = gl[..., 0, :, :, :] * self.inv_h[0]
            gy = gl[..., 1, :, :, :] * self.inv_h[1]
            gz = gl[..., 2, :, :, :] * self.inv_h[2]
            out = (
                jnp.einsum("ai,bj,ck,...abc->...ijk", V, V, D, gx)
                + jnp.einsum("ai,bj,ck,...abc->...ijk", V, D, V, gy)
                + jnp.einsum("ai,bj,ck,...abc->...ijk", D, V, V, gz)
            )
        return out.reshape(g.shape[:-2] + (self.n_local,))

    # -- quadrature point coordinates (host, for forcing terms) -------------
    def quad_coords(self, mesh) -> np.ndarray:
        return self._quad_coords_impl(mesh)

    def _quad_coords_impl(self, mesh) -> np.ndarray:
        """(n_cells, n_q, dim) physical quadrature point coordinates."""
        q = self.q_points_1d
        axes = []
        for a in range(self.dim):
            cells = np.arange(mesh.n_cells_axis[a])[:, None]
            x = mesh.origin[a] + mesh.h[a] * (cells + q[None, :])
            axes.append(x)  # (n_cells_a, n_q_1d)
        if self.dim == 1:
            return axes[0][:, :, None]
        if self.dim == 2:
            xc, yc = axes
            ncx, ncy = mesh.n_cells_axis
            X = np.broadcast_to(
                xc[None, :, None, :], (ncy, ncx, self.n_q_1d, self.n_q_1d)
            )
            Y = np.broadcast_to(
                yc[:, None, :, None], (ncy, ncx, self.n_q_1d, self.n_q_1d)
            )
            out = np.stack(
                [X.reshape(-1, self.n_q), Y.reshape(-1, self.n_q)], axis=-1
            )
            return out
        xc, yc, zc = axes
        ncx, ncy, ncz = mesh.n_cells_axis
        shape = (ncz, ncy, ncx, self.n_q_1d, self.n_q_1d, self.n_q_1d)
        X = np.broadcast_to(xc[None, None, :, None, None, :], shape)
        Y = np.broadcast_to(yc[None, :, None, None, :, None], shape)
        Z = np.broadcast_to(zc[:, None, None, :, None, None], shape)
        return np.stack(
            [
                X.reshape(-1, self.n_q),
                Y.reshape(-1, self.n_q),
                Z.reshape(-1, self.n_q),
            ],
            axis=-1,
        )

class VariableCellEvaluator(CellEvaluator):
    """CellEvaluator with per-cell Cartesian extents (mixed-level AMR).

    Input/output arrays must carry cells as the LEADING axis, shaped
    (E, ..., n_local) / (E, ..., n_q); the per-cell 1/h and JxW factors
    broadcast from axis 0. This is the general-mesh counterpart of deal.II's
    per-cell Jacobian storage in MatrixFree (the reference relies on it for
    every adaptive run, e.g. /root/reference/source/navier_stokes.cc AMR
    paths); geometry stays diagonal because forest cells are axis-aligned
    boxes."""

    def __init__(self, dim, basis, quad_points_1d, h_cells, dtype=None):
        h_cells = np.asarray(h_cells, dtype=np.float64)
        assert h_cells.ndim == 2 and h_cells.shape[1] == dim
        super().__init__(dim, basis, quad_points_1d, h_cells[0], dtype=dtype)
        self.set_cell_geometry(h_cells)

    def set_cell_geometry(self, h_cells) -> None:
        h = np.asarray(h_cells, dtype=np.float64)
        self.h_cells = h
        self.inv_h_cells = jnp.asarray(1.0 / h, self.dtype)  # (E, dim)
        w = self.w1
        if self.dim == 1:
            jw = w[None, :] * h[:, :1]
        elif self.dim == 2:
            jw = np.einsum("a,b->ab", w, w).reshape(1, -1) * (
                h[:, 0] * h[:, 1]
            ).reshape(-1, 1)
        else:
            jw = np.einsum("a,b,c->abc", w, w, w).reshape(1, -1) * (
                h[:, 0] * h[:, 1] * h[:, 2]
            ).reshape(-1, 1)
        self.jxw_cells = jnp.asarray(jw, self.dtype)  # (E, n_q)

    def _scale(self, arr, axis: int):
        """Multiply (E, ..., n_q*) by 1/h_cells[:, axis], broadcast over the
        middle axes."""
        s = self.inv_h_cells[:, axis].reshape((-1,) + (1,) * (arr.ndim - 1))
        return arr * s

    def _jxw_b(self, arr):
        s = self.jxw_cells.reshape(
            (self.jxw_cells.shape[0],) + (1,) * (arr.ndim - 2) + (self.n_q,)
        )
        return arr * s

    def gradients(self, u):
        ul = self._to_lattice(u)
        V, D = self.V, self.D
        outs = []
        if self.dim == 1:
            outs.append(self._scale(jnp.einsum("ai,...i->...a", D, ul), 0))
        elif self.dim == 2:
            outs.append(self._scale(jnp.einsum("ai,bj,...ij->...ab", V, D, ul), 0))
            outs.append(self._scale(jnp.einsum("ai,bj,...ij->...ab", D, V, ul), 1))
        else:
            outs.append(
                self._scale(jnp.einsum("ai,bj,ck,...ijk->...abc", V, V, D, ul), 0)
            )
            outs.append(
                self._scale(jnp.einsum("ai,bj,ck,...ijk->...abc", V, D, V, ul), 1)
            )
            outs.append(
                self._scale(jnp.einsum("ai,bj,ck,...ijk->...abc", D, V, V, ul), 2)
            )
        out = jnp.stack(outs, axis=-1 - self.dim)
        return out.reshape(u.shape[:-1] + (self.dim, self.n_q))

    def integrate_values(self, f):
        fl = self._to_qlattice(self._jxw_b(f))
        V = self.V
        if self.dim == 1:
            out = jnp.einsum("ai,...a->...i", V, fl)
        elif self.dim == 2:
            out = jnp.einsum("ai,bj,...ab->...ij", V, V, fl)
        else:
            out = jnp.einsum("ai,bj,ck,...abc->...ijk", V, V, V, fl)
        return out.reshape(f.shape[:-1] + (self.n_local,))

    def integrate_gradients(self, g):
        V, D = self.V, self.D
        gj = self._jxw_b(g)
        if self.dim == 1:
            gl = self._to_qlattice(self._scale(gj[..., 0, :], 0))
            out = jnp.einsum("ai,...a->...i", D, gl)
        elif self.dim == 2:
            gx = self._to_qlattice(self._scale(gj[..., 0, :], 0))
            gy = self._to_qlattice(self._scale(gj[..., 1, :], 1))
            out = jnp.einsum("ai,bj,...ab->...ij", V, D, gx) + jnp.einsum(
                "ai,bj,...ab->...ij", D, V, gy
            )
        else:
            gx = self._to_qlattice(self._scale(gj[..., 0, :], 0))
            gy = self._to_qlattice(self._scale(gj[..., 1, :], 1))
            gz = self._to_qlattice(self._scale(gj[..., 2, :], 2))
            out = (
                jnp.einsum("ai,bj,ck,...abc->...ijk", V, V, D, gx)
                + jnp.einsum("ai,bj,ck,...abc->...ijk", V, D, V, gy)
                + jnp.einsum("ai,bj,ck,...abc->...ijk", D, V, V, gz)
            )
        return out.reshape(g.shape[:-2] + (self.n_local,))

    def quad_coords(self, space) -> np.ndarray:
        """(E, n_q, dim) physical quad points from a ForestSpace-like object
        exposing cell_origin (E, dim) and h_cells (E, dim)."""
        q = self.q_points_1d
        if self.dim == 1:
            ref = q[:, None]
        elif self.dim == 2:
            ref = np.stack(
                np.meshgrid(q, q, indexing="ij")[::-1], axis=-1
            ).reshape(-1, 2)
        else:
            ref = np.stack(
                np.meshgrid(q, q, q, indexing="ij")[::-1], axis=-1
            ).reshape(-1, 3)
        return (
            space.cell_origin[:, None, :] + ref[None, :, :] * self.h_cells[:, None, :]
        )
