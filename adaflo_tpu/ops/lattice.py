"""Structured-lattice gather/scatter: the TPU fast path.

On a structured mesh the cell-local dof gather of a continuous Q_k space is
pure strided slicing of the dof lattice, and the transpose scatter-add is a
sum of (k+1)^dim strided window-adds — no irregular gather/scatter ops at
all, which matters enormously on TPU where arbitrary-index scatter
serializes. Cell and local orderings match ScalarSpace.cell_dofs exactly
(lexicographic, x fastest), so this is a drop-in replacement for the index
-map path (which remains the general fallback and the AMR path).

Periodic axes wrap by padding one node on the high side and folding its
contributions back.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


class LatticeOps:
    def __init__(
        self,
        n_nodes_axis: Sequence[int],
        n_cells_axis: Sequence[int],
        degree: int,
        periodic: Sequence[bool],
        n_dofs_padded: int,
    ) -> None:
        self.dim = len(n_nodes_axis)
        self.n_nodes_axis = tuple(n_nodes_axis)
        self.n_cells_axis = tuple(n_cells_axis)
        self.deg = degree
        self.periodic = tuple(periodic)
        self.n_dofs = int(np.prod(n_nodes_axis))
        self.n_dofs_padded = n_dofs_padded
        self.n_loc = (degree + 1) ** self.dim
        self.n_cells = int(np.prod(n_cells_axis))
        # lattice array shape in (z, y, x) order
        self.lat_shape = tuple(reversed(self.n_nodes_axis))
        # extended shape with wrap padding (+1 node on periodic axes)
        self.ext_shape = tuple(
            s + (1 if self.periodic[self.dim - 1 - a] else 0)
            for a, s in enumerate(self.lat_shape)
        )

    # ------------------------------------------------------------------
    def _to_ext_lattice(self, u_flat):
        """Flat dof vector -> extended (wrap-padded) lattice array."""
        U = u_flat[: self.n_dofs].reshape(self.lat_shape)
        for a in range(self.dim):
            axis_phys = self.dim - 1 - a
            if self.periodic[axis_phys]:
                first = jnp.take(U, jnp.array([0]), axis=a)
                U = jnp.concatenate([U, first], axis=a)
        return U

    def gather(self, u_flat):
        """(n,) -> (E, n_loc): strided window slices."""
        U = self._to_ext_lattice(u_flat)
        deg = self.deg

        # per-axis strided slicing: stack deg+1 shifted strided views,
        # splitting the axis into (cells_a, deg+1)
        def slice_axis(arr, axis, n_cells_a):
            views = []
            for i in range(deg + 1):
                idx = i + deg * np.arange(n_cells_a)
                views.append(jnp.take(arr, jnp.asarray(idx), axis=axis))
            return jnp.stack(views, axis=axis + 1)

        arr = U
        # process from the last axis backwards so inserted axes don't shift
        # earlier ones
        for a in reversed(range(self.dim)):
            axis_phys = self.dim - 1 - a
            arr = slice_axis(arr, a, self.n_cells_axis[axis_phys])
        # arr now has interleaved axes (c_z, i_z, c_y, i_y, c_x, i_x); we
        # processed back-to-front, so axis positions: after processing axis a,
        # that axis splits into (cells_a, local_a) at position a. Since we go
        # in reverse, earlier axes are unaffected. Final order:
        # (c_z, i_z, c_y, i_y, c_x, i_x) -> need (c_z, c_y, c_x, i_z, i_y, i_x)
        d = self.dim
        perm = [2 * a for a in range(d)] + [2 * a + 1 for a in range(d)]
        arr = jnp.transpose(arr, perm)
        return arr.reshape(self.n_cells, self.n_loc)

    def scatter_add(self, r_cells):
        """(E, n_loc) -> (n_padded,): sum of strided window adds."""
        deg = self.deg
        d = self.dim
        cells_shape = tuple(reversed(self.n_cells_axis))
        arr = r_cells.reshape(cells_shape + (deg + 1,) * d)
        R = jnp.zeros(self.ext_shape, r_cells.dtype)
        # loop over the (deg+1)^dim local offsets; each is one strided add
        for flat_loc in range(self.n_loc):
            loc = []
            rem = flat_loc
            for a in range(d):  # loc[a]: local index along physical axis a
                loc.append(rem % (deg + 1))
                rem //= deg + 1
            # local axes follow the d cell axes, ordered (i_z, i_y, i_x)
            piece = arr[
                (slice(None),) * d + tuple(int(loc[d - 1 - a]) for a in range(d))
            ]
            slices = []
            for a in range(d):
                l = int(loc[d - 1 - a])
                nc = self.n_cells_axis[d - 1 - a]
                slices.append(slice(l, l + deg * (nc - 1) + 1, deg))
            R = R.at[tuple(slices)].add(piece)
        # fold wrap padding back
        for a in range(d):
            axis_phys = d - 1 - a
            if self.periodic[axis_phys]:
                last = jnp.take(R, jnp.array([R.shape[a] - 1]), axis=a)
                R = jnp.take(R, jnp.arange(R.shape[a] - 1), axis=a)
                first = jnp.take(R, jnp.array([0]), axis=a) + last
                R = jnp.concatenate(
                    [first, jnp.take(R, jnp.arange(1, R.shape[a]), axis=a)], axis=a
                )
        out = R.reshape(-1)
        if self.n_dofs_padded > self.n_dofs:
            out = jnp.concatenate(
                [out, jnp.zeros(self.n_dofs_padded - self.n_dofs, out.dtype)]
            )
        return out

    @classmethod
    def for_space(cls, space) -> "LatticeOps":
        return cls(
            space.n_nodes_axis,
            space.mesh.n_cells_axis,
            space.degree,
            space.mesh.periodic,
            space.n_dofs_padded,
        )
