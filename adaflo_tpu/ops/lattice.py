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

import itertools
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

    def _split_axis_last(self, arr, nc: int):
        """(..., n_nodes_ext) -> (..., nc, deg+1) via overlap windows, using
        only static slices, reshapes and one stack (no gather)."""
        deg = self.deg
        # nodes 0..deg*nc; window i covers [i*deg, i*deg+deg]
        body = arr[..., : deg * nc].reshape(arr.shape[:-1] + (nc, deg))
        # the (deg+1)-th local dof of each window = first dof of the next
        last = arr[..., deg::deg]  # (..., nc): nodes deg, 2deg, ..., deg*nc
        return jnp.concatenate([body, last[..., :, None]], axis=-1)

    def _combine_axis_last(self, arr, nc: int):
        """Transpose of _split_axis_last: (..., nc, deg+1) ->
        (..., n_nodes = deg*nc+1) with overlap accumulation — pure
        slice/shift/reshape, no scatter."""
        deg = self.deg
        bnd0 = arr[..., :, 0]  # (..., nc) contributions to nodes deg*c
        bndD = arr[..., :, deg]  # contributions to nodes deg*(c+1)
        zeros = jnp.zeros_like(bndD[..., :1])
        first_col = bnd0 + jnp.concatenate([zeros, bndD[..., :-1]], axis=-1)
        if deg > 1:
            interior = arr[..., :, 1:deg]  # (..., nc, deg-1)
            blocks = jnp.concatenate([first_col[..., :, None], interior], axis=-1)
        else:
            blocks = first_col[..., :, None]
        flat = blocks.reshape(arr.shape[:-2] + (nc * deg,))
        return jnp.concatenate([flat, bndD[..., -1:]], axis=-1)

    def _gather_core(self, u_flat):
        """Window-split lattice with axes (cells..., loc_x, loc_y, loc_x):
        the shared producer of gather()/gather_t()."""
        arr = self._to_ext_lattice(u_flat)
        d = self.dim
        # split each axis (working axis brought last), back-to-front
        for a in range(d):  # physical axis a = array axis d-1-a
            ax = d - 1 - a
            arr = jnp.moveaxis(arr, ax, -1)
            arr = self._split_axis_last(arr, self.n_cells_axis[a])
            # (..., nc_a, loc_a): move both back: cells to ax, keep loc at end
            arr = jnp.moveaxis(arr, -2, ax)
        return arr

    def gather(self, u_flat):
        """(n,) -> (E, n_loc) via pure reshapes/slices."""
        arr = self._gather_core(u_flat)
        d = self.dim
        # axes: (c_z, c_y, c_x, loc_x?, ...) — locals appended in order
        # a=0 (x) first, so trailing local axes are (loc_x, loc_y, loc_z);
        # we need (loc_z, loc_y, loc_x) to match lexicographic x-fastest
        loc_perm = list(range(d)) + [2 * d - 1 - i for i in range(d)]
        arr = jnp.transpose(arr, loc_perm)
        return arr.reshape(self.n_cells, self.n_loc)

    def gather_t(self, u_flat):
        """(n,) -> (n_loc, E): transposed-layout gather for the Pallas
        mat-vec (cells ride the lane axis). The transpose happens inside the
        one fused output permutation — no materialized (E, n_loc) pass."""
        arr = self._gather_core(u_flat)
        d = self.dim
        loc_perm = [2 * d - 1 - i for i in range(d)] + list(range(d))
        arr = jnp.transpose(arr, loc_perm)
        return arr.reshape(self.n_loc, self.n_cells)

    def scatter_add(self, r_cells):
        """(E, n_loc) -> (n_padded,): transpose of gather."""
        d = self.dim
        cells_shape = tuple(reversed(self.n_cells_axis))
        arr = r_cells.reshape(cells_shape + (self.deg + 1,) * d)
        # local axes currently (loc_z, loc_y, loc_x); reorder to the gather's
        # internal order (loc_x, loc_y, loc_z)
        loc_perm = list(range(d)) + [2 * d - 1 - i for i in range(d)]
        return self._scatter_core(jnp.transpose(arr, loc_perm))

    def scatter_add_t(self, r_t):
        """(n_loc, E) -> (n_padded,): transpose of gather_t."""
        d = self.dim
        cells_shape = tuple(reversed(self.n_cells_axis))
        arr = r_t.reshape((self.deg + 1,) * d + cells_shape)
        # axes (loc_z, loc_y, loc_x, c_z, c_y, c_x) -> internal
        # (cells..., loc_x, loc_y, loc_z)
        perm = list(range(d, 2 * d)) + [d - 1 - i for i in range(d)]
        return self._scatter_core(jnp.transpose(arr, perm))

    def _scatter_core(self, arr):
        """Shared combiner: arr axes (cells..., loc_x, loc_y, loc_z)."""
        d = self.dim
        # combine axes front-to... reverse of gather: physical axis d-1..0
        for a in reversed(range(d)):
            ax = d - 1 - a
            # the local axis for physical axis a is currently the LAST axis
            arr = jnp.moveaxis(arr, ax, -2)
            arr = self._combine_axis_last(arr, self.n_cells_axis[a])
            arr = jnp.moveaxis(arr, -1, ax)
        R = arr
        # fold wrap padding back
        for ax in range(d):
            axis_phys = d - 1 - ax
            if self.periodic[axis_phys]:
                R = jnp.moveaxis(R, ax, -1)
                first = R[..., :1] + R[..., -1:]
                R = jnp.concatenate([first, R[..., 1:-1]], axis=-1)
                R = jnp.moveaxis(R, -1, ax)
        out = R.reshape(-1)
        if self.n_dofs_padded > self.n_dofs:
            out = jnp.concatenate(
                [out, jnp.zeros(self.n_dofs_padded - self.n_dofs, out.dtype)]
            )
        return out

    # ------------------------------------------------------------------
    # Parity-packed ("pe") layout: every cell-local dof row is ONE
    # contiguous shifted slice of a parity sub-lattice, with cells
    # enumerated on the extended anchor raster prod(nc_a + 1). No window
    # splits, no transposes — all HBM motion is contiguous copies/adds.
    # Rows at phantom anchors (any c_a == nc_a) carry wrapped garbage and
    # are masked out in the scatter. Non-periodic axes only.
    # ------------------------------------------------------------------
    @property
    def anchor_shape(self):
        """(z, y, x)-ordered anchor raster: nc_a + 1 per axis."""
        return tuple(nc + 1 for nc in reversed(self.n_cells_axis))

    @property
    def n_anchors(self) -> int:
        return int(np.prod(self.anchor_shape))

    def _parity_rows(self):
        """Static (sub-lattice index, flat anchor offset) per local dof, in
        the lexicographic x-fastest local order of cell_dofs."""
        d, deg = self.dim, self.deg
        ash = self.anchor_shape
        strides = tuple(int(np.prod(ash[a + 1 :])) for a in range(d))
        rows = []
        for loc in itertools.product(range(deg + 1), repeat=d):  # (z, y, x)
            sub = 0
            off = 0
            for a in range(d):
                sub = sub * deg + loc[a] % deg
                off += (loc[a] // deg) * strides[a]
            rows.append((sub, off))
        return rows

    def _parity_subs(self, u_flat):
        """(n,) -> (deg^dim, EA) parity sub-lattices, each zero-padded to
        the anchor raster.

        Implemented as pad + reshape + ONE transpose (parity axes to the
        front): stride-deg lane/sublane slicing lowers to a serialized
        gather on TPU (measured 0.7 GB/s at 97^3), while the equivalent
        transpose runs on the relayout path at ~46 GB/s — 62x faster."""
        assert not any(self.periodic), "parity layout: non-periodic only"
        U = u_flat[: self.n_dofs].reshape(self.lat_shape)
        deg = self.deg
        d = self.dim
        ash = self.anchor_shape
        # pad each axis from deg*nc+1 to deg*(nc+1), split into (anchor,
        # parity) index pairs: node = j*deg + r
        U = jnp.pad(U, tuple((0, deg * ash[a] - U.shape[a]) for a in range(d)))
        V = U.reshape(
            tuple(x for a in range(d) for x in (ash[a], deg))
        )
        # (i0, r0, i1, r1, ...) -> (r0, r1, ..., i0, i1, ...): sub index is
        # lexicographic with the first (z) parity slowest, matching the
        # product(range(deg), repeat=dim) stacking order of _parity_rows
        perm = [2 * a + 1 for a in range(d)] + [2 * a for a in range(d)]
        V = jnp.transpose(V, perm)
        return V.reshape(deg**d, self.n_anchors)

    def anchor_mask(self, dtype=np.float32) -> np.ndarray:
        """(EA,) host mask: 1 on real cells, 0 on phantom anchors."""
        m = np.zeros(self.anchor_shape, dtype)
        m[tuple(slice(0, nc) for nc in reversed(self.n_cells_axis))] = 1
        return m.reshape(-1)

    def anchor_mask_dev(self, dtype=jnp.float32):
        """anchor_mask built from iotas INSIDE the trace — a host ndarray
        would be embedded as an O(EA) literal in the compiled program (102MB
        of MLIR at 84^3, which kills the compile helper)."""
        ash = self.anchor_shape
        m = None
        for a, s in enumerate(ash):
            shape = [1] * len(ash)
            shape[a] = s
            ax = (jnp.arange(s) < (s - 1)).astype(dtype).reshape(shape)
            m = ax if m is None else m * ax
        return jnp.broadcast_to(m, ash).reshape(-1)

    def cells_to_anchors(self, arr):
        """(..., E) cell-raster array -> (..., EA) anchor raster (zero pad);
        used to re-raster the per-Newton-step linearization stream."""
        cs = tuple(reversed(self.n_cells_axis))
        a = arr.reshape(arr.shape[:-1] + cs)
        pad = ((0, 0),) * (a.ndim - self.dim) + tuple(
            (0, 1) for _ in range(self.dim)
        )
        return jnp.pad(a, pad).reshape(arr.shape[:-1] + (self.n_anchors,))

    def gather_pe(self, u_flat):
        """(n,) -> (n_loc, EA): parity gather — n_loc contiguous shifted
        slices of the deg^dim parity sub-lattices."""
        subs = self._parity_subs(u_flat)
        rows = []
        for sub, off in self._parity_rows():
            s = subs[sub]
            if off:
                s = jnp.concatenate([s[off:], jnp.zeros((off,), s.dtype)])
            rows.append(s)
        return jnp.stack(rows)

    def scatter_add_pe(self, r_pe):
        """(n_loc, EA) -> (n_padded,): transpose of gather_pe — mask phantom
        anchors, overlap-add the shifted rows into the parity sub-lattices,
        re-interleave."""
        deg = self.deg
        r = r_pe * jnp.asarray(self.anchor_mask(), r_pe.dtype)
        acc = {}
        for i, (sub, off) in enumerate(self._parity_rows()):
            contrib = r[i]
            if off:
                contrib = jnp.concatenate(
                    [jnp.zeros((off,), r.dtype), contrib[:-off]]
                )
            acc[sub] = contrib if sub not in acc else acc[sub] + contrib
        d = self.dim
        n_sub = deg**d
        stacked = jnp.stack(
            [
                acc.get(k, jnp.zeros(self.n_anchors, r.dtype))
                for k in range(n_sub)
            ]
        )
        return self.subs_to_nodal(stacked)

    def subs_to_nodal(self, subs):
        """(deg^dim, EA) parity sub-lattices -> (n_padded,) nodal vector:
        the exact inverse permutation of _parity_subs (re-interleave by
        transpose — strided .at[::deg].set scatters serialize on TPU; the
        transpose does not). Phantom sub entries are cropped, so their
        content is irrelevant."""
        deg = self.deg
        d = self.dim
        ash = self.anchor_shape
        V = subs[: deg**d].reshape((deg,) * d + ash)
        # (r0, .., r_{d-1}, i0, .., i_{d-1}) -> (i0, r0, i1, r1, ...)
        perm = [x for a in range(d) for x in (d + a, a)]
        U = jnp.transpose(V, perm).reshape(tuple(deg * ash[a] for a in range(d)))
        # crop the anchor padding
        out = U[tuple(slice(0, s) for s in self.lat_shape)].reshape(-1)
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


class IndexMapOps:
    """General gather/scatter via explicit cell-dof index maps.

    Drop-in for LatticeOps on meshes where the strided-lattice fast path does
    not apply (adaptive forests with mixed levels). XLA lowers the gather to
    a dynamic-gather and the scatter to a sorted segment add; on TPU this is
    slower than the lattice slicing path, which is why uniform meshes keep
    LatticeOps — but it is fully general."""

    def __init__(self, cell_dofs, n_dofs_padded: int) -> None:
        self.cd = jnp.asarray(np.asarray(cell_dofs))
        self.n_cells, self.n_loc = self.cd.shape
        self.n_dofs_padded = int(n_dofs_padded)

    @classmethod
    def for_space(cls, space) -> "IndexMapOps":
        return cls(space.cell_dofs, space.n_dofs_padded)

    def gather(self, u):
        """(n_dofs_padded,) -> (E, n_loc)"""
        return u[self.cd]

    def gather_t(self, u):
        """(n_dofs_padded,) -> (n_loc, E)"""
        return u[self.cd.T]

    def scatter_add(self, r_cells):
        """(E, n_loc) -> (n_dofs_padded,)"""
        return (
            jnp.zeros(self.n_dofs_padded, r_cells.dtype)
            .at[self.cd.ravel()]
            .add(r_cells.ravel())
        )

    def scatter_add_t(self, r_t):
        """(n_loc, E) -> (n_dofs_padded,)"""
        return (
            jnp.zeros(self.n_dofs_padded, r_t.dtype).at[self.cd.T].add(r_t)
        )
