"""Explicit shard_map halo exchange for distributed cell loops.

TPU-native replacement for the reference's ghosted-vector machinery
(LinearAlgebra::distributed::Vector update_ghost_values()/compress() around
every cell_loop, e.g. navier_stokes.cc:1255-1317): instead of letting XLA's
GSPMD auto-partitioner choose the collectives, the communication pattern is
PRECOMPUTED on the host — which dofs each device owns, which remote dofs its
cells reference (the ghost layer), and which owned dofs each neighbor needs
(the send pack) — and executed as static `ppermute` ring shifts inside
`shard_map`:

  gather   = [pack -> ppermute(+s)/(-s) -> unpack into ghost slots]
             -> local index-map gather over (owned + ghost) values
  scatter  = local segment-add over (owned + ghost) slots
             -> [pack ghost sums -> reverse ppermute -> add into owners]
             (the compress() analog: every ghost contribution lands on its
             owning device exactly once)

Cells and dofs are partitioned into contiguous blocks (Morton/lexicographic
order is the partition order, like p4est), so ghosts live on ring neighbors
and each exchange is a fixed set of ring shifts with padded static buffer
sizes — no dynamic shapes, no data-dependent communication.

The class is API-compatible with ops/lattice.py IndexMapOps (gather /
scatter_add on globally-shaped arrays), so operators run unchanged; the
surrounding elementwise/contraction work stays under GSPMD, which partitions
it trivially along the cell axis, and Krylov dot products reduce with psum
in the same XLA program.

Cell counts that do not divide the device count are padded with ghost cells
whose dof rows point at dof 0; their kernel contributions must vanish
through zero geometry (zero-JxW rows), which the callers guarantee.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class HaloOps:
    """shard_map gather/scatter with explicit ghost exchange.

    cell_dofs: (E, n_loc) global dof indices per cell (any space).
    n_dofs_padded: global dof vector length; must divide n_devices (callers
    pad via space.set_padding).
    mesh: 1D jax.sharding.Mesh over the `cells` axis.
    """

    def __init__(
        self,
        cell_dofs: np.ndarray,
        n_dofs_padded: int,
        mesh: Mesh,
        axis_name: str = "cells",
    ) -> None:
        cd = np.asarray(cell_dofs)
        E, n_loc = cd.shape
        D = mesh.devices.size
        assert n_dofs_padded % D == 0, (
            f"n_dofs_padded {n_dofs_padded} must divide the device count {D}"
        )
        self.mesh = mesh
        self.axis = axis_name
        self.n_devices = D
        self.n_dofs_padded = int(n_dofs_padded)
        self.n_loc = n_loc

        # -- cell partition: contiguous blocks, padded to equal size -------
        E_pad = -(-E // D) * D
        if E_pad != E:
            pad = np.zeros((E_pad - E, n_loc), dtype=cd.dtype)
            cd = np.concatenate([cd, pad], axis=0)
        self.n_cells = E
        self.n_cells_padded = E_pad
        Eb = E_pad // D  # cells per device
        self.cells_per_device = Eb

        n_own = n_dofs_padded // D
        self.dofs_per_device = n_own

        # -- ghost layout per device ---------------------------------------
        # For device d: owned dofs [d*n_own, (d+1)*n_own); ghosts = remote
        # dofs referenced by its cells, grouped by owner-offset s (ring
        # distance owner-d mod D). All sizes padded to the per-offset max.
        cd_dev = cd.reshape(D, Eb, n_loc)
        owner = cd_dev // n_own  # owning device of each referenced dof
        offsets = sorted(
            {
                int(s)
                for d in range(D)
                for s in np.unique((owner[d] - d) % D)
                if int(s) != 0
            }
        )
        self.offsets = offsets

        ghost_of = []  # per device: dict offset -> sorted ghost dof array
        for d in range(D):
            refs = np.unique(cd_dev[d])
            remote = refs[(refs // n_own) != d]
            by_off = {}
            for s in offsets:
                by_off[s] = remote[((remote // n_own) - d) % D == s]
            ghost_of.append(by_off)
        L = {s: max(len(ghost_of[d][s]) for d in range(D)) for s in offsets}
        self.ghost_counts = L
        n_ghost = sum(L.values())
        self.n_ghost = n_ghost

        # pack maps: device d sends, for offset s, the values that device
        # (d - s) % D lists as its ghosts with that offset — local indices
        # into d's owned block (padded with 0; padding slots are DISCARDED
        # by the receiver and contribute nothing on the way back because
        # the receiver's pad slots hold zeros)
        pack = {
            s: np.zeros((D, L[s]), dtype=np.int64) for s in offsets
        }
        pack_valid = {s: np.zeros((D, L[s]), dtype=bool) for s in offsets}
        for s in offsets:
            for d in range(D):
                requester = (d - s) % D
                g = ghost_of[requester][s]
                pack[s][d, : len(g)] = g - d * n_own
                pack_valid[s][d, : len(g)] = True
        self.pack = {s: jnp.asarray(v) for s, v in pack.items()}
        self.pack_valid = {s: jnp.asarray(v) for s, v in pack_valid.items()}

        # local cell-dof map: owned dofs -> [0, n_own); ghosts -> n_own + slot
        base = {}
        off_base = 0
        for s in offsets:
            base[s] = off_base
            off_base += L[s]
        cd_local = np.zeros_like(cd_dev)
        for d in range(D):
            lookup = {}
            for s in offsets:
                for i, g in enumerate(ghost_of[d][s]):
                    lookup[int(g)] = n_own + base[s] + i
            flat = cd_dev[d].reshape(-1)
            own_mask = (flat // n_own) == d
            loc = np.where(own_mask, flat - d * n_own, 0)
            for i, gdof in enumerate(flat):
                if not own_mask[i]:
                    loc[i] = lookup[int(gdof)]
            cd_local[d] = loc.reshape(Eb, n_loc)
        self.cd_local = jnp.asarray(cd_local)  # (D, Eb, n_loc)

        spec_c = P(self.axis)
        self._gather_sm = jax.jit(
            jax.shard_map(
                self._gather_local,
                mesh=self.mesh,
                in_specs=(spec_c, spec_c),
                out_specs=spec_c,
            )
        )
        self._scatter_sm = jax.jit(
            jax.shard_map(
                self._scatter_local,
                mesh=self.mesh,
                in_specs=(spec_c, spec_c),
                out_specs=spec_c,
            )
        )

    # -- device-local bodies (run under shard_map) -------------------------
    def _exchange_ghosts(self, own):
        """own: (n_own,) owned block -> (n_ghost,) ghost values, by ring
        shifts. ppermute perm (src, dst): requester (d-s) receives from d."""
        parts = []
        D = self.n_devices
        for s in self.offsets:
            packed = own[self.pack[s][self._dev_index()]]
            perm = [(d, (d - s) % D) for d in range(D)]
            parts.append(
                jax.lax.ppermute(packed, axis_name=self.axis, perm=perm)
            )
        return jnp.concatenate(parts) if parts else jnp.zeros(
            (0,), own.dtype
        )

    def _dev_index(self):
        return jax.lax.axis_index(self.axis)

    def _gather_local(self, u_own, cd_loc):
        # u_own (n_own,), cd_loc (Eb, n_loc) for this shard
        ghosts = self._exchange_ghosts(u_own)
        full = jnp.concatenate([u_own, ghosts])
        return full[cd_loc]

    def _scatter_local(self, r_cells, cd_loc):
        # r_cells (Eb, n_loc) -> (n_own,) with compress of ghost sums
        full = (
            jnp.zeros(self.dofs_per_device + self.n_ghost, r_cells.dtype)
            .at[cd_loc.ravel()]
            .add(r_cells.ravel())
        )
        out = full[: self.dofs_per_device]
        D = self.n_devices
        base = self.dofs_per_device
        d = self._dev_index()
        for s in self.offsets:
            L = self.ghost_counts[s]
            ghost_sums = full[base : base + L]
            base += L
            # send ghost sums back to the owner: requester (d) -> owner (d+s)
            perm = [((dd - s) % D, dd) for dd in range(D)]
            arrived = jax.lax.ppermute(
                ghost_sums, axis_name=self.axis, perm=perm
            )
            # add into owned slots through the pack map; pad slots all hit
            # index 0 but carry zeros (the requester had no contributions
            # in its zero-initialized pad ghost slots... they may alias a
            # real ghost slot of a SHORTER list; mask to be safe)
            arrived = jnp.where(self.pack_valid[s][d], arrived, 0.0)
            out = out.at[self.pack[s][d]].add(arrived)
        return out

    # -- public API (IndexMapOps-compatible, global arrays) ----------------
    def gather(self, u):
        """(n_dofs_padded,) -> (E, n_loc): pad cells are trimmed, so the
        per-cell kernels see exactly the real cells (any cell count shards
        on any device count — no divisibility requirement)."""
        out = self._gather_sm(u, self.cd_local.reshape(-1, self.n_loc))
        return out[: self.n_cells]

    def scatter_add(self, r_cells):
        """(E, n_loc) -> (n_dofs_padded,): pad cells enter as explicit zero
        rows (the 'zero-JxW ghost cell' compress no-op)."""
        if self.n_cells_padded != self.n_cells:
            r_cells = jnp.pad(
                r_cells,
                ((0, self.n_cells_padded - self.n_cells), (0, 0)),
            )
        return self._scatter_sm(
            r_cells, self.cd_local.reshape(-1, self.n_loc)
        )
