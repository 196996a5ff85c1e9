"""Affine constraints as precomputed gather/scatter index maps.

TPU-native counterpart of deal.II AffineConstraints as used by the reference
(/root/reference/source/navier_stokes.cc:228-360): Dirichlet rows, periodicity
and (later) hanging nodes are all represented as static index/weight arrays so
that constraint application inside jitted code is a masked gather — no
host-side logic on the hot path.

Semantics mirror deal.II matrix-free exactly:
- ``resolve`` = read_dof_values: constrained entries replaced by their
  (homogeneous) constraint expansion; Dirichlet entries read 0.
- plain gather (residuals) uses the raw vector, honoring inhomogeneous
  boundary values written into the solution (navier_stokes_matrix.cc:659-666).
- ``condense`` = distribute_local_to_global: slave-row contributions
  accumulate into master rows, constrained rows end at zero.
- ``distribute``: writes the constraint values into a vector (homogeneous:
  Dirichlet rows zeroed, slaves = weighted masters).
"""

from __future__ import annotations



import numpy as np


class Constraints:
    """Constraints for one scalar dof vector of length n_dofs.

    Vector-valued fields (velocity) keep one Constraints object per
    component, matching the per-component masks the structured boundary
    conditions produce (symmetry planes constrain only the normal
    component)."""

    def __init__(self, n_dofs: int) -> None:
        self.n_dofs = n_dofs
        self._dirichlet = np.zeros(n_dofs, dtype=bool)
        # general affine rows: slave -> sum_k weight * master
        self._slaves: list[np.ndarray] = []
        self._masters: list[np.ndarray] = []
        self._weights: list[np.ndarray] = []
        self._closed = False

    # -- construction ------------------------------------------------------
    def add_dirichlet(self, dofs: np.ndarray) -> None:
        assert not self._closed
        self._dirichlet[np.asarray(dofs, dtype=np.int64)] = True

    def add_affine(
        self, slaves: np.ndarray, masters: np.ndarray, weights: np.ndarray
    ) -> None:
        assert not self._closed
        self._slaves.append(np.asarray(slaves, dtype=np.int64))
        self._masters.append(np.asarray(masters, dtype=np.int64))
        self._weights.append(np.asarray(weights, dtype=np.float64))

    def close(self) -> None:
        if self._closed:
            return
        if self._slaves:
            self.slave = np.concatenate(self._slaves)
            self.master = np.concatenate(self._masters)
            self.weight = np.concatenate(self._weights)
            # a dof that is Dirichlet wins over an affine row
            keep = ~self._dirichlet[self.slave]
            self.slave = self.slave[keep]
            self.master = self.master[keep]
            self.weight = self.weight[keep]
            # drop exact-duplicate (slave, master) entries (a hanging node
            # can be reported from several coarse faces with the same row)
            self._dedup_first()
            # then substitute constrained masters; substitution can create
            # duplicate masters inside one row, whose weights must SUM.
            # Dirichlet masters are terminals (they carry no row of their
            # own), so the resolved table expresses every slave in terms of
            # free and Dirichlet dofs only: this is the VALUE table, valid
            # for solution vectors holding inhomogeneous boundary values.
            self._resolve_chains()
            self._dedup_sum()
            self.vslave = self.slave.copy()
            self.vmaster = self.master.copy()
            self.vweight = self.weight.copy()
            # homogeneous table (updates / residual reads): Dirichlet
            # masters read zero, so their entries drop out
            keep = ~self._dirichlet[self.master]
            self.slave = self.slave[keep]
            self.master = self.master[keep]
            self.weight = self.weight[keep]
            # a row that vanished (every master Dirichlet) pins its UPDATE
            # to zero; distribute_values still sets its value from the
            # Dirichlet masters, so mark it Dirichlet only for the
            # homogeneous bookkeeping
            vanished = np.setdiff1d(np.unique(self.vslave), np.unique(self.slave))
            self._dirichlet[vanished] = True
        else:
            self.slave = np.empty(0, dtype=np.int64)
            self.master = np.empty(0, dtype=np.int64)
            self.weight = np.empty(0, dtype=np.float64)
            self.vslave = self.slave
            self.vmaster = self.master
            self.vweight = self.weight
        self.dirichlet_dofs = np.flatnonzero(self._dirichlet)
        is_constrained = self._dirichlet.copy()
        is_constrained[self.vslave] = True
        self.constrained_dofs = np.flatnonzero(is_constrained)
        self.is_constrained = is_constrained
        # compressed rows for multi-master constraints (hanging nodes):
        # unique slave ids + a segment index per COO entry
        self.slave_unique, self._seg = np.unique(self.slave, return_inverse=True)
        self._multi_master = len(self.slave_unique) != len(self.slave)
        self.vslave_unique, self._vseg = np.unique(
            self.vslave, return_inverse=True
        )
        self._closed = True

    def _dedup_first(self) -> None:
        key = self.slave * (self.n_dofs + 1) + self.master
        _, first = np.unique(key, return_index=True)
        first.sort()
        self.slave = self.slave[first]
        self.master = self.master[first]
        self.weight = self.weight[first]

    def _dedup_sum(self) -> None:
        key = self.slave * (self.n_dofs + 1) + self.master
        ukey, inv = np.unique(key, return_inverse=True)
        w = np.zeros(len(ukey))
        np.add.at(w, inv, self.weight)
        self.slave = (ukey // (self.n_dofs + 1)).astype(np.int64)
        self.master = (ukey % (self.n_dofs + 1)).astype(np.int64)
        self.weight = w
        nz = np.abs(self.weight) > 1e-13
        self.slave, self.master, self.weight = (
            self.slave[nz],
            self.master[nz],
            self.weight[nz],
        )

    def _resolve_chains(self) -> None:
        """Substitute masters that are themselves constrained.

        Hanging-node closures can chain (a master on a coarse face may hang
        on a yet-coarser edge in 3D); deal.II resolves these when closing
        AffineConstraints, and so do we: iterate substitution of slave
        masters until every master is free or Dirichlet (Dirichlet dofs
        carry no row — their slave rows were dropped — so they terminate
        chains naturally)."""
        for _ in range(20):
            uslaves = np.unique(self.slave)
            bad_slave = np.isin(self.master, uslaves)
            if not bad_slave.any():
                return
            keep = ~bad_slave
            # rows of the current table, keyed by slave (only needed ones)
            need = np.unique(self.master[bad_slave])
            rows: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            for s in need:
                sel = self.slave == s
                rows[int(s)] = (self.master[sel], self.weight[sel])
            new_s = [self.slave[keep]]
            new_m = [self.master[keep]]
            new_w = [self.weight[keep]]
            for s, m, w in zip(
                self.slave[bad_slave], self.master[bad_slave], self.weight[bad_slave]
            ):
                mm, mw = rows[int(m)]
                new_s.append(np.full(len(mm), s, dtype=np.int64))
                new_m.append(mm)
                new_w.append(w * mw)
            self.slave = np.concatenate(new_s)
            self.master = np.concatenate(new_m)
            self.weight = np.concatenate(new_w)
        raise RuntimeError("constraint chain did not resolve in 20 passes")

    @property
    def n_constrained(self) -> int:
        return len(self.constrained_dofs)

    # -- device-side application (works on numpy or jax arrays) -----------
    def resolve(self, u):
        """read_dof_values semantics: homogeneous expansion of constraints."""
        assert self._closed
        import jax.numpy as jnp

        if len(self.slave):
            if self._multi_master:
                import jax

                vals = jax.ops.segment_sum(
                    self.weight * u[self.master],
                    jnp.asarray(self._seg),
                    num_segments=len(self.slave_unique),
                )
                u = u.at[self.slave_unique].set(vals)
            else:
                u = u.at[self.slave].set(self.weight * u[self.master])
        if len(self.dirichlet_dofs):
            u = u.at[self.dirichlet_dofs].set(jnp.zeros((), u.dtype))
        return u

    def condense(self, r):
        """distribute_local_to_global tail: move slave-row sums to masters,
        zero all constrained rows."""
        assert self._closed
        if len(self.slave):
            r = r.at[self.master].add(self.weight * r[self.slave])
        if len(self.constrained_dofs):
            r = r.at[self.constrained_dofs].set(0.0)
        return r

    def distribute(self, u):
        """Write constraint values into the vector (homogeneous)."""
        assert self._closed
        if len(self.slave):
            if self._multi_master:
                import jax
                import jax.numpy as jnp

                vals = jax.ops.segment_sum(
                    self.weight * u[self.master],
                    jnp.asarray(self._seg),
                    num_segments=len(self.slave_unique),
                )
                u = u.at[self.slave_unique].set(vals)
            else:
                u = u.at[self.slave].set(self.weight * u[self.master])
        if len(self.dirichlet_dofs):
            u = u.at[self.dirichlet_dofs].set(0.0)
        return u

    def distribute_values(self, u):
        """Make a SOLUTION vector conforming: slaves <- weighted masters
        using the VALUE table, which keeps Dirichlet masters (they hold the
        inhomogeneous boundary values written into the vector). Dirichlet
        rows are left untouched. This is deal.II
        AffineConstraints::distribute with inhomogeneities carried by the
        vector itself."""
        assert self._closed
        if len(self.vslave):
            import jax
            import jax.numpy as jnp

            vals = jax.ops.segment_sum(
                self.vweight * u[self.vmaster],
                jnp.asarray(self._vseg),
                num_segments=len(self.vslave_unique),
            )
            u = u.at[self.vslave_unique].set(vals)
        return u

    def set_identity(self, dst, src):
        """vmult tail: dst[constrained] = sign * src[constrained]
        (navier_stokes_matrix.cc:247-256)."""
        if len(self.constrained_dofs):
            dst = dst.at[self.constrained_dofs].set(src[self.constrained_dofs])
        return dst
