"""Geometric multigrid on the adaptive-forest hierarchy (global coarsening).

The adaptive counterpart of solvers/multigrid.py LatticeGMG, playing the
role of the reference's ML-AMG on adaptively refined meshes
(navier_stokes_preconditioner.cc 'amg'/'amg linear' on p4est grids). Levels
follow deal.II's MGTransferGlobalCoarsening construction: the next-coarser
mesh merges every complete sibling group (ForestMesh.coarsened()), each
level carries the full Q_k space WITH its own hanging-node constraints, and
transfers are nodal interpolation between consecutive levels (precomputed
(master, weight) index maps — a gather-matvec on device). Chebyshev/Jacobi
smoothing per level, dense-matrix CG on the coarsest level.

Static geometry (spaces, constraints, transfer maps) is baked into the
compiled program; `compute(alpha, beta)` returns a GMGState pytree
(per-level diag + lambda_max + coarse dense matrix) so preconditioner
refreshes never retrace.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.forest_space import ForestSpace
from adaflo_tpu.fe.forest_transfer import ForestFunction
from adaflo_tpu.ops.tensor import VariableCellEvaluator
from adaflo_tpu.solvers.multigrid import GMGState, LevelState, estimate_lmax


@dataclass(eq=False)
class _FLevel:
    space: ForestSpace
    con: Constraints
    ev: VariableCellEvaluator
    cell_dofs: jnp.ndarray
    mask: np.ndarray  # Dirichlet dof indices (identity rows)
    # transfer to the NEXT (coarser) level: for each node of THIS level,
    # the coarse cell's local dofs + interpolation weights
    t_masters: Optional[jnp.ndarray] = None  # (n_this, n_loc_coarse)
    t_weights: Optional[jnp.ndarray] = None
    # fine-cell -> coarse-cell index (coefficient restriction)
    cell_parent: Optional[jnp.ndarray] = None


def _transfer_maps(coarse_space: ForestSpace, fine_space: ForestSpace):
    """Nodal-interpolation masters/weights of fine nodes in coarse cells."""
    fn = ForestFunction(coarse_space)
    pts = fine_space.node_coords
    cells = fn.locate(pts)
    xi = (pts - fn.cell_origin[cells]) / fn.h_cells[cells]
    xi = np.clip(xi, 0.0, 1.0)
    dim = fine_space.dim
    W = [fn.basis.tabulate(xi[:, a])[0] for a in range(dim)]
    if dim == 1:
        wloc = W[0]
    elif dim == 2:
        wloc = np.einsum("nj,ni->nji", W[1], W[0]).reshape(len(pts), -1)
    else:
        wloc = np.einsum("nk,nj,ni->nkji", W[2], W[1], W[0]).reshape(
            len(pts), -1
        )
    masters = fn.cell_dofs[cells]  # (n_f, n_loc)
    return jnp.asarray(masters), jnp.asarray(wloc)


class ForestGMG:
    """V-cycle preconditioner for alpha M + beta K on a forest Q_k space."""

    def __init__(
        self,
        space: ForestSpace,
        dirichlet_sides: List[Tuple[int, int]],
        n_dofs_padded: int,
        pin_position: Optional[np.ndarray] = None,
        smoother_degree: int = 3,
        min_coarse_nodes: int = 700,
        max_coarse_dense: int = 4096,
    ) -> None:
        self.dim = space.dim
        self.n_dofs_padded = n_dofs_padded
        self.smoother_degree = smoother_degree

        def level_mask(sp: ForestSpace) -> np.ndarray:
            dofs = [np.empty(0, dtype=np.int64)]
            for a, s in dirichlet_sides:
                dofs.append(sp.side_dofs(a, s))
            if pin_position is not None:
                d = np.linalg.norm(sp.node_coords - pin_position, axis=1)
                cand = int(np.argmin(d))
                dofs.append(np.array([cand], dtype=np.int64))
            return np.unique(np.concatenate(dofs))

        levels: List[_FLevel] = []
        sp = space
        while True:
            mask = level_mask(sp)
            con = sp.make_constraints(dirichlet=mask)
            ev = VariableCellEvaluator(
                sp.dim, sp.basis, sp.degree + 1, sp.h_cells
            )
            levels.append(
                _FLevel(sp, con, ev, jnp.asarray(sp.cell_dofs),
                        con.dirichlet_dofs)
            )
            coarser = sp.forest.coarsened()
            if (
                coarser.n_cells == sp.forest.n_cells
                or sp.n_dofs <= min_coarse_nodes
            ):
                break
            csp = ForestSpace(coarser, sp.degree)
            lev = levels[-1]
            lev.t_masters, lev.t_weights = _transfer_maps(csp, sp)
            cfn = ForestFunction(csp)
            lev.cell_parent = jnp.asarray(cfn.locate(sp.cell_center))
            sp = csp
        self.levels = levels
        self.coarse_n = levels[-1].space.n_dofs
        self.direct_coarse = self.coarse_n <= max_coarse_dense

    # -- level operator ----------------------------------------------------
    def _apply_raw(self, lev: _FLevel, alpha, beta, x):
        xr = lev.con.resolve(x)
        xc = xr[lev.cell_dofs]
        al = alpha if alpha.ndim == 0 else alpha[:, None]
        r = lev.ev.integrate_values(al * lev.ev.values(xc))
        g = lev.ev.gradients(xc)
        g = g * (beta if beta.ndim == 0 else beta[:, None, None])
        r = r + lev.ev.integrate_gradients(g)
        out = (
            jnp.zeros(lev.space.n_dofs, r.dtype)
            .at[lev.cell_dofs.ravel()]
            .add(r.ravel())
        )
        return lev.con.condense(out)

    def _apply(self, lev: _FLevel, st: LevelState, x):
        cd = lev.con.constrained_dofs
        out = self._apply_raw(lev, st.alpha, st.beta, x)
        if len(cd):
            out = out.at[cd].set(x[cd])
        return out

    def _diagonal(self, lev: _FLevel, alpha, beta):
        E = lev.cell_dofs.shape[0]
        nl = lev.ev.n_local
        units = jnp.eye(nl)

        def apply_unit(unit):
            xc = jnp.broadcast_to(unit[None], (E, nl))
            al = alpha if alpha.ndim == 0 else alpha[:, None]
            r = lev.ev.integrate_values(al * lev.ev.values(xc))
            g = lev.ev.gradients(xc)
            g = g * (beta if beta.ndim == 0 else beta[:, None, None])
            return r + lev.ev.integrate_gradients(g)

        out = jax.lax.map(apply_unit, units, batch_size=min(nl, 4))
        idx = jnp.arange(nl)
        diag_loc = jnp.transpose(out[idx, :, idx], (1, 0))
        d = (
            jnp.zeros(lev.space.n_dofs)
            .at[lev.cell_dofs.ravel()]
            .add(diag_loc.ravel())
        )
        cd = lev.con.constrained_dofs
        if len(cd):
            d = d.at[cd].set(1.0)
        return d

    # -- state construction (jittable) --------------------------------------
    def compute(self, alpha, beta) -> GMGState:
        states = []
        al, be = jnp.asarray(alpha), jnp.asarray(beta)
        for li, lev in enumerate(self.levels):
            diag = self._diagonal(lev, al, be)
            Dinv = jnp.where(jnp.abs(diag) > 1e-300, 1.0 / diag, 1.0)
            lam = estimate_lmax(
                lambda x, _al=al, _be=be, _lev=lev: self._apply_raw(
                    _lev, _al, _be, x
                ),
                Dinv, diag.size, diag.dtype,
            )
            states.append(LevelState(al, be, diag, lam))
            if li + 1 < len(self.levels):
                al = self._coarsen_cells(al, lev)
                be = self._coarsen_cells(be, lev)
        coarse_matrix = None
        if self.direct_coarse:
            coarse = self.levels[-1]
            st = states[-1]
            eye = jnp.eye(self.coarse_n)
            cols = jax.lax.map(
                lambda e: self._apply(coarse, st, e), eye,
                batch_size=min(self.coarse_n, 64),
            )
            coarse_matrix = jnp.transpose(cols)
        return GMGState(tuple(states), coarse_matrix)

    def _coarsen_cells(self, x, lev: _FLevel):
        if x.ndim == 0:
            return x
        n_c = int(self.levels[self.levels.index(lev) + 1].space.n_cells)
        s = jax.ops.segment_sum(x, lev.cell_parent, num_segments=n_c)
        cnt = jax.ops.segment_sum(
            jnp.ones_like(x), lev.cell_parent, num_segments=n_c
        )
        return s / jnp.maximum(cnt, 1.0)

    # -- transfers -----------------------------------------------------------
    def _restrict(self, lev: _FLevel, r):
        n_c = self.levels[self.levels.index(lev) + 1].space.n_dofs
        contrib = lev.t_weights * r[:, None]  # (n_f, n_loc)
        return (
            jnp.zeros(n_c, r.dtype)
            .at[lev.t_masters.ravel()]
            .add(contrib.ravel())
        )

    def _prolong(self, lev: _FLevel, xc):
        return (lev.t_weights * xc[lev.t_masters]).sum(axis=-1)

    # -- cycle ----------------------------------------------------------------
    def _smooth(self, lev: _FLevel, st: LevelState, x, b, degree: int):
        lmax = 1.1 * st.lmax
        lmin = st.lmax / 4.0
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma1 = theta / delta
        Dinv = jnp.where(jnp.abs(st.diag) > 1e-300, 1.0 / st.diag, 1.0)
        r = b - self._apply(lev, st, x)
        z = Dinv * r
        d = z / theta
        x = x + d
        rho_old = 1.0 / sigma1
        for _ in range(1, degree):
            r = b - self._apply(lev, st, x)
            z = Dinv * r
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            d = rho * rho_old * d + (2.0 * rho / delta) * z
            x = x + d
            rho_old = rho
        return x

    def _vcycle(self, li: int, state: GMGState, b):
        lev = self.levels[li]
        st = state.levels[li]
        if li == len(self.levels) - 1:
            if state.coarse_matrix is not None:
                from adaflo_tpu.solvers.krylov import cg as _cg

                A = state.coarse_matrix
                dg = jnp.diagonal(A)
                dinv = jnp.where(jnp.abs(dg) > 1e-300, 1.0 / dg, 1.0)
                res = _cg(
                    lambda x: A @ x,
                    b,
                    jnp.zeros_like(b),
                    jnp.asarray(1e-50, b.dtype),
                    200,
                    M=lambda r: dinv * r,
                    reduction=1e-10,
                )
                return res.x
            return self._smooth(lev, st, jnp.zeros_like(b), b, 8)
        x = self._smooth(lev, st, jnp.zeros_like(b), b, self.smoother_degree)
        r = b - self._apply(lev, st, x)
        cd = lev.con.constrained_dofs
        if len(cd):
            r = r.at[cd].set(0.0)
        # restrict through the conforming embedding: expand hanging rows
        # before interpolating, fold them back after
        rc = self._restrict(lev, r)
        nxt = self.levels[li + 1]
        rc = nxt.con.condense(rc)
        cdn = nxt.con.constrained_dofs
        if len(cdn):
            rc = rc.at[cdn].set(0.0)
        xc = self._vcycle(li + 1, state, rc)
        if len(cdn):
            xc = xc.at[cdn].set(0.0)
        xc = nxt.con.resolve(xc)
        x = x + self._prolong(lev, xc)
        x = self._smooth(lev, st, x, b, self.smoother_degree)
        return x

    def vmult(self, state: GMGState, b):
        n = self.levels[0].space.n_dofs
        b_act = b[:n]
        mask = self.levels[0].con.constrained_dofs
        b_in = b_act
        if len(mask):
            b_act = b_act.at[mask].set(0.0)
        x = self._vcycle(0, state, b_act)
        if len(mask):
            x = x.at[mask].set(b_in[mask])
        if b.shape[0] > n:
            x = jnp.concatenate([x, jnp.zeros(b.shape[0] - n, b.dtype)])
        return x
