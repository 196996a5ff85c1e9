"""Geometric multigrid on the Q1-subelement lattice hierarchy.

TPU-native replacement for the reference's ML-AMG with 'amg linear'
(navier_stokes_preconditioner.cc:42-45, 465-562, 2489-2704): the reference
builds its AMG hierarchy from the *linear-subelement* sparse matrix of the
Q_k space — i.e. it treats the Q_k dof lattice as a Q1 mesh with k x N cells
per axis. Here the same idea becomes *geometric*: the Q_k dof lattice IS a
structured Q1 lattice, which coarsens by factor-2 lattice nesting with
tensor-product linear interpolation; each level rediscretizes the
Helmholtz-type model operator alpha M + beta K (per-cell coefficients
restricted by averaging) and smooths with Chebyshev/Jacobi; the coarsest
level solves directly (dense LU). All level transfers are small per-axis
contractions (batched GEMMs) and the whole V-cycle jits into one XLA program
— no graph algorithms, no triangular solves.

The class splits into static geometry (hierarchy, index maps, masks — baked
into the compiled program) and a `GMGState` pytree of coefficient-dependent
arrays (per-level alpha/beta/diag/lambda_max + coarse LU) rebuilt by the
jitted `compute()` whenever the preconditioner refreshes — so refreshes never
retrace.

Used per velocity component (alpha = rho * time weight, beta ~ viscosity) and
for the pressure Poisson operator (alpha = 0, beta = 1/(w rho)).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.basis import basis as make_basis
from adaflo_tpu.ops.lattice import LatticeOps
from adaflo_tpu.ops.tensor import CellEvaluator, VariableCellEvaluator


class LevelState(NamedTuple):
    alpha: jnp.ndarray  # () or (E,)
    beta: jnp.ndarray  # () or (E,)
    diag: jnp.ndarray  # (n,)
    lmax: jnp.ndarray  # ()


def estimate_lmax(apply_fn, Dinv, n, dtype, m: int = 25):
    """Largest eigenvalue of D^-1 A by m-step Lanczos on the similar
    symmetric operator D^-1/2 A D^-1/2 (the extreme Ritz value converges
    geometrically, unlike plain power iteration on the clustered spectra of
    FE operators — the reference relies on deal.II's CG-Lanczos estimate
    inside PreconditionChebyshev for the same reason). Jittable: fixed
    iteration count, dense eigvalsh of the m x m tridiagonal."""
    sq = jnp.sqrt(jnp.abs(Dinv))
    v = jnp.cos(jnp.arange(n, dtype=dtype) * 0.7 + 0.3)
    v = v / jnp.linalg.norm(v)
    v_prev = jnp.zeros_like(v)
    beta = jnp.asarray(0.0, dtype)
    alphas, betas = [], []
    for _ in range(m):
        w = sq * apply_fn(sq * v)
        a = jnp.vdot(v, w).real.astype(dtype)
        w = w - a * v - beta * v_prev
        beta_new = jnp.linalg.norm(w).astype(dtype)
        v_prev = v
        v = w / jnp.maximum(beta_new, jnp.asarray(1e-30, dtype))
        alphas.append(a)
        betas.append(beta_new)
        beta = beta_new
    T = jnp.diag(jnp.stack(alphas))
    off = jnp.stack(betas[:-1])
    T = T + jnp.diag(off, 1) + jnp.diag(off, -1)
    return jnp.max(jnp.linalg.eigvalsh(T))


class GMGState(NamedTuple):
    levels: Tuple[LevelState, ...]
    coarse_matrix: object  # dense (n_c, n_c) coarse operator or None


@dataclass
class _LevelGeom:
    n_nodes_axis: tuple
    n_cells_axis: tuple
    cell_dofs: jnp.ndarray  # (E, 2^dim)
    ev: CellEvaluator
    mask: np.ndarray  # constrained dof indices (static)
    lat: LatticeOps = None
    P1d: List[np.ndarray] = field(default_factory=list)  # per-axis (n_f, n_c)
    axis_widths: Optional[List[np.ndarray]] = None  # graded axes only


def _outer_widths(widths: List[np.ndarray], n_cells_axis) -> np.ndarray:
    """(E, dim) per-cell extents from per-axis width arrays (lexicographic
    cell order, x fastest) — the diagonal-Jacobian geometry of a graded
    tensor lattice."""
    dim = len(n_cells_axis)
    out = np.empty((int(np.prod(n_cells_axis)), dim))
    for a in range(dim):
        shape = [1] * dim
        shape[dim - 1 - a] = -1
        out[:, a] = np.broadcast_to(
            widths[a].reshape(shape), tuple(reversed(n_cells_axis))
        ).reshape(-1)
    return out


def _q1_cell_dofs(n_cells_axis, n_nodes_axis):
    dim = len(n_cells_axis)
    per_axis = []
    for a in range(dim):
        cells = np.arange(n_cells_axis[a])[:, None]
        per_axis.append(cells + np.arange(2)[None, :])
    if dim == 1:
        out = per_axis[0]
    elif dim == 2:
        nx = n_nodes_axis[0]
        gx = per_axis[0][None, :, None, :]
        gy = per_axis[1][:, None, :, None]
        out = (gx + nx * gy).reshape(-1, 4)
    else:
        nx, ny = n_nodes_axis[0], n_nodes_axis[1]
        gx = per_axis[0][None, None, :, None, None, :]
        gy = per_axis[1][None, :, None, None, :, None]
        gz = per_axis[2][:, None, None, :, None, None]
        out = (gx + nx * (gy + ny * gz)).reshape(-1, 8)
    return out.astype(np.int32)


def _interp_1d(n_fine_cells: int, widths: Optional[np.ndarray] = None) -> np.ndarray:
    """(n_fine_nodes, n_coarse_nodes) linear interpolation between nested
    lattices (fine has 2x cells). On a graded axis the odd fine node sits at
    the TRUE relative position t = w[2i]/(w[2i]+w[2i+1]) inside its coarse
    cell (uniform: t = 0.5), so prolongation interpolates the coarse
    piecewise-linear function exactly — the geometric analog of the
    reference's ML-AMG handling any graded mesh through the assembled
    matrix (navier_stokes_preconditioner.cc:465-562)."""
    nc = n_fine_cells // 2 + 1
    nf = n_fine_cells + 1
    P = np.zeros((nf, nc))
    for i in range(nc):
        P[2 * i, i] = 1.0
    for i in range(nc - 1):
        if widths is None:
            t = 0.5
        else:
            t = widths[2 * i] / (widths[2 * i] + widths[2 * i + 1])
        P[2 * i + 1, i] = 1.0 - t
        P[2 * i + 1, i + 1] = t
    return P


class LatticeGMG:
    """V-cycle preconditioner for alpha M + beta K on a structured lattice.

    Operates on dof vectors of the original Q_k space (its nodal lattice is
    the finest Q1 level); constrained rows act as identity; padded tails are
    passed through as zero."""

    def __init__(
        self,
        n_nodes_axis: tuple,
        h_fine_axis,
        dirichlet: np.ndarray,
        n_dofs_padded: int,
        smoother_degree: int = 3,
        min_coarse_nodes: int = 700,
        axis_widths: Optional[List[np.ndarray]] = None,
    ) -> None:
        """axis_widths: per-axis arrays of fine-Q1-lattice cell widths for
        GRADED tensor meshes (len = n_nodes_axis[a] - 1); when given it
        overrides the uniform h_fine_axis and every level carries real
        geometry (VariableCellEvaluator, width-weighted transfers and
        coefficient averaging)."""
        dim = len(n_nodes_axis)
        self.dim = dim
        self.n_dofs_padded = n_dofs_padded
        self.smoother_degree = smoother_degree
        q1 = make_basis(1, "equidistant")

        levels: List[_LevelGeom] = []
        n_cells_axis = tuple(n - 1 for n in n_nodes_axis)
        h = (
            np.asarray(h_fine_axis, dtype=np.float64)
            if h_fine_axis is not None
            else None
        )
        widths = (
            [np.asarray(w, dtype=np.float64) for w in axis_widths]
            if axis_widths is not None
            else None
        )
        if widths is not None:
            for a in range(dim):
                assert len(widths[a]) == n_cells_axis[a], (
                    f"axis {a}: {len(widths[a])} widths vs "
                    f"{n_cells_axis[a]} lattice cells"
                )
        mask = np.asarray(dirichlet, dtype=np.int64)
        nodes_axis = tuple(n_nodes_axis)
        while True:
            if widths is not None:
                ev = VariableCellEvaluator(
                    dim, q1, 2, _outer_widths(widths, n_cells_axis)
                )
            else:
                ev = CellEvaluator(dim, q1, 2, h)
            cd = _q1_cell_dofs(n_cells_axis, nodes_axis)
            lat = LatticeOps(
                nodes_axis, n_cells_axis, 1, (False,) * dim,
                int(np.prod(nodes_axis)),
            )
            lev = _LevelGeom(nodes_axis, n_cells_axis, jnp.asarray(cd), ev, mask, lat)
            lev.axis_widths = widths
            levels.append(lev)
            can_coarsen = all(c % 2 == 0 and c >= 2 for c in n_cells_axis) and (
                int(np.prod(nodes_axis)) > min_coarse_nodes
            )
            if not can_coarsen:
                break
            lev.P1d = [
                _interp_1d(c, widths[a] if widths is not None else None)
                for a, c in enumerate(n_cells_axis)
            ]
            fine_mask = np.zeros(int(np.prod(nodes_axis)), dtype=bool)
            fine_mask[mask] = True
            fm = fine_mask.reshape(tuple(reversed(nodes_axis)))
            for a in range(dim):
                fm = np.take(fm, np.arange(0, fm.shape[a], 2), axis=a)
            mask = np.flatnonzero(fm.reshape(-1))
            n_cells_axis = tuple(c // 2 for c in n_cells_axis)
            nodes_axis = tuple(c + 1 for c in n_cells_axis)
            if widths is not None:
                widths = [w[0::2] + w[1::2] for w in widths]
            else:
                h = h * 2.0
        self.levels = levels
        self.coarse_n = int(np.prod(levels[-1].n_nodes_axis))
        self.direct_coarse = self.coarse_n <= 4096

    # -- state construction (jittable) -----------------------------------
    def compute(self, alpha, beta) -> GMGState:
        """Build the coefficient-dependent state. alpha/beta: scalars or
        per-fine-Q1-cell arrays (lexicographic cell order)."""
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
            cols = jax.vmap(lambda e: self._apply(coarse, st, e))(eye)
            coarse_matrix = jnp.transpose(cols)
        return GMGState(tuple(states), coarse_matrix)

    def _coarsen_cells(self, x, lev: _LevelGeom):
        """Volume-weighted coefficient averaging onto the next level
        (width-weighted per axis; uniform meshes reduce to plain means)."""
        if x.ndim == 0:
            return x
        xx = x.reshape(tuple(reversed(lev.n_cells_axis)))
        for a in range(self.dim):
            even = jnp.take(xx, jnp.arange(0, xx.shape[a], 2), axis=a)
            odd = jnp.take(xx, jnp.arange(1, xx.shape[a], 2), axis=a)
            if lev.axis_widths is None:
                xx = 0.5 * (even + odd)
            else:
                # tensor axis a is the REVERSED physical axis
                w = lev.axis_widths[self.dim - 1 - a]
                shape = [1] * self.dim
                shape[a] = -1
                w0 = jnp.asarray(w[0::2]).reshape(shape)
                w1 = jnp.asarray(w[1::2]).reshape(shape)
                xx = (w0 * even + w1 * odd) / (w0 + w1)
        return xx.reshape(-1)

    # -- operator application --------------------------------------------
    def _apply_raw(self, lev: _LevelGeom, alpha, beta, x):
        xc = lev.lat.gather(x)
        al = alpha if alpha.ndim == 0 else alpha[:, None]
        r = lev.ev.integrate_values(al * lev.ev.values(xc))
        g = lev.ev.gradients(xc)
        g = g * (beta if beta.ndim == 0 else beta[:, None, None])
        r = r + lev.ev.integrate_gradients(g)
        return lev.lat.scatter_add(r)

    def _apply(self, lev: _LevelGeom, st: LevelState, x):
        if len(lev.mask):
            x_in = x
            x = x.at[lev.mask].set(0.0)
        out = self._apply_raw(lev, st.alpha, st.beta, x)
        if len(lev.mask):
            out = out.at[lev.mask].set(x_in[lev.mask])
        return out

    def _diagonal(self, lev: _LevelGeom, alpha, beta):
        n = int(np.prod(lev.n_nodes_axis))
        E = lev.cell_dofs.shape[0]
        units = jnp.eye(2**self.dim)

        def apply_unit(unit):
            xc = jnp.broadcast_to(unit[None], (E, 2**self.dim))
            al = alpha if alpha.ndim == 0 else alpha[:, None]
            r = lev.ev.integrate_values(al * lev.ev.values(xc))
            g = lev.ev.gradients(xc)
            g = g * (beta if beta.ndim == 0 else beta[:, None, None])
            return r + lev.ev.integrate_gradients(g)

        out = jax.vmap(apply_unit)(units)
        idx = jnp.arange(2**self.dim)
        diag_loc = jnp.transpose(out[idx, :, idx], (1, 0))
        d = lev.lat.scatter_add(diag_loc)
        if len(lev.mask):
            d = d.at[lev.mask].set(1.0)
        return d

    # -- cycle pieces ----------------------------------------------------
    def _smooth(self, lev: _LevelGeom, st: LevelState, x, b, degree: int):
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

    def _restrict(self, lev: _LevelGeom, r):
        rr = r.reshape(tuple(reversed(lev.n_nodes_axis)))
        for a, Pa in enumerate(lev.P1d):
            ax = self.dim - 1 - a
            rr = jnp.tensordot(rr, jnp.asarray(Pa), axes=([ax], [0]))
            rr = jnp.moveaxis(rr, -1, ax)
        return rr.reshape(-1)

    def _prolong(self, lev: _LevelGeom, xc):
        xx = xc.reshape(tuple(reversed([P.shape[1] for P in lev.P1d])))
        for a, Pa in enumerate(lev.P1d):
            ax = self.dim - 1 - a
            xx = jnp.tensordot(xx, jnp.asarray(Pa), axes=([ax], [1]))
            xx = jnp.moveaxis(xx, -1, ax)
        return xx.reshape(-1)

    def _vcycle(self, li: int, state: GMGState, b):
        lev = self.levels[li]
        st = state.levels[li]
        if li == len(self.levels) - 1:
            if state.coarse_matrix is not None:
                # dense-matrix CG bottom solve (TPU has no f64 LU); the
                # coarse system is tiny, so the fixed iteration budget is
                # cheap and keeps everything inside one XLA program
                from adaflo_tpu.solvers.krylov import cg as _cg

                A = state.coarse_matrix
                dinv = jnp.where(
                    jnp.abs(jnp.diagonal(A)) > 1e-300,
                    1.0 / jnp.diagonal(A),
                    1.0,
                )
                res = _cg(
                    lambda x: A @ x,
                    b,
                    jnp.zeros_like(b),
                    jnp.float64(1e-50),
                    200,
                    M=lambda r: dinv * r,
                    reduction=1e-10,
                )
                return res.x
            return self._smooth(lev, st, jnp.zeros_like(b), b, 8)
        x = self._smooth(lev, st, jnp.zeros_like(b), b, self.smoother_degree)
        r = b - self._apply(lev, st, x)
        if len(lev.mask):
            r = r.at[lev.mask].set(0.0)
        rc = self._restrict(lev, r)
        nxt = self.levels[li + 1]
        if len(nxt.mask):
            rc = rc.at[nxt.mask].set(0.0)
        xc = self._vcycle(li + 1, state, rc)
        if len(nxt.mask):
            xc = xc.at[nxt.mask].set(0.0)
        x = x + self._prolong(lev, xc)
        x = self._smooth(lev, st, x, b, self.smoother_degree)
        return x

    def vmult(self, state: GMGState, b):
        n = int(np.prod(self.levels[0].n_nodes_axis))
        b_act = b[:n]
        mask = self.levels[0].mask
        b_in = b_act
        if len(mask):
            b_act = b_act.at[mask].set(0.0)
        x = self._vcycle(0, state, b_act)
        if len(mask):
            x = x.at[mask].set(b_in[mask])
        if b.shape[0] > n:
            x = jnp.concatenate([x, jnp.zeros(b.shape[0] - n, b.dtype)])
        return x
