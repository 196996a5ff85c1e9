"""Jitted Krylov solvers: CG, BiCGStab, GMRES(m), FGMRES(m).

TPU-native replacement for the deal.II solver classes the reference uses
(SolverGMRES/SolverFGMRES/SolverCG/SolverBicgstab, e.g.
/root/reference/source/navier_stokes.cc:588-641): whole solver loops are
`lax.while_loop`s inside one XLA program, so a full linear solve is a single
device launch; dot products become on-chip (and, under shard_map, `psum`)
reductions instead of MPI allreduces.

All solvers operate on pytrees (the (u, p) block vector is a tuple pytree).
GMRES/FGMRES use right preconditioning (as the reference configures deal.II:
AdditionalData(50, true)), so reported residuals are true residuals.
Convergence control mirrors deal.II SolverControl: stop when ||r|| < tol
(absolute; callers pass tolerances already scaled by their policy) or when
max_iter is hit.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class SolverResult(NamedTuple):
    x: object  # solution pytree
    iterations: jnp.ndarray  # int32
    residual: jnp.ndarray  # final (estimated) residual norm
    converged: jnp.ndarray  # bool


# ---------------------------------------------------------------- tree utils
def _dot(a, b):
    # NOT jnp.vdot: vdot ravels ND leaves, and flattening an array that is
    # sharded along a non-leading axis interleaves the shards — GSPMD then
    # materializes an all-gather per Krylov iteration. multiply+sum keeps
    # the operand sharding and lowers the reduction to one all-reduce.
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(
        jnp.sum(jnp.conj(x) * y) for x, y in zip(leaves_a, leaves_b)
    )


def _norm(a):
    return jnp.sqrt(_dot(a, a))


def _axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda a, b: alpha * a + b, x, y)


def _scale(alpha, x):
    return jax.tree_util.tree_map(lambda a: alpha * a, x)


def _sub(x, y):
    return jax.tree_util.tree_map(lambda a, b: a - b, x, y)


def _add(x, y):
    return jax.tree_util.tree_map(lambda a, b: a + b, x, y)


def _zeros_like(x):
    return jax.tree_util.tree_map(jnp.zeros_like, x)


def _identity(x):
    return x


# ---------------------------------------------------------------- CG
def cg(A, b, x0, tol, max_iter: int, M: Optional[Callable] = None, reduction=None):
    """Preconditioned conjugate gradients. `tol` is absolute on ||r||;
    `reduction` optionally adds a relative criterion (deal.II
    ReductionControl)."""
    M = M or _identity
    # x0=None: zero initial guess WITHOUT applying A to a constant zero
    # (XLA would constant-fold the whole operator chain through it — the
    # multi-minute 3D compile pathology)
    if x0 is None:
        x0 = _zeros_like(b)
        r = b
    else:
        r = _sub(b, A(x0))
    z = M(r)
    p = z
    rz = _dot(r, z)
    res0 = _norm(r)
    tol_eff = jnp.maximum(tol, (reduction * res0) if reduction is not None else tol)

    def cond(state):
        _, _, _, _, res, k = state
        return (res > tol_eff) & (k < max_iter)

    def body(state):
        x, r, p, rz, _, k = state
        Ap = A(p)
        alpha = rz / _dot(p, Ap)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Ap, r)
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = _axpy(beta, p, z)
        return (x, r, p, rz_new, _norm(r), k + 1)

    x, r, p, rz, res, k = lax.while_loop(
        cond, body, (x0, r, p, rz, res0, jnp.int32(0))
    )
    return SolverResult(x, k, res, res <= tol_eff)


# ---------------------------------------------------------------- BiCGStab
def bicgstab(A, b, x0, tol, max_iter: int, M: Optional[Callable] = None):
    """Preconditioned BiCGStab (right preconditioning), with the inexpensive
    residual estimate (the reference's exact_residual=false setting,
    level_set_okz_advance_concentration.cc:623-644)."""
    M = M or _identity
    if x0 is None:  # see cg: avoid folding A through a constant zero
        x0 = _zeros_like(b)
        r = b
    else:
        r = _sub(b, A(x0))
    r0 = r
    res0 = _norm(r)

    def cond(state):
        _, _, _, _, _, _, _, res, k, breakdown = state
        return (res > tol) & (k < max_iter) & (~breakdown)

    def body(state):
        x, r, p, v, rho, omega, alpha, _, k, _ = state
        rho_new = _dot(r0, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = _axpy(beta, _axpy(-omega, v, p), r)
        y = M(p)
        v = A(y)
        r0v = _dot(r0, v)
        alpha = rho_new / r0v
        s = _axpy(-alpha, v, r)
        z = M(s)
        t = A(z)
        tt = _dot(t, t)
        omega_new = _dot(t, s) / tt
        x = _axpy(alpha, y, _axpy(omega_new, z, x))
        r = _axpy(-omega_new, t, s)
        res = _norm(r)
        breakdown = (
            jnp.isnan(res)
            | (jnp.abs(rho_new) < 1e-300)
            | (jnp.abs(r0v) < 1e-300)
            | (jnp.abs(tt) < 1e-300)
        )
        return (x, r, p, v, rho_new, omega_new, alpha, res, k + 1, breakdown)

    one = jnp.float64(1.0)
    init = (
        x0,
        r,
        _zeros_like(b),
        _zeros_like(b),
        one,
        one,
        one,
        res0,
        jnp.int32(0),
        jnp.bool_(False),
    )
    x, r, p, v, rho, omega, alpha, res, k, breakdown = lax.while_loop(
        cond, body, init
    )
    return SolverResult(x, k, res, res <= tol)


# ---------------------------------------------------------------- GMRES
def _basis_zeros(template, rows: int):
    """Per-leaf Krylov basis storage: each leaf gets a (rows,)+leaf.shape
    array. NOT a flattened (rows, n) matrix — concatenating sharded leaves
    into one vector interleaves their shards, and GSPMD then inserts
    field-sized all-gather/all-to-all resharding inside every Arnoldi
    iteration. Leaf-shaped storage keeps every basis operation in the
    leaf's own sharding (dots lower to one all-reduce)."""
    return jax.tree_util.tree_map(
        lambda l: jnp.zeros((rows,) + l.shape, l.dtype), template
    )


def _basis_set(V, j, w):
    return jax.tree_util.tree_map(
        lambda Vl, wl: lax.dynamic_update_index_in_dim(Vl, wl, j, 0), V, w
    )


def _basis_get(V, j):
    return jax.tree_util.tree_map(
        lambda Vl: lax.dynamic_index_in_dim(Vl, j, 0, keepdims=False), V
    )


def _basis_dots(V, w):
    """(rows,) vector of <V[i], w> — multi-dim dot_general per leaf (no
    reshape: see _basis_zeros)."""

    def leaf(Vl, wl):
        nc = wl.ndim
        return lax.dot_general(
            Vl,
            wl,
            dimension_numbers=(
                (tuple(range(1, nc + 1)), tuple(range(nc))),
                ((), ()),
            ),
        )

    leaves_V = jax.tree_util.tree_leaves(V)
    leaves_w = jax.tree_util.tree_leaves(w)
    return sum(leaf(Vl, wl) for Vl, wl in zip(leaves_V, leaves_w))


def _basis_comb(coef, V):
    """sum_i coef[i] * V[i] as a leaf-shaped pytree."""

    def leaf(Vl):
        return lax.dot_general(
            coef, Vl, dimension_numbers=(((0,), (0,)), ((), ()))
        )

    return jax.tree_util.tree_map(leaf, V)


def _gmres_impl(
    A, b, x0, tol, max_iter: int, restart: int, M, flexible: bool
):
    """Right-preconditioned GMRES(m)/FGMRES(m) with modified Gram-Schmidt and
    Givens rotations; basis stored per pytree leaf (sharding-preserving)."""
    M = M or _identity
    leaves = jax.tree_util.tree_leaves(b)
    dtype = leaves[0].dtype
    m = restart

    def restart_cycle(x, k_done):
        r = _sub(b, A(x))
        beta = _norm(r)

        V = _basis_zeros(b, m + 1)
        Z = _basis_zeros(b, m) if flexible else None
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        inv_beta = jnp.where(beta > 0, 1.0 / jnp.maximum(beta, 1e-300), 1.0)
        V = _basis_set(V, 0, _scale(inv_beta, r))

        def arnoldi_cond(st):
            j, V, Z, H, cs, sn, g, res = st
            return (j < m) & (res > tol) & (k_done + j < max_iter)

        def arnoldi_body(st):
            j, V, Z, H, cs, sn, g, _ = st
            z = M(_basis_get(V, j))
            if flexible:
                Z = _basis_set(Z, j, z)
            w = A(z)
            # modified Gram-Schmidt against all basis vectors (masked)
            hcol = _basis_dots(V, w)  # (m+1,)
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            hcol = hcol * mask
            w = _sub(w, _basis_comb(hcol, V))
            hnorm = _norm(w)
            H = H.at[:, j].set(hcol)
            H = H.at[j + 1, j].set(hnorm)
            V = _basis_set(
                V, j + 1, _scale(1.0 / jnp.maximum(hnorm, 1e-300), w)
            )

            # apply existing Givens rotations to the new column
            def apply_rot(i, col):
                hi = cs[i] * col[i] + sn[i] * col[i + 1]
                hi1 = -sn[i] * col[i] + cs[i] * col[i + 1]
                col = col.at[i].set(hi)
                return col.at[i + 1].set(hi1)

            col = H[:, j]
            col = lax.fori_loop(0, j, apply_rot, col)
            denom = jnp.sqrt(col[j] ** 2 + col[j + 1] ** 2)
            c = col[j] / jnp.maximum(denom, 1e-300)
            s = col[j + 1] / jnp.maximum(denom, 1e-300)
            col = col.at[j].set(denom).at[j + 1].set(0.0)
            H = H.at[:, j].set(col)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            gj = g[j]
            g = g.at[j].set(c * gj)
            g = g.at[j + 1].set(-s * gj)
            res = jnp.abs(g[j + 1])
            return (j + 1, V, Z, H, cs, sn, g, res)

        j, V, Z, H, cs, sn, g, res = lax.while_loop(
            arnoldi_cond,
            arnoldi_body,
            (jnp.int32(0), V, Z, H, cs, sn, g, beta),
        )

        # back-substitution on the j x j system (masked to static size m)
        def back_sub(i_rev, y):
            i = j - 1 - i_rev
            num = g[i] - H[i] @ y
            hii = H[i, i]
            # guard exact-breakdown zeros (Krylov space exhausted)
            hii = jnp.where(jnp.abs(hii) > 1e-300, hii, 1e-300)
            yi = jnp.where(i >= 0, num / hii, 0.0)
            return jnp.where(jnp.arange(m) == i, yi, y)

        y = lax.fori_loop(0, j, back_sub, jnp.zeros(m, dtype))
        if flexible:
            dx = _basis_comb(y, Z)
        else:
            Vm = jax.tree_util.tree_map(lambda Vl: Vl[:m], V)
            dx = M(_basis_comb(y, Vm))
        return _add(x, dx), k_done + j, res

    def outer_cond(st):
        x, k, res = st
        return (res > tol) & (k < max_iter)

    def outer_body(st):
        x, k, _ = st
        return restart_cycle(x, k)

    if x0 is None:
        x0 = _zeros_like(b)
        r0 = _norm(b)
    else:
        r0 = _norm(_sub(b, A(x0)))
    x, k, res = lax.while_loop(
        outer_cond, outer_body, (x0, jnp.int32(0), r0)
    )
    return SolverResult(x, k, res, res <= tol)


def gmres(A, b, x0, tol, max_iter: int, restart: int = 50, M=None):
    return _gmres_impl(A, b, x0, tol, max_iter, restart, M, flexible=False)


def fgmres(A, b, x0, tol, max_iter: int, restart: int = 50, M=None):
    """Flexible GMRES: the preconditioner may change between iterations
    (inner solves), as in the reference's strong solver path."""
    return _gmres_impl(A, b, x0, tol, max_iter, restart, M, flexible=True)
