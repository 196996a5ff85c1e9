"""Pallas TPU kernels for the hot cell-local operations.

The XLA einsum path materializes every intermediate q-point field
(values/gradients/stress, each (E, 3, 3, n_q)) in HBM; this fused kernel
keeps the whole cell-local Navier-Stokes velocity application — evaluate,
q-point terms, integrate — in VMEM, reading only the cell dofs and the
frozen linearization dofs and writing only the result. Cells are the lane
dimension (the VectorizedArray analog), blocked in chunks.

Currently: Q2 / 3D / Newton / constant-coefficient velocity-block apply (the
dominant kernel of the coupled solve). The general einsum path remains the
reference implementation and the fallback for every other configuration.

STATUS (round 1 measurement, v5e, f32, 110k cells): this direct port of the
einsum structure compiles under Mosaic and matches the XLA path to 2e-16,
but runs 10x SLOWER (55.6 ms vs 5.8 ms per apply at block=256; larger blocks
exhaust compile) — Mosaic lowers the rank-5 tiny-axis contractions with
per-step relayouts. It is therefore NOT wired into the solver; the XLA
einsum path is the production kernel. A layout-conscious rewrite (2D
(K, lanes) refs with explicit small-matrix dots, slab-DMA'd lattice input)
is the round-2 follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vel_kernel(rho_w, tau1_rho, beta, mut, tgd,
                V_ref, D_ref, invh_ref, jxw_ref, u_ref, lin_ref, out_ref):
    """One block of cells: u_ref/lin_ref (3, n_loc, B) -> out_ref.

    Lattice local ordering (z, y, x); all small-axis contractions unrolled
    with cells (B) on the lanes.
    """
    V = V_ref[:]
    D = D_ref[:]
    inv_h = invh_ref[:]
    jxw = jxw_ref[:]
    Vt = V.T
    Dt = D.T
    n1 = V.shape[1]
    nq = V.shape[0]
    B = u_ref.shape[-1]
    u = u_ref[:].reshape(3, n1, n1, n1, B)
    us = lin_ref[:].reshape(3, n1, n1, n1, B)

    def contract(Mz, My, Mx, x):
        x = jnp.einsum("ak,cijkB->cijaB", Mx, x)
        x = jnp.einsum("aj,cijkB->ciakB", My, x)
        x = jnp.einsum("ai,cijkB->cajkB", Mz, x)
        return x

    def eval_all(x):
        val = contract(V, V, V, x).reshape(3, nq**3, B)
        gx = (contract(V, V, D, x) * inv_h[0]).reshape(3, nq**3, B)
        gy = (contract(V, D, V, x) * inv_h[1]).reshape(3, nq**3, B)
        gz = (contract(D, V, V, x) * inv_h[2]).reshape(3, nq**3, B)
        return val, (gx, gy, gz)

    val_u, g_u = eval_all(u)
    val_s, g_s = eval_all(us)
    div = g_u[0][0] + g_u[1][1] + g_u[2][2]
    div_s = g_s[0][0] + g_s[1][1] + g_s[2][2]

    # Newton convective linearization (navier_stokes_matrix.cc:802-826):
    # conv_c = rho*w*du_c + rho*tau1*( beta(div du) u*_c + beta(div u*) du_c
    #          + sum_e [u*_e d_e du_c + du_e d_e u*_c] )
    conv = []
    for c in range(3):
        res = beta * (div * val_s[c] + div_s * val_u[c])
        for e in range(3):
            res = res + val_s[e] * g_u[e][c] + val_u[e] * g_s[e][c]
        conv.append(rho_w * val_u[c] + tau1_rho * res)

    # viscous stress + grad-div: (comp c, deriv d)
    stress = [[None] * 3 for _ in range(3)]
    for c in range(3):
        for d in range(3):
            if c == d:
                stress[c][d] = 2.0 * mut * g_u[c][c] + tgd * div
            else:
                stress[c][d] = mut * (g_u[d][c] + g_u[c][d])

    def integ(valq, gq):
        x = (valq * jxw).reshape(3, nq, nq, nq, B)
        out = contract(Vt, Vt, Vt, x)
        for a, g in enumerate(gq):
            y = (g * jxw * inv_h[a]).reshape(3, nq, nq, nq, B)
            mats = [Vt, Vt, Vt]
            mats[2 - a] = Dt
            out = out + contract(mats[0], mats[1], mats[2], y)
        return out.reshape(3, n1**3, B)

    conv_arr = jnp.stack(conv)
    gx = jnp.stack([stress[c][0] for c in range(3)])
    gy = jnp.stack([stress[c][1] for c in range(3)])
    gz = jnp.stack([stress[c][2] for c in range(3)])
    out_ref[:] = integ(conv_arr, [gx, gy, gz])


def velocity_apply_q2_newton(
    uc, lin_dofs, V, D, inv_h, jxw,
    rho_w: float, tau1_rho: float, beta: float, mut: float, tgd: float,
    block: int = 512, interpret: bool = False,
):
    """Fused velocity-block cell apply for Q2/3D/Newton, constant rho/mu.

    uc, lin_dofs: (E, 3, 27) cell dofs (direction du and the frozen
    linearization point u*); returns (E, 3, 27)."""
    E = uc.shape[0]
    dtype = uc.dtype
    E_pad = -(-E // block) * block
    if E_pad != E:
        pad = ((0, E_pad - E), (0, 0), (0, 0))
        uc = jnp.pad(uc, pad)
        lin_dofs = jnp.pad(lin_dofs, pad)
    u_t = jnp.transpose(uc, (1, 2, 0))
    l_t = jnp.transpose(lin_dofs, (1, 2, 0))

    Vj = jnp.asarray(V, dtype)
    Dj = jnp.asarray(D, dtype)
    nq = V.shape[0]
    nq3 = nq**3
    kernel = functools.partial(_vel_kernel, rho_w, tau1_rho, beta, mut, tgd)
    n1 = V.shape[1]
    rep = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(E_pad // block,),
        in_specs=[
            rep(nq, n1),
            rep(nq, n1),
            rep(3),
            rep(1, nq3, 1),
            pl.BlockSpec((3, 27, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 27, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 27, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 27, E_pad), dtype),
        interpret=interpret,
    )(
        Vj,
        Dj,
        jnp.asarray(inv_h, dtype),
        jnp.asarray(jxw, dtype).reshape(1, nq3, 1),
        u_t,
        l_t,
    )
    return jnp.transpose(out, (2, 0, 1))[:E]
