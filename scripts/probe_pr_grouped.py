"""Probe: offset-GROUPED parity-resident kernel vs production.

The production _kernel_pr assembles the (89, B) cell block with 89
single-sublane row copies and scatters with 89 single-sublane adds — the
measured bottleneck (probe_pr_parts: data path alone 0.20 of 0.37 ms).
The 89 (srow, off) pairs use only 8 DISTINCT offsets (the 2x2x2 anchor
corners), so the same data motion can be done as 8 copies of the FULL
(R_pad, B) slab slice per offset (multi-sublane, ~3x fewer vreg ops),
with the row selection folded into the stationary matrices:

  X_cat (8*R_pad, B) = stacked slab[:, o:o+B] per offset o
  x = G @ X_cat           G (89, 8*R_pad) 0/1 selection   (never formed)
  r = (Ae G) @ X_cat      gather fold into the eval matrix
  y = (M89 G) @ X_cat + A_ics @ n
  Y_cat = S @ (y * mask)  S (8*R_pad, 89) 0/1 scatter fold
  acc[:, o:o+B] += Y_cat[g_o]  per offset (multi-sublane adds)

MXU passes rise ~60% (k=89 -> k=256 class dots) but the VPU data path
drops ~3x; this probe measures whether the trade wins on-chip.

Usage: python scripts/probe_pr_grouped.py [cells=48] [reps=200] [block]
"""

import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["ADAFLO_TPU_NO_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel_grouped(g, dim, offsets, win, block, R_pad, bf16_conv):
    """Offset-grouped variant of _kernel_pr (see module docstring)."""

    def kernel(
        beta_ref, AeG_ref, Aev_ref, MG_ref, Ai_ref, S_ref, mask_ref,
        subs_hbm, su_ref, out_ref, slab, xcat_ref, n_ref, y_ref, acc_ref,
        sem,
    ):
        i = pl.program_id(0)
        nblk = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

        def copy_in(blk, s):
            return pltpu.make_async_copy(
                subs_hbm.at[:, pl.ds(blk * block, win)], slab.at[s], sem.at[s]
            )

        @pl.when(i == 0)
        def _first():
            copy_in(i, slot).start()
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(i + 1 < nblk)
        def _prefetch():
            copy_in(i + 1, 1 - slot).start()

        copy_in(i, slot).wait()
        # gather: 8 multi-sublane slab slices instead of 89 row copies
        for gi, o in enumerate(offsets):
            xcat_ref[gi * R_pad : (gi + 1) * R_pad, :] = slab[
                slot, :, o : o + block
            ]
        beta = beta_ref[0]
        X = xcat_ref[:]
        pt = dict(preferred_element_type=jnp.float32)
        AeG = AeG_ref[:]
        Xe = X
        if bf16_conv:
            AeG = AeG.astype(jnp.bfloat16)
            Xe = X.astype(jnp.bfloat16)
        r = jnp.dot(AeG, Xe, **pt)  # (n_rows, B)
        s = jnp.dot(Aev_ref[:], su_ref[:], **pt)

        # convective Newton rows (the _block_core VPU part)
        parts = dim + 1

        def rows(blockv, part, c):
            i0 = (c * parts + part) * g
            return blockv[i0 : i0 + g]

        val_u = [rows(r, 0, c) for c in range(dim)]
        g_u = [[rows(r, 1 + d, c) for d in range(dim)] for c in range(dim)]
        val_s = [rows(s, 0, c) for c in range(dim)]
        g_s = [[rows(s, 1 + d, c) for d in range(dim)] for c in range(dim)]
        div = g_u[0][0]
        div_s = g_s[0][0]
        for a in range(1, dim):
            div = div + g_u[a][a]
            div_s = div_s + g_s[a][a]
        for c in range(dim):
            res = beta * (div * val_s[c] + div_s * val_u[c])
            for e in range(dim):
                res = res + val_s[e] * g_u[c][e] + val_u[e] * g_s[c][e]
            n_ref[c * g : (c + 1) * g] = res

        nn = n_ref[:]
        Ai = Ai_ref[:]
        if bf16_conv:
            nn = nn.astype(jnp.bfloat16)
            Ai = Ai.astype(jnp.bfloat16)
        # y = (M89 G) @ X_cat + A_ics @ n, masked per column
        y_ref[:] = (
            jnp.dot(MG_ref[:], X, **pt) + jnp.dot(Ai, nn, **pt)
        ) * mask_ref[:]
        # scatter fold + 8 multi-sublane overlap-adds
        Y = jnp.dot(S_ref[:], y_ref[:], **pt)  # (8*R_pad, B)
        for gi, o in enumerate(offsets):
            acc_ref[:, o : o + block] += Y[gi * R_pad : (gi + 1) * R_pad, :]
        out_ref[:] = acc_ref[:, :block]
        carry = acc_ref[:, block:win]
        acc_ref[:, : win - block] = carry
        acc_ref[:, win - block :] = jnp.zeros_like(
            acc_ref[:, win - block :]
        )

    return kernel


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    block_arg = int(sys.argv[3]) if len(sys.argv) > 3 else None

    from adaflo_tpu.fe.constraints import Constraints
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.ops.navier_stokes import (
        Linearized,
        NavierStokesOperator,
    )
    from adaflo_tpu.ops.pallas_matvec import (
        combine_linear,
        coupled_vmult_pr,
        pr_params,
        qdofs_t,
    )
    from adaflo_tpu.parameters import FlowParameters

    par = FlowParameters.from_string(
        "subsection Navier-Stokes\n  set dimension = 3\n"
        "  set velocity degree = 2\nend\n"
    )
    os.environ["ADAFLO_PALLAS_MATVEC"] = "1"
    mesh = StructuredMesh((cells,) * 3, (0.0,) * 3, (1.0,) * 3)
    us, ps = ScalarSpace(mesh, 2), ScalarSpace(mesh, 1)
    cu = []
    for _ in range(3):
        c = Constraints(us.n_dofs)
        c.close()
        cu.append(c)
    cp = Constraints(ps.n_dofs)
    cp.close()
    op = NavierStokesOperator(par, us, ps, cu, cp, dtype=jnp.float32)
    n_dofs = 3 * us.n_dofs + ps.n_dofs
    tables = op._pallas_tables
    rows_table = op._pr_rows_table()
    EA = op.lat_u.n_anchors
    print(f"cells={cells}^3 n_dofs={n_dofs} EA={EA}", flush=True)

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (3, us.n_dofs_padded), jnp.float32)
    p = jax.random.normal(key, (ps.n_dofs_padded,), jnp.float32)
    ld = op._gather_u(u, resolve=False)
    lv = op.ev_u.values(ld)
    lg = op.ev_u.gradients(ld)
    lin = Linearized(lv, lg, jnp.trace(lg, axis1=1, axis2=2), ld)
    qt = op.lat_u.cells_to_anchors(qdofs_t(lin))
    x0 = op.pr_pack(u, p)
    mask = op.lat_u.anchor_mask_dev(jnp.float32)
    scalars = (jnp.float32(30.0), jnp.float32(1.0), jnp.float32(1.0),
               jnp.float32(0.05), jnp.float32(0.0))

    block, EA_pad, win, L_need = pr_params(rows_table, EA, block_arg)
    R = x0.shape[0]
    R_pad = -(-R // 8) * 8
    dtype = jnp.float32
    g = tables.g
    dim = tables.dim
    n_su = dim * tables.n_u_loc
    n_cols = len(rows_table)
    Ae = np.asarray(tables.A_evg, np.float32)
    n_rows = Ae.shape[0]
    M89, A_ics, beta = combine_linear(tables, scalars, dtype)
    M89 = np.asarray(M89, np.float32)
    Aev = jnp.asarray(tables.A_evg[:, :n_su], jnp.bfloat16)

    # ---- grouped static matrices ----
    offsets = sorted({off for _, off in rows_table})
    oidx = {o: gi for gi, o in enumerate(offsets)}
    K = len(offsets) * R_pad
    G = np.zeros((n_cols, K), np.float32)
    for k, (srow, off) in enumerate(rows_table):
        G[k, oidx[off] * R_pad + srow] = 1.0
    AeG = jnp.asarray(Ae @ G)              # (n_rows, K)
    MG = jnp.asarray(M89 @ G)              # (n_cols, K)
    S = jnp.asarray(G.T.copy())            # (K, n_cols) scatter fold
    print(f"offsets={len(offsets)} K={K} block={block} win={win}",
          flush=True)

    rep2 = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    def build_call(bf16_conv):
        kern = make_kernel_grouped(
            g, dim, tuple(offsets), win, block, R_pad, bf16_conv
        )
        return pl.pallas_call(
            kern,
            grid=(EA_pad // block,),
            in_specs=[
                pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
                rep2((n_rows, K)),
                rep2((n_rows, n_su)),
                rep2((n_cols, K)),
                rep2((n_cols, dim * g)),
                rep2((K, n_cols)),
                pl.BlockSpec((1, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((n_su, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R_pad, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R_pad, EA_pad), dtype),
            scratch_shapes=[
                pltpu.VMEM((2, R_pad, win), dtype),
                pltpu.VMEM((K, block), dtype),
                pltpu.VMEM((dim * g, block), dtype),
                pltpu.VMEM((n_cols, block), dtype),
                pltpu.VMEM((R_pad, win), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

    maskp = jnp.pad(mask.reshape(1, -1), ((0, 0), (0, EA_pad - EA)))
    qtp = jnp.pad(qt.astype(jnp.bfloat16),
                  ((0, 0), (0, EA_pad - qt.shape[-1])))
    xin = jnp.pad(x0, ((0, R_pad - x0.shape[0]),
                       (0, max(0, L_need - x0.shape[1]))))

    def timed(call_args_fn, label):
        @jax.jit
        def chained(x, qt):
            def body(i, x):
                r = call_args_fn(x, qt)
                r = jnp.pad(r, ((0, 0), (0, x.shape[1] - r.shape[1])))
                s = 1.0 / jnp.maximum(jnp.sqrt(jnp.mean(r * r)), 1e-30)
                return r * s

            return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

        float(chained(xin, qtp))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(xin, qtp))
            best = min(best, time.perf_counter() - t0)
        ms = best / reps * 1e3
        print(f"{label:12s} {ms:.4f} ms/apply", flush=True)
        return ms

    # production reference
    timed(
        lambda x, qt: coupled_vmult_pr(
            x, qt, tables, scalars, rows_table, EA, mask, block
        ),
        "production",
    )

    # correctness of the grouped kernel vs production (one apply)
    call_g = build_call(False)
    ref = coupled_vmult_pr(x0, qt, tables, scalars, rows_table, EA, mask,
                           block)
    got = call_g(beta[None], AeG, Aev, MG,
                 jnp.asarray(A_ics, dtype), S, maskp, xin, qtp)
    n_cmp = min(ref.shape[1], got.shape[1])
    err = float(jnp.max(jnp.abs(ref[:, :n_cmp] - got[:, :n_cmp])))
    den = float(jnp.max(jnp.abs(ref))) or 1.0
    print(f"grouped rel err vs production: {err/den:.2e}", flush=True)

    timed(
        lambda x, qt: call_g(beta[None], AeG, Aev, MG,
                             jnp.asarray(A_ics, dtype), S, maskp, x, qt),
        "grouped",
    )
    call_gb = build_call(True)
    timed(
        lambda x, qt: call_gb(beta[None], AeG, Aev, MG,
                              jnp.asarray(A_ics, dtype), S, maskp, x, qt),
        "grouped+bf16",
    )


if __name__ == "__main__":
    main()
