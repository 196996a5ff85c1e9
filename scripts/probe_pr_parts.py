"""Ablation probe of the parity-resident kernel: where do the 0.39 ms go?

Variants (each a stripped copy of _kernel_pr):
  full     = production kernel
  datapath = slab DMA gather + row slices + mask + overlap-add scatter only
             (out = gathered x; no MXU/VPU work)
  mdot     = datapath + out = M89 @ x (one (89,89) dot; no conv rows/stream)
  evdots   = datapath + r = Ae@x and s = Aev@su (the two big dots + su
             stream; out = x so no scatter change)
  conv     = full minus the final dots (out = n rows only, via copy)

Interpretation: full - evdots ~ cost of (M,Ai dots + VPU rows);
evdots - datapath ~ cost of the big dots + su stream; datapath = the
irreducible resident data path.

Usage: python scripts/probe_pr_parts.py [cells=48] [reps=200]
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


def make_kernel_rowdma(g, dim, rows_table, win, block, parts):
    """Gather via per-row HBM->VMEM DMAs (double-buffered x blocks): no
    VMEM shift copies at all; the DMA engines move each needed (1, block)
    row directly from the packed HBM vector with the offset folded into
    the source address. HBM re-reads rows shared between local dofs
    (~1.7x the slab traffic) but frees the VPU of 89 strided copies."""
    from adaflo_tpu.ops.pallas_matvec import _block_core

    n_cols = len(rows_table)

    def kernel(
        beta_ref, Ae_ref, Aev_ref, M_ref, Ai_ref, mask_ref, subs_hbm,
        su_ref, out_ref, xbuf, n_ref, acc_ref, sem,
    ):
        i = pl.program_id(0)
        nblk = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

        def copies(blk, s):
            return [
                pltpu.make_async_copy(
                    subs_hbm.at[srow, pl.ds(blk * block + off, block)],
                    xbuf.at[s, k],
                    sem.at[s],
                )
                for k, (srow, off) in enumerate(rows_table)
            ]

        @pl.when(i == 0)
        def _first():
            for c in copies(i, slot):
                c.start()
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(i + 1 < nblk)
        def _prefetch():
            for c in copies(i + 1, 1 - slot):
                c.start()

        for c in copies(i, slot):
            c.wait()
        beta = beta_ref[0]
        x = xbuf[slot]
        pt = dict(preferred_element_type=x.dtype,
                  precision=jax.lax.Precision.DEFAULT)
        y_ref = n_ref  # reuse scratch? no: separate below
        r = jnp.dot(Ae_ref[:], x, **pt)
        s = jnp.dot(Aev_ref[:], su_ref[:], **pt)
        # full compute into a VMEM scratch y (xbuf slot is needed intact
        # for the prefetch pattern, so use acc's spare? keep simple: write
        # into xbuf[slot] is safe — its DMAs for i+1 target 1-slot)
        _block_core(g, dim, False, beta, x, r, s, M_ref, Ai_ref,
                    n_ref, xbuf.at[slot])
        y = xbuf[slot] * mask_ref[:]
        for k, (srow, off) in enumerate(rows_table):
            acc_ref[srow, off : off + block] += y[k, :]
        out_ref[:] = acc_ref[:, :block]
        carry = acc_ref[:, block:win]
        acc_ref[:, : win - block] = carry
        acc_ref[:, win - block :] = jnp.zeros_like(
            acc_ref[:, win - block :]
        )

    return kernel


def make_kernel_pipe(g, dim, rows_table, win, block, parts):
    """Software-pipelined assembly: the 89 (1, block) gather copies for
    block i+1 (VPU) are issued while the MXU crunches block i's dots —
    cross-step double buffering of the assembled x block. The copies and
    the dots have no data dependence, so the scheduler can overlap them."""
    from adaflo_tpu.ops.pallas_matvec import _block_core

    def kernel(
        beta_ref, Ae_ref, Aev_ref, M_ref, Ai_ref, mask_ref, subs_hbm,
        su_ref, out_ref, slab, xbuf, n_ref, acc_ref, sem,
    ):
        i = pl.program_id(0)
        nblk = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))
        nslot = 1 - slot

        def copy_in(blk):
            s = jax.lax.rem(blk, jnp.asarray(2, blk.dtype))
            return pltpu.make_async_copy(
                subs_hbm.at[:, pl.ds(blk * block, win)], slab.at[s],
                sem.at[s],
            )

        def assemble(sl_slot, x_slot):
            for k, (srow, off) in enumerate(rows_table):
                xbuf[x_slot, k, :] = slab[sl_slot, srow, off : off + block]

        @pl.when(i == 0)
        def _boot():
            copy_in(i).start()
            copy_in(i).wait()
            assemble(slot, slot)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(i + 1 < nblk)
        def _start_next():
            copy_in(i + jnp.asarray(1, i.dtype)).start()

        # MXU dots on the CURRENT block (assembled last step / at boot)
        beta = beta_ref[0]
        x = xbuf[slot]
        pt = dict(preferred_element_type=x.dtype,
                  precision=jax.lax.Precision.DEFAULT)
        r = jnp.dot(Ae_ref[:], x, **pt)
        s = jnp.dot(Aev_ref[:], su_ref[:], **pt)

        # assemble NEXT block's x while the MXU works (no dependence)
        @pl.when(i + 1 < nblk)
        def _assemble_next():
            copy_in(i + jnp.asarray(1, i.dtype)).wait()
            assemble(nslot, nslot)

        _block_core(g, dim, False, beta, x, r, s, M_ref, Ai_ref,
                    n_ref, xbuf.at[slot])
        y = xbuf[slot] * mask_ref[:]
        for k, (srow, off) in enumerate(rows_table):
            acc_ref[srow, off : off + block] += y[k, :]
        out_ref[:] = acc_ref[:, :block]
        carry = acc_ref[:, block:win]
        acc_ref[:, : win - block] = carry
        acc_ref[:, win - block :] = jnp.zeros_like(
            acc_ref[:, win - block :]
        )

    return kernel




def make_kernel_unroll2(g, dim, rows_table, win, block, parts):
    """Two blocks per grid step, phases interleaved so the scheduler can
    overlap block B's gather copies (VPU) with block A's dots (MXU):
    separate x/n buffers per sub-block = independent refs = visible ILP."""
    from adaflo_tpu.ops.pallas_matvec import _block_core

    n_cols = len(rows_table)

    def kernel(
        beta_ref, Ae_ref, Aev_ref, M_ref, Ai_ref, mask_ref, subs_hbm,
        su_ref, out_ref, slab, xA, xB, nA, nB, acc_ref, sem,
    ):
        i = pl.program_id(0)
        nblk = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

        def copy_in(blk, s):
            return pltpu.make_async_copy(
                subs_hbm.at[:, pl.ds(blk * (2 * block), 2 * block + (win - block))],
                slab.at[s], sem.at[s]
            )

        @pl.when(i == 0)
        def _first():
            copy_in(i, slot).start()
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(i + 1 < nblk)
        def _prefetch():
            copy_in(i + 1, 1 - slot).start()

        copy_in(i, slot).wait()
        # phase 1: gather A then B (independent buffers)
        for k, (srow, off) in enumerate(rows_table):
            xA[k, :] = slab[slot, srow, off : off + block]
        for k, (srow, off) in enumerate(rows_table):
            xB[k, :] = slab[slot, srow, block + off : block + off + block]
        beta = beta_ref[0]
        pt = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
        a = xA[:]
        b = xB[:]
        rA = jnp.dot(Ae_ref[:], a, **pt)
        rB = jnp.dot(Ae_ref[:], b, **pt)
        s1 = jnp.dot(Aev_ref[:], su_ref[:, 0:block], **pt)
        s2 = jnp.dot(Aev_ref[:], su_ref[:, block : 2 * block], **pt)
        _block_core(g, dim, False, beta, a, rA, s1, M_ref, Ai_ref, nA, xA)
        _block_core(g, dim, False, beta, b, rB, s2, M_ref, Ai_ref, nB, xB)
        xA[:] = xA[:] * mask_ref[:, 0:block]
        xB[:] = xB[:] * mask_ref[:, block : 2 * block]
        for k, (srow, off) in enumerate(rows_table):
            acc_ref[srow, off : off + block] += xA[k, :]
        out_ref[:, 0:block] = acc_ref[:, :block]
        acc_ref[:, : win - block] = acc_ref[:, block:win]
        acc_ref[:, win - block :] = jnp.zeros_like(acc_ref[:, win - block :])
        for k, (srow, off) in enumerate(rows_table):
            acc_ref[srow, off : off + block] += xB[k, :]
        out_ref[:, block : 2 * block] = acc_ref[:, :block]
        acc_ref[:, : win - block] = acc_ref[:, block:win]
        acc_ref[:, win - block :] = jnp.zeros_like(acc_ref[:, win - block :])

    return kernel


def make_kernel(g, dim, rows_table, win, block, parts):
    from adaflo_tpu.ops.pallas_matvec import _block_core

    def kernel(
        beta_ref, Ae_ref, Aev_ref, M_ref, Ai_ref, mask_ref, subs_hbm,
        su_ref, out_ref, slab, x_ref, n_ref, acc_ref, sem,
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
        if parts == "noshift":
            for k, (srow, off) in enumerate(rows_table):
                x_ref[k, :] = slab[slot, srow, 0:block]
        else:
            for k, (srow, off) in enumerate(rows_table):
                x_ref[k, :] = slab[slot, srow, off : off + block]
        beta = beta_ref[0]
        x = x_ref[:]
        pt = dict(preferred_element_type=x.dtype,
                  precision=jax.lax.Precision.DEFAULT)
        if parts == "noscatter":
            x_ref[:] = x_ref[:] * mask_ref[:]
            out_ref[:] = x_ref[: out_ref.shape[0], :]
            return
        if parts in ("datapath", "noshift"):
            pass  # out = x, straight through
        elif parts == "mdot":
            x_ref[:] = jnp.dot(M_ref[:], x, **pt)
        elif parts == "evdots":
            r = jnp.dot(Ae_ref[:], x, **pt)
            s = jnp.dot(Aev_ref[:], su_ref[:], **pt)
            # consume r/s cheaply so they are not DCE'd
            x_ref[:] = x + r[: x.shape[0]] * s[: x.shape[0], :1]
        else:  # full
            r = jnp.dot(Ae_ref[:], x, **pt)
            s = jnp.dot(Aev_ref[:], su_ref[:], **pt)
            _block_core(g, dim, False, beta, x, r, s, M_ref, Ai_ref,
                        n_ref, x_ref)
        x_ref[:] = x_ref[:] * mask_ref[:]
        for k, (srow, off) in enumerate(rows_table):
            acc_ref[srow, off : off + block] += x_ref[k, :]
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

    from adaflo_tpu.fe.constraints import Constraints
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.ops.navier_stokes import (
        Linearized,
        NavierStokesOperator,
        TimeWeights,
    )
    from adaflo_tpu.ops.pallas_matvec import combine_linear, pr_params, qdofs_t
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

    block, EA_pad, win, L_need = pr_params(rows_table, EA)
    R = x0.shape[0]
    R_pad = -(-R // 8) * 8
    dtype = jnp.float32
    g = tables.g
    dim = tables.dim
    n_su = dim * tables.n_u_loc
    n_cols = len(rows_table)
    Ae = jnp.asarray(tables.A_evg, dtype)
    n_rows = Ae.shape[0]
    M89, A_ics, beta = combine_linear(tables, scalars, dtype)
    Aev = jnp.asarray(tables.A_evg[:, :n_su], jnp.bfloat16)

    def run_variant(parts):
        if parts == "unroll2":
            kern = make_kernel_unroll2(
                g, dim, tuple(rows_table), win, block, parts
            )
            scratch = [
                pltpu.VMEM((2, R_pad, 2 * block + (win - block)), dtype),
                pltpu.VMEM((n_cols, block), dtype),
                pltpu.VMEM((n_cols, block), dtype),
                pltpu.VMEM((dim * g, block), dtype),
                pltpu.VMEM((dim * g, block), dtype),
                pltpu.VMEM((R_pad, win), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        elif parts == "rowdma":
            kern = make_kernel_rowdma(
                g, dim, tuple(rows_table), win, block, parts
            )
            scratch = [
                pltpu.VMEM((2, n_cols, block), dtype),
                pltpu.VMEM((dim * g, block), dtype),
                pltpu.VMEM((R_pad, win), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        elif parts == "pipe":
            kern = make_kernel_pipe(
                g, dim, tuple(rows_table), win, block, parts
            )
            nc_pad = -(-n_cols // 8) * 8
            scratch = [
                pltpu.VMEM((2, R_pad, win), dtype),
                pltpu.VMEM((2, nc_pad, block), dtype),
                pltpu.VMEM((dim * g, block), dtype),
                pltpu.VMEM((R_pad, win), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            kern = make_kernel(g, dim, tuple(rows_table), win, block, parts)
            scratch = [
                pltpu.VMEM((2, R_pad, win), dtype),
                pltpu.VMEM((n_cols, block), dtype),
                pltpu.VMEM((dim * g, block), dtype),
                pltpu.VMEM((R_pad, win), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        rep2 = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        bmul = 2 if parts == "unroll2" else 1
        nc_k = -(-n_cols // 8) * 8 if parts == "pipe" else n_cols
        Ae_k = jnp.pad(Ae, ((0, 0), (0, nc_k - n_cols)))
        M_k = jnp.pad(M89, ((0, nc_k - n_cols), (0, nc_k - n_cols)))
        Ai_k = jnp.pad(A_ics, ((0, nc_k - n_cols), (0, 0)))
        call = pl.pallas_call(
            kern,
            grid=(EA_pad // (bmul * block),),
            in_specs=[
                pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
                rep2((n_rows, nc_k)),
                rep2((n_rows, n_su)),
                rep2((nc_k, nc_k)),
                rep2((nc_k, dim * g)),
                pl.BlockSpec((1, bmul * block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((n_su, bmul * block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R_pad, bmul * block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R_pad, EA_pad), dtype),
            scratch_shapes=scratch,
        )

        maskp = jnp.pad(mask.reshape(1, -1), ((0, 0), (0, EA_pad - EA)))
        qtp = jnp.pad(qt.astype(jnp.bfloat16),
                      ((0, 0), (0, EA_pad - qt.shape[-1])))
        xin = jnp.pad(x0, ((0, R_pad - x0.shape[0]),
                           (0, max(0, L_need - x0.shape[1]))))

        @jax.jit
        def chained(x, qt):
            def body(i, x):
                r = call(beta[None], Ae_k, Aev, M_k, Ai_k, maskp, x, qt)
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
        print(f"{parts:9s} {ms:.4f} ms/apply", flush=True)
        return ms

    import sys as _sys
    variants = (_sys.argv[3].split(",") if len(_sys.argv) > 3
                else ["datapath", "noshift", "mdot", "evdots", "full"])
    for parts in variants:
        try:
            run_variant(parts)
        except Exception as ex:
            print(f"{parts}: {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main()
