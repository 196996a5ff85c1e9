"""Sum-factorized stencil kernel feasibility probes (round-5 VERDICT #1).

The dense per-cell pr kernel sits at ~22% of achievable HBM BW; its own
ablations (probe_pr_parts) blame the 89-row expansion (gather copies +
scatter adds) and MXU small-matmul passes. The prescribed fix is a
sum-factorized stencil formulation on the packed parity layout: 1D
contractions along lanes + shifted-row combinations, no 89-row expansion.
Whether that wins hinges on the VPU FMA rate for row-block operations vs
the MXU dense rate — measured here on the real chip.

Probes (all compute-resident: grid steps re-run the same VMEM block, so
HBM traffic ~0 and the timing isolates compute):

  vpu      K chained 3-term row-block FMAs on (24, B) aligned blocks —
           the shape class of every sum-factorization stage op.
  vpushift same, one operand lane-shifted (slice of a (24, B+128) window)
  copies   the production gather: 89 single-row shifted copies (the
           datapath cost the stencil form eliminates)
  mxu      r = Ae @ x (384x89 dense eval dot alone, pre-assembled x)
  sfeval   realistic 3-stage sum-factorized eval of 3 velocity components
           (value + 3 gradients at 27 q points) from the 32-row parity
           slab, grouped rows, windowed shifts — the stencil kernel's
           eval phase
  sfint    the transpose (integration) phase: 324 q rows -> shifted
           overlap-adds into the 32-row parity accumulator

Usage: python scripts/probe_sf.py [block=4096] [nblk=29] [reps=50]
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

SX = 49          # anchor-raster x stride (48^3 cells)
SY = 49 * 49     # y... (z stride in flat raster; names per axis order z,y,x)
# NOTE flat offsets: x-neighbor +1, y-neighbor +49, z-neighbor +2401


def timed(call, x, reps):
    @jax.jit
    def chained(x):
        def body(i, x):
            r = call(x)
            s = 1.0 / jnp.maximum(jnp.sqrt(jnp.mean(r * r)), 1e-30)
            return r * s
        return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

    float(chained(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def slope(f, lo, hi):
    """Marginal cost: run probe at two work levels, return (dt_hi - dt_lo)
    / (hi - lo) — cancels fixed per-grid-step overheads (block refetch,
    out writeback, launch)."""
    t_lo = f(lo)
    t_hi = f(hi)
    return (t_hi - t_lo) / (hi - lo), t_lo, t_hi


def run_vpu(block, nblk, reps, shifted=False, rows=24, terms=3, n_ops=72):
    """n_ops FMA statements, each: out_block = a*A + b*B + c*C on
    (rows, block) row-blocks; operands are static row slices of a
    (96, win) VMEM buffer (aligned offsets), optionally lane-shifted."""
    win = block + 128

    def kernel(x_ref, o_ref):
        acc = None
        for k in range(n_ops):
            r0 = (k * rows) % 64
            sh = (1 + (k % 3)) if shifted else 0
            a = x_ref[r0 : r0 + rows, sh : sh + block]
            b = x_ref[r0 + 8 : r0 + 8 + rows, 0:block]
            c = x_ref[r0 + 16 : r0 + 16 + rows, 0:block]
            v = 0.31 * a + 0.47 * b + 0.22 * c
            acc = v if acc is None else acc + v
        o_ref[:, :] = acc

    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((96, win), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, block), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, block), jnp.float32),
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (96, win), jnp.float32)

    def wrap(x):
        o = call(x)
        return x + 1e-30 * jnp.pad(o, ((0, 96 - rows), (0, win - block)))

    dt = timed(wrap, x, reps)
    return dt


def run_copies(block, nblk, reps, n_rows=89):
    """The production gather: single-row lane-shifted copies."""
    win = block + 2560
    # realistic rows_table offsets for 48^3
    offs = [dz * SY + dy * SX + dx
            for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    table = []
    for c in range(3):
        for s in range(8):
            for o in offs:
                if len(table) < (c + 1) * 27 + c * 0:
                    pass
    # 27 rows per component: parity sub s in 0..7 with offset per loc
    table = []
    for c in range(3):
        for loc in range(27):
            z, r = divmod(loc, 9)
            y, x = divmod(r, 3)
            sub = 4 * (z % 2) + 2 * (y % 2) + (x % 2)
            off = (z // 2) * SY + (y // 2) * SX + (x // 2)
            table.append((c * 8 + sub, off))
    for loc in range(8):
        z, r = divmod(loc, 4)
        y, x = divmod(r, 2)
        table.append((24, z * SY + y * SX + x))
    table = table[:n_rows]

    def kernel(x_ref, o_ref):
        for k, (srow, off) in enumerate(table):
            o_ref[k, :] = x_ref[srow, off : off + block]

    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((32, win), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((len(table), block), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((len(table), block), jnp.float32),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (32, win), jnp.float32)

    def wrap(x):
        o = call(x)
        return x + 1e-30 * jnp.pad(
            o[:32], ((0, 32 - min(32, o.shape[0])), (0, win - block))
        )

    dt = timed(wrap, x, reps)
    return dt


def run_mxu(block, nblk, reps, m=384, k=96, bf16=False):
    """r = Ae @ x alone (dense eval dot)."""
    def kernel(a_ref, x_ref, o_ref):
        a = a_ref[:]
        x = x_ref[:]
        if bf16:
            a = a.astype(jnp.bfloat16)
            x = x.astype(jnp.bfloat16)
        o_ref[:, :] = jax.lax.dot_general(
            a, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, block), jnp.float32),
    )
    A = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (k, block), jnp.float32)

    def wrap(x):
        o = call(A, x)
        return x + 1e-30 * o[:k]

    dt = timed(wrap, x, reps)
    return dt


def _sf_eval_body(x_ref, zbuf, ybuf, rbuf, block, w1, w2,
                  Vz, Dz, Vy, Dy, Vx, Dx):
    """Shared 3-stage eval: 32-row parity slab -> 324 q rows.

    Row layouts (all groups 8-aligned by construction):
      slab:  c*8 + (4*pz + 2*py + px)   c in 0..2, row 24 = p (unused here)
      zbuf:  (qz*2 + kind) * 24 + c*8 + 4*... -> we use blocks of 24:
             group (qz, kind) -> rows [(qz*2+kind)*24 : +24] over (c,py,px)
             BUT py,px live at stride 4/2 inside the 8-row c block, with the
             pz bit gone: rows c*8 + 4*0 + 2*py + px... to keep 8-alignment
             we keep the c*8 sub-structure and leave the pz=1 half unused.
      ybuf:  (qz*3 + qy) indexes 9 xy-planes; per plane 3 kinds x 24 rows
             (val, dz, dy) -> plane stride 72... grouped as
             (qz*3+qy)*(3*24): rows [(plane)*72 + kind*24 + c*8 + px]
      rbuf:  (qz*9 + qy*3 + qx) * ... final: 4 kinds x 3 comps per q:
             laid out kind-major: kind*(27*? ) ... see code.
    """
    # ---- stage z: contract pz (shift SY... flat z stride) ----------------
    # out rows per (qz, kind): 24-row block (c,py,px with pz slot zeroed)
    for qz in range(3):
        for kind in range(2):  # 0 = val (Vz), 1 = dz (Dz)
            C = Vz if kind == 0 else Dz
            dst = (qz * 2 + kind) * 24
            for c in range(3):
                a = x_ref[c * 8 + 0 : c * 8 + 4, 0:w1]        # pz=0
                b = x_ref[c * 8 + 4 : c * 8 + 8, 0:w1]        # pz=1
                a2 = x_ref[c * 8 + 0 : c * 8 + 4, SY : SY + w1]  # pz=0,+z
                zbuf[dst + c * 8 : dst + c * 8 + 4, :] = (
                    C[0] * a + C[1] * b + C[2] * a2
                )

    # ---- stage y: contract py (shift SX) --------------------------------
    # zbuf rows: (qz,kind)*24 + c*8 + 2*py + px (py in sublane bits)
    # need py-pairs: rows +0/+1 (py=0: px 0,1) vs +2/+3 (py=1)
    # -> slice 2-row groups... to keep slices >=4 rows use the (4,w) c-block
    # and combine via per-row masks? Simpler: treat py via two 2-row slices.
    for qz in range(3):
        for qy in range(3):
            plane = (qz * 3 + qy) * 72
            for kind_in, kinds_out in ((0, (0, 1)), (1, (2,))):
                # kind_in 0 = val -> out val (Vy) and dy (Dy)
                # kind_in 1 = dz  -> out dz (Vy)
                src = (qz * 2 + kind_in) * 24
                for ko_i, ko in enumerate(kinds_out):
                    C = Dy if (kind_in == 0 and ko == 1) else Vy
                    dst = plane + ko * 24
                    for c in range(3):
                        a = zbuf[src + c * 8 + 0 : src + c * 8 + 2, 0:w2]
                        b = zbuf[src + c * 8 + 2 : src + c * 8 + 4, 0:w2]
                        a2 = zbuf[src + c * 8 + 0 : src + c * 8 + 2,
                                  SX : SX + w2]
                        ybuf[dst + c * 8 : dst + c * 8 + 2, :] = (
                            C[0] * a + C[1] * b + C[2] * a2
                        )

    # ---- stage x: contract px (shift 1) ---------------------------------
    # ybuf rows: plane*72 + kind*24 + c*8 + px (px in {0,1})
    # out rbuf: q = qz*9+qy*3+qx; layout kind-major blocks of 96 q-rows...
    # rows: kind*(32*3)? final layout: kind*96 + c*32 + q  (q<27, 32-pad)
    for qz in range(3):
        for qy in range(3):
            plane = (qz * 3 + qy) * 72
            for qx in range(3):
                q = qz * 9 + qy * 3 + qx
                for kind_in, kinds_out in ((0, (0, 1)), (1, (2,)), (2, (3,))):
                    src = plane + kind_in * 24
                    for ko in kinds_out:
                        C = Dx if (kind_in == 0 and ko == 1) else Vx
                        for c in range(3):
                            a = ybuf[src + c * 8 + 0 : src + c * 8 + 1,
                                     0:block]
                            b = ybuf[src + c * 8 + 1 : src + c * 8 + 2,
                                     0:block]
                            a2 = ybuf[src + c * 8 + 0 : src + c * 8 + 1,
                                      1 : 1 + block]
                            rbuf[ko * 96 + c * 32 + q, :] = (
                                C[0] * a[0] + C[1] * b[0] + C[2] * a2[0]
                            )
    return


def run_sfeval(block, nblk, reps):
    """Realistic grouped-row 3-stage eval (structure only; coefficients
    arbitrary). Counts: stage-z 18 FMA-ops on (4,w1) x3c, stage-y 27 ops x
    (2,w2) x3c... the real cost driver is op count x rows."""
    win = block + 2560
    w1 = block + 64      # covers later +SX and +1 shifts
    w2 = block + 8
    Vz = (0.3, 0.5, 0.2)
    Dz = (-1.0, 0.0, 1.0)

    def kernel(x_ref, o_ref, zbuf, ybuf, rbuf):
        _sf_eval_body(x_ref, zbuf, ybuf, rbuf, block, w1, w2,
                      Vz, Dz, Vz, Dz, Vz, Dz)
        o_ref[:, :] = rbuf[0:32, :]

    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((32, win), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, block), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, block), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((6 * 24, block + 64), jnp.float32),
            pltpu.VMEM((9 * 72, block + 8), jnp.float32),
            pltpu.VMEM((384, block), jnp.float32),
        ],
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (32, win), jnp.float32)

    def wrap(x):
        o = call(x)
        return x + 1e-30 * jnp.pad(o, ((0, 0), (0, win - block)))

    dt = timed(wrap, x, reps)
    # row-FMA count: z: 18 ops x (4r x 3c) = 216; y: 27 x (2 x 3) = 162?
    rfma = 18 * 12 + 27 * 6 * 1.5 + 36 * 27  # approximate
    print(f"sfeval: {dt*1e3:.4f} ms/apply", flush=True)


def main():
    block = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    nblk = int(sys.argv[2]) if len(sys.argv) > 2 else 29
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    print(f"block={block} nblk={nblk} reps={reps} "
          f"(per-'apply' = {nblk} grid steps)", flush=True)
    print("devices:", jax.devices(), flush=True)

    def report_vpu(name, shifted):
        m, tlo, thi = slope(
            lambda n: run_vpu(block, nblk, reps, shifted=shifted, n_ops=n),
            24, 96)
        macs_per_op = 3 * 24 * block * nblk
        print(f"{name}: slope {m*1e6:.3f} us/op -> "
              f"{macs_per_op/m/1e12:.3f} TMAC/s marginal  "
              f"(t24={tlo*1e3:.4f} t96={thi*1e3:.4f} ms)", flush=True)

    def report_copies():
        m, tlo, thi = slope(
            lambda n: run_copies(block, nblk, reps, n_rows=n), 29, 89)
        print(f"copies: slope {m*1e6:.3f} us/row -> "
              f"89 rows = {m*89*1e3:.4f} ms marginal  "
              f"(t29={tlo*1e3:.4f} t89={thi*1e3:.4f} ms)", flush=True)

    def report_mxu(k, bf16=False):
        m, tlo, thi = slope(
            lambda mm: run_mxu(block, nblk, reps, m=mm, k=k, bf16=bf16),
            96, 384)
        macs_per_mrow = k * block * nblk
        print(f"mxu(k={k}{',bf16' if bf16 else ''}): slope {m*1e6:.3f} "
              f"us/mrow -> {macs_per_mrow/m/1e12:.2f} TMAC/s marginal  "
              f"(m96={tlo*1e3:.4f} m384={thi*1e3:.4f} ms)", flush=True)

    probes = [
        ("vpu", lambda: report_vpu("vpu", False)),
        ("vpu_shift", lambda: report_vpu("vpu_shift", True)),
        ("copies", report_copies),
        ("mxu_k96", lambda: report_mxu(96)),
        ("mxu_k96bf", lambda: report_mxu(96, bf16=True)),
        ("mxu_k32", lambda: report_mxu(32)),
        # sfeval scratch (z/y/r stages) needs the smaller block to fit VMEM
        ("sfeval", lambda: run_sfeval(min(block, 2048), nblk * 2, reps)),
    ]
    for name, fn in probes:
        try:
            fn()
        except Exception as ex:
            print(f"{name}: {type(ex).__name__}: {str(ex)[:200]}", flush=True)


if __name__ == "__main__":
    main()
