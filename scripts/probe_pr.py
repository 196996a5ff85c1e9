"""Probe: isolate the Pallas kernel costs of the mat-vec layout candidates.

The round-2 bench measured full applies (pack + kernel + unpack); this
separates them so the parity-resident design can be costed before building:

  k_t   't' kernel alone on a pre-gathered (89, E) block
  k_pi  'pi' kernel alone on pre-packed parity subs (in-kernel DMA gather,
        still writes the expanded (89, EA) block to HBM)
  asm   in-kernel gather ONLY: DMA slab + 89 shifted row-slices + trivial
        store (prices the row assembly without the MXU work)
  scat  prototype in-kernel ring-accumulator scatter: (89, EA) in HBM ->
        (32, EA) parity subs via per-row shifted VMEM adds

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_pr.py
"""

import functools
import os
import time

os.environ.setdefault("ADAFLO_BENCH", "1")
os.environ["ADAFLO_TPU_NO_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.lattice import LatticeOps
from adaflo_tpu.ops import pallas_matvec as pm

REPS = int(os.environ.get("REPS", "100"))
CELLS = int(os.environ.get("CELLS", "48"))
BLOCK = int(os.environ.get("ADAFLO_PALLAS_BLOCK", "1024"))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def timed(name, fn, *args, bytes_moved=None):
    @jax.jit
    def chained(*a):
        def body(i, aa):
            out = fn(*aa)
            lead = out[0] if isinstance(out, tuple) else out
            s = 1.0 / jnp.maximum(jnp.sqrt(jnp.mean(lead**2)), 1e-30)
            return tuple((x * s).astype(x.dtype) for x in aa)

        out = jax.lax.fori_loop(0, REPS, body, args)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in out)

    float(chained(*args))
    best = min(_t(lambda: float(chained(*args))) for _ in range(3))
    per = best / REPS * 1e3
    bw = f"  {bytes_moved / (best / REPS) / 1e9:7.1f} GB/s" if bytes_moved else ""
    print(f"{name:40s} {per:8.4f} ms{bw}", flush=True)
    return per


def scatter_ring_kernel(rows_table, win, block, y_ref, acc_ref, sem):
    """Prototype: consume a (89, B) block (here read from HBM via blockspec
    y_ref) and overlap-add rows into the parity accumulator; emit the
    completed first `block` columns each step via the out_specs window."""
    # acc layout: (32, win); out block b covers anchors [bB, bB+B)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    y = y_ref[:]
    for k, (srow, off) in enumerate(rows_table):
        acc_ref[srow, off : off + block] += y[k]


def main():
    print("device:", jax.devices()[0], flush=True)
    mesh = StructuredMesh((CELLS,) * 3, (0.0,) * 3, (1.0,) * 3)
    u_sp = ScalarSpace(mesh, 2)
    p_sp = ScalarSpace(mesh, 1)
    lat_u = LatticeOps.for_space(u_sp)
    lat_p = LatticeOps.for_space(p_sp)
    E, EA = lat_u.n_cells, lat_u.n_anchors
    dim = 3
    n_cols = 3 * lat_u.n_loc + lat_p.n_loc

    from adaflo_tpu.ops.tensor import CellEvaluator

    ev_u = CellEvaluator(dim, u_sp.basis, 3, mesh.h, jnp.float32)
    ev_p = CellEvaluator(dim, p_sp.basis, 3, mesh.h, jnp.float32)
    tables = pm.build_tables(ev_u, ev_p, np.float32)
    scalars = tuple(jnp.asarray(v, jnp.float32) for v in (30.0, 1.0, 1.0, 0.01, 0.1))

    key = jax.random.PRNGKey(0)
    x_t = jax.random.normal(key, (n_cols, E), jnp.float32)
    s_t = jax.random.normal(key, (3 * lat_u.n_loc, E), jnp.float32).astype(
        jnp.bfloat16
    )
    s_ta = jax.random.normal(key, (3 * lat_u.n_loc, EA), jnp.float32).astype(
        jnp.bfloat16
    )

    itemsize = 4
    kb = (n_cols * E * 2 + s_t.shape[0] * E * 2) * itemsize // 2 * 2
    kbytes = n_cols * E * 2 * itemsize + s_t.size * 2
    timed(
        "k_t  kernel only, (89,E) in/out",
        lambda x, s: pm.coupled_vmult_cells(x, s, tables, scalars),
        x_t,
        s_t,
        bytes_moved=kbytes,
    )

    # pi kernel alone on pre-packed subs
    rows_table = []
    n_sub_u = 8
    for c in range(3):
        rows_table += [(c * n_sub_u + s, off) for s, off in lat_u._parity_rows()]
    rows_table += [(3 * n_sub_u + s, off) for s, off in lat_p._parity_rows()]
    subs = jax.random.normal(key, (25, EA), jnp.float32)
    pibytes = 25 * EA * itemsize + n_cols * EA * itemsize + s_ta.size * 2
    timed(
        "k_pi kernel only, subs in, (89,EA) out",
        lambda ss, s: pm.coupled_vmult_parity(
            ss, s, tables, scalars, tuple(rows_table), EA
        ),
        subs,
        s_ta,
        bytes_moved=pibytes,
    )

    # prototype ring scatter: (89, EA) -> (32, EA) subs
    EA_pad = -(-EA // BLOCK) * BLOCK
    max_off = max(off for _, off in rows_table)
    win = BLOCK + -(-max_off // 128) * 128
    y89 = jax.random.normal(key, (n_cols, EA_pad), jnp.float32)

    def ring_scatter(y):
        grid = EA_pad // BLOCK
        kern = functools.partial(
            scatter_ring_kernel, tuple(rows_table), win, BLOCK
        )
        # emit acc as the single output, windowed per block: out[:, bB:bB+B]
        # = acc[:, 0:B]... for the probe just keep acc resident and dump it
        # once (scatter cost only; the emit is one more contiguous write)
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(
                    (n_cols, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
                )
            ],
            out_shape=jax.ShapeDtypeStruct((32, win), jnp.float32),
            out_specs=pl.BlockSpec(
                (32, win), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
        )(y)

    sbytes = n_cols * EA * itemsize + 32 * EA * itemsize
    timed("scat ring-accum scatter (89,EA)->subs", ring_scatter, y89, bytes_moved=sbytes)


if __name__ == "__main__":
    main()
