"""Probe: phase breakdown of the parity-resident fused mat-vec kernel.

Runs ablated copies of _kernel_pr (ops/pallas_matvec.py) on the real chip —
each ablation removes ONE phase (gather row copies, eval dot, stream dot,
VPU convective rows, output dots, scatter accumulation) while keeping the
rest — so the deltas attribute the measured ms/apply to kernel phases. This
answers "what do the remaining 2.8 ms at 84^3 buy" with data instead of the
MXU-pass model.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_pr_phases.py
Env: CELLS (default 48), REPS (default 100), BLOCK (default 4096)
"""

import functools
import os
import time

os.environ.setdefault("ADAFLO_BENCH", "1")
os.environ["ADAFLO_TPU_NO_X64"] = "1"
os.environ.setdefault("ADAFLO_PALLAS_MATVEC", "1")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.navier_stokes import (
    Linearized,
    NavierStokesOperator,
    TimeWeights,
)
from adaflo_tpu.ops.pallas_matvec import (
    _block_core,
    combine_linear,
    pr_params,
    qdofs_t,
)
from adaflo_tpu.parameters import FlowParameters

REPS = int(os.environ.get("REPS", "100"))
CELLS = int(os.environ.get("CELLS", "48"))
BLOCK = int(os.environ.get("BLOCK", "4096"))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def _kernel_ablate(
    g,
    dim,
    rows_table,
    win,
    block,
    flags,
    beta_ref,
    Ae_ref,
    Aev_ref,
    M_ref,
    Ai_ref,
    mask_ref,
    subs_hbm,
    su_ref,
    out_ref,
    slab,
    x_ref,
    n_ref,
    acc_ref,
    sem,
):
    """_kernel_pr with phases gated by `flags` (a frozenset of names)."""
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
    if "gather" in flags:
        for k, (srow, off) in enumerate(rows_table):
            x_ref[k, :] = slab[slot, srow, off : off + block]
    else:
        # one representative copy so x is data-dependent on the DMA
        x_ref[:] = jnp.broadcast_to(
            slab[slot, 0:1, 0:block], x_ref.shape
        )
    beta = beta_ref[0]
    x = x_ref[:]
    pt = dict(preferred_element_type=x.dtype)
    if "rdot" in flags:
        r = jnp.dot(Ae_ref[:], x, **pt)
    else:
        r = jnp.zeros((Ae_ref.shape[0], block), x.dtype) + x[0:1, :]
    if "sdot" in flags:
        s = jnp.dot(Aev_ref[:], su_ref[:], **pt)
    else:
        s = r
    if "vpu" in flags and "outdots" in flags:
        _block_core(
            g, dim, False, beta, x, r, s, M_ref, Ai_ref, n_ref, x_ref
        )
    elif "outdots" in flags:
        # M x + Ai n with the convective rows replaced by a copy of r
        n_ref[:] = r[: n_ref.shape[0], :]
        x_ref[:] = jnp.dot(M_ref[:], x, **pt) + jnp.dot(
            Ai_ref[:], n_ref[:], **pt
        )
    else:
        # keep a data dependence on r/s without the output dots
        x_ref[:] = x + r[: x_ref.shape[0], :] + s[: x_ref.shape[0], :]
    x_ref[:] = x_ref[:] * mask_ref[:]
    if "scatter" in flags:
        for k, (srow, off) in enumerate(rows_table):
            acc_ref[srow, off : off + block] += x_ref[k, :]
        out_ref[:] = acc_ref[:, :block]
        carry = acc_ref[:, block:win]
        acc_ref[:, : win - block] = carry
        acc_ref[:, win - block :] = jnp.zeros_like(
            acc_ref[:, win - block :]
        )
    else:
        out_ref[:] = jnp.broadcast_to(
            x_ref[0 : out_ref.shape[0], :block], out_ref.shape
        )


def run_variant(op, tw, lin, x0, name, flags):
    tables = op._pallas_tables
    rows_table = op._pr_rows_table()
    EA = op.lat_u.n_anchors
    mask = op.lat_u.anchor_mask_dev(jnp.float32)
    par = op.parameters
    scalars = (
        tw.weight * par.density - par.damping,
        tw.tau1 * par.density,
        par.beta_convective_term_momentum_balance,
        tw.tau1 * par.viscosity,
        par.tau_grad_div,
    )
    s_t = lin.qt
    dtype = jnp.float32
    n_cols = len(rows_table)
    block, EA_pad, win, L_need = pr_params(rows_table, EA, BLOCK)
    g, dim = tables.g, tables.dim
    n_su = dim * tables.n_u_loc

    def apply_fn(subs, st):
        import numpy as np

        Ae = jnp.asarray(tables.A_evg, dtype)
        n_rows = Ae.shape[0]
        R_pad = subs.shape[0]
        if st.shape[-1] != EA_pad:
            st = jnp.pad(st, ((0, 0), (0, EA_pad - st.shape[-1])))
        m = jnp.asarray(mask, dtype).reshape(1, -1)
        if m.shape[-1] != EA_pad:
            m = jnp.pad(m, ((0, 0), (0, EA_pad - m.shape[-1])))
        M89, A_ics, beta = combine_linear(tables, scalars, dtype)
        rep2 = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        kernel = functools.partial(
            _kernel_ablate, g, dim, tuple(rows_table), win, block, flags
        )
        return pl.pallas_call(
            kernel,
            grid=(EA_pad // block,),
            in_specs=[
                pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
                rep2((n_rows, n_cols)),
                rep2((n_rows, n_su)),
                rep2((n_cols, n_cols)),
                rep2((n_cols, dim * g)),
                pl.BlockSpec(
                    (1, block), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (n_su, block), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (R_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((R_pad, EA_pad), dtype),
            scratch_shapes=[
                pltpu.VMEM((2, R_pad, win), dtype),
                pltpu.VMEM((n_cols, block), dtype),
                pltpu.VMEM((dim * g, block), dtype),
                pltpu.VMEM((R_pad, win), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(
            beta[None],
            Ae,
            jnp.asarray(tables.A_evg[:, :n_su], s_t.dtype),
            M89,
            A_ics,
            m,
            subs,
            st,
        )

    @jax.jit
    def chained(x):
        def body(i, xx):
            r = apply_fn(xx, s_t)
            if r.shape[1] < x.shape[1]:
                r = jnp.pad(r, ((0, 0), (0, x.shape[1] - r.shape[1])))
            sc = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(r * r)), 1e-30)
            return r * sc

        return jnp.sum(jax.lax.fori_loop(0, REPS, body, x))

    try:
        float(chained(x0))
    except Exception as ex:
        print(f"{name:28s} FAILED {type(ex).__name__}: {str(ex)[:120]}")
        return None
    dt = min(_t(lambda: float(chained(x0))) for _ in range(3))
    per = dt / REPS * 1e3
    print(f"{name:28s} {per:8.4f} ms", flush=True)
    return per


def main():
    print("device:", jax.devices()[0], "cells:", CELLS, flush=True)
    par = FlowParameters.from_string(
        "subsection Navier-Stokes\n  set dimension = 3\n"
        "  set velocity degree = 2\nend\n"
    )
    mesh = StructuredMesh((CELLS,) * 3, (0.0,) * 3, (1.0,) * 3)
    us, ps = ScalarSpace(mesh, 2), ScalarSpace(mesh, 1)
    cu = []
    for _ in range(3):
        c = Constraints(us.n_dofs)
        c.close()
        cu.append(c)
    cp = Constraints(ps.n_dofs)
    cp.close()
    op = NavierStokesOperator(par, us, ps, cu, cp, dtype=jnp.float32)
    tw = TimeWeights(*(jnp.float32(v) for v in (30.0, -30.0, 0.0, 1.0)))
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (3, us.n_dofs), jnp.float32)
    p = jax.random.normal(key, (ps.n_dofs,), jnp.float32)
    ld = op._gather_u(u, resolve=False)
    lv = op.ev_u.values(ld)
    lg = op.ev_u.gradients(ld)
    lin = Linearized(lv, lg, jnp.trace(lg, axis1=1, axis2=2), ld)
    lin = lin._replace(qt=op.lat_u.cells_to_anchors(qdofs_t(lin)))
    os.environ["ADAFLO_PALLAS_PR_BLOCK"] = str(BLOCK)
    x0 = jax.jit(lambda uu, pp: op.pr_pack(uu, pp))(u, p)
    print("packed:", x0.shape, f"{x0.size*4/1e6:.1f} MB", flush=True)

    ALL = frozenset(["gather", "rdot", "sdot", "vpu", "outdots", "scatter"])
    results = {}
    results["full"] = run_variant(op, tw, lin, x0, "full", ALL)
    for drop in ["gather", "rdot", "sdot", "vpu", "outdots", "scatter"]:
        results[f"-{drop}"] = run_variant(
            op, tw, lin, x0, f"minus {drop}", ALL - {drop}
        )
    results["dma_only"] = run_variant(
        op, tw, lin, x0, "dma only", frozenset()
    )
    full = results.get("full")
    if full:
        print("\nphase attribution (full - ablated):")
        for k, v in results.items():
            if k.startswith("-") and v is not None:
                print(f"  {k[1:]:10s} {full - v:8.4f} ms")


if __name__ == "__main__":
    main()
