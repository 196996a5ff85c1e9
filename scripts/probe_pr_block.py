"""Sweep the parity-resident kernel block size on-chip.

Usage: python scripts/probe_pr_block.py [cells=48] [reps=200]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["ADAFLO_TPU_NO_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from adaflo_tpu.fe.constraints import Constraints
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.ops.navier_stokes import Linearized, NavierStokesOperator
    from adaflo_tpu.ops.pallas_matvec import (
        coupled_vmult_pr, pr_params, qdofs_t,
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
    tables = op._pallas_tables
    rows_table = op._pr_rows_table()
    EA = op.lat_u.n_anchors
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

    for block in (1024, 1536, 2048, 2560, 3072, 3584, 4096):
        b, EA_pad, win, L_need = pr_params(rows_table, EA, block)
        R_pad = -(-x0.shape[0] // 8) * 8
        xin = jnp.pad(x0, ((0, R_pad - x0.shape[0]),
                           (0, max(0, L_need - x0.shape[1]))))
        qtp = jnp.pad(qt, ((0, 0), (0, EA_pad - qt.shape[-1])))

        @jax.jit
        def chained(x, qt, _b=b):
            def body(i, x):
                r = coupled_vmult_pr(
                    x, qt, tables, scalars, rows_table, EA, mask, _b
                )
                r = jnp.pad(r, ((0, 0), (0, x.shape[1] - r.shape[1])))
                s = 1.0 / jnp.maximum(jnp.sqrt(jnp.mean(r * r)), 1e-30)
                return r * s

            return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

        try:
            float(chained(xin, qtp))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(xin, qtp))
                best = min(best, time.perf_counter() - t0)
            print(f"block={b:5d} {best/reps*1e3:.4f} ms/apply", flush=True)
        except Exception as ex:
            print(f"block={b:5d} {type(ex).__name__}", flush=True)


if __name__ == "__main__":
    main()
