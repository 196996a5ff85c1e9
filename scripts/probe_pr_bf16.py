"""Probe: MXU precision variants of the parity-resident coupled apply.

The r03 probes showed the pr apply is MXU-small-matmul-bound (~38
TF-equivalent sustained) with f32_default dots (~79 TF measured = ~bf16_3x
passes on v5e). The convective Newton rows already run at bf16 precision in
one factor (the streamed linearization is bf16 by design), so the dots that
only feed/integrate those rows can drop to pure-bf16 single-pass without
changing the accuracy class of the operator:

  r  = Ae @ x     -> bf16 (feeds the convective VPU rows only)
  s  = Aev @ su   -> bf16 (su is already bf16)
  out += A_ic @ n -> bf16 (n = convective rows)
  out  = M89 @ x  -> stays f32_default (stiff viscous/pressure terms)

This script times the current kernel vs the bf16-convective variant on the
real chip and reports ms/apply + implied effective HBM BW, plus the
max relative deviation vs the f64 einsum on CPU is checked separately in
tests (interpret mode).

Usage: python scripts/probe_pr_bf16.py [cells=48] [reps=200]
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
    from adaflo_tpu.ops.navier_stokes import (
        Linearized,
        NavierStokesOperator,
        TimeWeights,
    )
    from adaflo_tpu.ops.pallas_matvec import qdofs_t
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
    print(f"cells={cells}^3 n_dofs={n_dofs}", flush=True)

    tw = TimeWeights(*(jnp.float32(v) for v in (30.0, -30.0, 0.0, 1.0)))
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (3, us.n_dofs_padded), jnp.float32)
    p = jax.random.normal(key, (ps.n_dofs_padded,), jnp.float32)
    ld = op._gather_u(u, resolve=False)
    lv = op.ev_u.values(ld)
    lg = op.ev_u.gradients(ld)
    lin = Linearized(lv, lg, jnp.trace(lg, axis1=1, axis2=2), ld)
    qt = op.lat_u.cells_to_anchors(qdofs_t(lin))

    x0 = op.pr_pack(u, p)

    def bench_mode(mode):
        os.environ["ADAFLO_PALLAS_PR_BF16"] = mode

        @jax.jit
        def chained(x, qt):
            # the stream rides as a jit ARGUMENT (closure capture embeds
            # ~100MB of literal MLIR at large sizes, see STATUS r3 notes)
            lin_arg = Linearized(None, jnp.zeros((1, 1, 1, 1)), None, None, qt)

            def body(i, x):
                r = op.vmult_pr(x, tw, lin_arg)
                s = 1.0 / jnp.maximum(jnp.sqrt(jnp.mean(r * r)), 1e-30)
                return r * s

            x = jax.lax.fori_loop(0, reps, body, x)
            return jnp.sum(x)

        float(chained(x0, qt))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x0, qt))
            best = min(best, time.perf_counter() - t0)
        ms = best / reps * 1e3
        print(
            f"mode={mode!r:14s} {ms:.4f} ms/apply  "
            f"{n_dofs / (ms * 1e-3) / 1e9:.2f} GDoF/s",
            flush=True,
        )
        return ms

    for mode in ["", "conv", "all"]:
        try:
            bench_mode(mode)
        except Exception as ex:
            print(f"mode={mode!r}: {type(ex).__name__}: {ex}", flush=True)
    os.environ.pop("ADAFLO_PALLAS_PR_BF16", None)


if __name__ == "__main__":
    main()
