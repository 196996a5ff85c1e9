"""Probe: the parity-RESIDENT fused apply (vmult_pr) on the real chip.

Times the packed-vector coupled mat-vec (subs in -> subs out, gather AND
scatter inside the kernel) across block sizes, next to the production 't'
apply for reference.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_pr_resident.py
"""

import os
import time

os.environ.setdefault("ADAFLO_BENCH", "1")
os.environ["ADAFLO_TPU_NO_X64"] = "1"
os.environ.setdefault("ADAFLO_PALLAS_MATVEC", "1")

import jax
import jax.numpy as jnp

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.navier_stokes import (
    Linearized,
    NavierStokesOperator,
    TimeWeights,
)
from adaflo_tpu.parameters import FlowParameters

REPS = int(os.environ.get("REPS", "100"))
CELLS = int(os.environ.get("CELLS", "48"))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    print("device:", jax.devices()[0], flush=True)
    par = FlowParameters.from_string(
        """
subsection Navier-Stokes
  set dimension = 3
  set velocity degree = 2
end
"""
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
    n_dofs = 3 * us.n_dofs + ps.n_dofs
    tw = TimeWeights(*(jnp.float32(v) for v in (30.0, -30.0, 0.0, 1.0)))
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (3, us.n_dofs), jnp.float32)
    p = jax.random.normal(key, (ps.n_dofs,), jnp.float32)
    ld = op._gather_u(u, resolve=False)
    lv = op.ev_u.values(ld)
    lg = op.ev_u.gradients(ld)
    lin = Linearized(lv, lg, jnp.trace(lg, axis1=1, axis2=2), ld)
    from adaflo_tpu.ops.pallas_matvec import qdofs_t

    qt = op.lat_u.cells_to_anchors(qdofs_t(lin))
    lin = lin._replace(qt=qt)

    x0 = jax.jit(lambda uu, pp: op.pr_pack(uu, pp))(u, p)
    print("packed vector:", x0.shape, f"{x0.size * 4 / 1e6:.1f} MB", flush=True)

    for blk in (1024, 2048, 4096, 8192):
        os.environ["ADAFLO_PALLAS_PR_BLOCK"] = str(blk)
        # pr_params reads the env at trace time; the resident length changes
        # with block, so re-pack
        xb = jax.jit(lambda uu, pp: op.pr_pack(uu, pp))(u, p)

        @jax.jit
        def chained(x):
            def body(i, xx):
                r = op.vmult_pr(xx, tw, lin)
                s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(r * r)), 1e-30)
                return r * s

            return jnp.sum(jax.lax.fori_loop(0, REPS, body, x))

        try:
            float(chained(xb))
        except Exception as ex:
            print(f"pr block={blk}: {type(ex).__name__}: {str(ex)[:160]}")
            continue
        dt = min(_t(lambda: float(chained(xb))) for _ in range(3))
        per = dt / REPS * 1e3
        print(
            f"pr block={blk:5d}  {per:8.4f} ms  "
            f"{n_dofs / (dt / REPS) / 1e9:6.2f} GDoF/s",
            flush=True,
        )

    # reference: production 't' apply (gather_t/scatter_add_t around kernel)
    os.environ["ADAFLO_PALLAS_LAYOUT"] = "t"
    from adaflo_tpu.ops.pallas_matvec import stream_t

    lin_t = lin._replace(qt=stream_t(lin))

    @jax.jit
    def chained_t(uu, pp):
        def body(i, carry):
            ru, rp = op.vmult(carry[0], carry[1], tw, lin_t)
            s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(ru * ru)), 1e-30)
            return (ru * s, rp * s)

        ru, rp = jax.lax.fori_loop(0, REPS, body, (uu, pp))
        return jnp.sum(ru) + jnp.sum(rp)

    float(chained_t(u, p))
    dt = min(_t(lambda: float(chained_t(u, p))) for _ in range(3))
    print(f"t  (production)  {dt / REPS * 1e3:8.4f} ms", flush=True)


if __name__ == "__main__":
    main()
