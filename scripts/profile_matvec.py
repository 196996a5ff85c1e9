"""Per-stage breakdown of the coupled Pallas mat-vec on the real TPU.

Times each stage of NavierStokesOperator.vmult's fast path separately with
the chained-reps + scalar-readback methodology (docs/STATUS.md perf notes:
~40 ms fixed dispatch overhead through this host's tunnel, so every number
comes from >=200 reps chained inside one jit).
"""

import os
import time

os.environ.setdefault("ADAFLO_BENCH", "1")
os.environ["ADAFLO_TPU_NO_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.navier_stokes import (
    Linearized,
    NavierStokesOperator,
    TimeWeights,
)
from adaflo_tpu.ops.pallas_matvec import (
    coupled_vmult_cells,
    qdofs_t,
    qfields_t,
)
from adaflo_tpu.parameters import FlowParameters

REPS = int(os.environ.get("REPS", "200"))
CELLS = int(os.environ.get("CELLS", "48"))


def timed(name, fn, *args):
    """fn must map carry -> carry of same structure; returns best seconds/rep."""

    @jax.jit
    def chained(c):
        def body(i, cc):
            out = fn(cc)
            return out

        out = jax.lax.fori_loop(0, REPS, body, c)
        return jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x), out)
        )

    float(chained(args[0] if len(args) == 1 else args))
    best = min(
        _t(lambda: float(chained(args[0] if len(args) == 1 else args)))
        for _ in range(3)
    )
    per = best / REPS * 1e3
    print(f"{name:34s} {per:8.4f} ms")
    return per


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    print("devices:", jax.devices(), flush=True)
    par = FlowParameters.from_string(
        """
subsection Navier-Stokes
  set dimension = 3
  set velocity degree = 2
end
"""
    )
    mesh = StructuredMesh((CELLS,) * 3, (0.0,) * 3, (1.0,) * 3)
    u_space = ScalarSpace(mesh, 2)
    p_space = ScalarSpace(mesh, 1)
    cu = []
    for _ in range(3):
        c = Constraints(u_space.n_dofs)
        c.close()
        cu.append(c)
    cp = Constraints(p_space.n_dofs)
    cp.close()
    dtype = jnp.float32
    op = NavierStokesOperator(par, u_space, p_space, cu, cp, dtype=dtype)
    n_dofs = 3 * u_space.n_dofs + p_space.n_dofs
    print(f"n_dofs={n_dofs}  E={mesh.n_cells}  reps={REPS}")

    tw = TimeWeights(*(jnp.asarray(v, dtype) for v in (30.0, -30.0, 0.0, 1.0)))
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (3, u_space.n_dofs), dtype)
    p = jax.random.normal(key, (p_space.n_dofs,), dtype)
    lin_dofs = op._gather_u(u, resolve=False)
    lin_val = op.ev_u.values(lin_dofs)
    lin_grad = op.ev_u.gradients(lin_dofs)
    lin = Linearized(
        lin_val, lin_grad, jnp.trace(lin_grad, axis1=1, axis2=2), lin_dofs
    )
    lin = lin._replace(qt=qfields_t(lin))

    scalars = (
        tw.weight * par.density - par.damping,
        tw.tau1 * par.density,
        par.beta_convective_term_momentum_balance,
        tw.tau1 * par.viscosity,
        par.tau_grad_div,
    )

    # full vmult
    def full(c):
        uu, pp = c
        ru, rp = op.vmult(uu, pp, tw, lin)
        s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(ru * ru)), 1e-30)
        return (ru * s, rp * s)

    t_full = timed("full vmult qfields (incl norm)", full, (u, p))

    lin_d = lin._replace(qt=qdofs_t(lin))

    def full_d(c):
        uu, pp = c
        ru, rp = op.vmult(uu, pp, tw, lin_d)
        s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(ru * ru)), 1e-30)
        return (ru * s, rp * s)

    t_full_d = timed("full vmult dofs (incl norm)", full_d, (u, p))

    # gather only: (3 u comps + p) -> (89, E); carry a scalar back into u to
    # keep the loop non-foldable
    def gather_only(c):
        uu, pp = c
        x_t = jnp.concatenate(
            [op.lat_u.gather_t(uu[cc]) for cc in range(3)]
            + [op.lat_p.gather_t(pp)],
            axis=0,
        )
        s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(x_t[0] * x_t[0])), 1e-30)
        return (uu * s, pp * s)

    t_gather = timed("gather_t x4 + concat", gather_only, (u, p))

    x_t0 = jnp.concatenate(
        [op.lat_u.gather_t(u[c]) for c in range(3)] + [op.lat_p.gather_t(p)],
        axis=0,
    )
    s_t = lin.qt

    # kernel only — both stream modes
    def kernel_only(x_t):
        out = coupled_vmult_cells(x_t, s_t, op._pallas_tables, scalars)
        s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(out[0] * out[0])), 1e-30)
        return x_t * s

    t_kernel = timed("pallas kernel (qfields stream)", kernel_only, x_t0)

    su_t = qdofs_t(lin)

    def kernel_su(x_t):
        out = coupled_vmult_cells(x_t, su_t, op._pallas_tables, scalars)
        s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(out[0] * out[0])), 1e-30)
        return x_t * s

    t_kernel_su = timed("pallas kernel (dof stream)", kernel_su, x_t0)

    # scatter only
    nl = op.u_space.n_local
    out0 = coupled_vmult_cells(x_t0, s_t, op._pallas_tables, scalars)

    def scatter_only(out):
        ru = jnp.stack(
            [
                op.lat_u.scatter_add_t(out[c * nl : (c + 1) * nl])
                for c in range(3)
            ]
        )
        rp = op.lat_p.scatter_add_t(out[3 * nl :])
        s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(ru[0] * ru[0]) + jnp.sum(rp)), 1e-30)
        return out * s

    t_scatter = timed("scatter_add_t x4", scatter_only, out0)

    # norm/rescale only (the bench-loop bookkeeping)
    def norm_only(c):
        uu, pp = c
        s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(uu * uu)), 1e-30)
        return (uu * s, pp * s)

    t_norm = timed("norm+rescale bookkeeping", norm_only, (u, p))

    print(
        f"\nsum of stages = {t_gather + t_kernel + t_scatter + t_norm:.4f} ms"
        f" vs full {t_full:.4f} ms"
    )
    gd = n_dofs / (t_full * 1e-3) / 1e9
    print(f"full-path throughput {gd:.3f} GDoF/s")


if __name__ == "__main__":
    main()
