"""Fused Pallas coupled-matvec kernel vs the reference einsum path.

The kernel (ops/pallas_matvec.py) serves the TPU f32 deployment path; here
it runs in interpret mode on CPU in f64 and must agree with the einsum
operator to machine precision.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.navier_stokes import (
    Linearized,
    NavierStokesOperator,
    TimeWeights,
)
from adaflo_tpu.parameters import FlowParameters


def _make_op(dim=3, degree=2):
    par = FlowParameters.from_string(
        f"""
subsection Navier-Stokes
  set dimension = {dim}
  set velocity degree = {degree}
  set viscosity = 0.05
end
"""
    )
    if dim == 3:
        mesh = StructuredMesh((3, 4, 2), (0.0, 0.0, 0.0), (1.0, 1.3, 0.7))
    else:
        mesh = StructuredMesh((4, 3), (0.0, 0.0), (1.0, 1.3))
    us, ps = ScalarSpace(mesh, degree), ScalarSpace(mesh, degree - 1)
    cu = []
    for _ in range(dim):
        c = Constraints(us.n_dofs)
        c.close()
        cu.append(c)
    cp = Constraints(ps.n_dofs)
    cp.close()
    return par, us, ps, cu, cp


@pytest.mark.parametrize("dim,degree", [(3, 2), (2, 2), (3, 3)])
@pytest.mark.parametrize("layout", ["t", "n", "pe", "pi", "pr"])
@pytest.mark.parametrize("stream", ["qfields", "dofs"])
def test_pallas_coupled_vmult_matches_einsum(
    monkeypatch, layout, stream, dim, degree
):
    import jax

    par, us, ps, cu, cp = _make_op(dim, degree)
    monkeypatch.setenv("ADAFLO_PALLAS_LAYOUT", layout)
    monkeypatch.setenv("ADAFLO_PALLAS_STREAM", stream)
    monkeypatch.setenv("ADAFLO_PALLAS_MATVEC", "1")
    op_pl = NavierStokesOperator(par, us, ps, cu, cp)
    assert op_pl._pallas_tables is not None
    monkeypatch.setenv("ADAFLO_PALLAS_MATVEC", "0")
    op_ref = NavierStokesOperator(par, us, ps, cu, cp)
    assert op_ref._pallas_tables is None

    tw = TimeWeights(*(jnp.float64(v) for v in (30.0, -30.0, 0.0, 1.0)))
    key = jax.random.PRNGKey(3)
    u = jax.random.normal(key, (dim, us.n_dofs))
    p = jax.random.normal(key, (ps.n_dofs,))
    ld = op_ref._gather_u(u, resolve=False)
    lv = op_ref.ev_u.values(ld)
    lg = op_ref.ev_u.gradients(ld)
    lin = Linearized(lv, lg, jnp.trace(lg, axis1=1, axis2=2), ld)

    ru1, rp1 = op_pl.vmult(u, p, tw, lin)
    ru2, rp2 = op_ref.vmult(u, p, tw, lin)
    scale = float(jnp.abs(ru2).max())
    assert float(jnp.abs(ru1 - ru2).max()) < 1e-12 * scale
    assert float(jnp.abs(rp1 - rp2).max()) < 1e-12 * scale

    # velocity-block apply rides the same kernel (zero pressure input)
    rv1 = op_pl.velocity_vmult(u, tw, lin)
    rv2 = op_ref.velocity_vmult(u, tw, lin)
    assert float(jnp.abs(rv1 - rv2).max()) < 1e-12 * scale

    # without linearization dofs the fast path must fall back (same result)
    lin_nodofs = Linearized(lv, lg, jnp.trace(lg, axis1=1, axis2=2), None)
    ru3, _ = op_pl.vmult(u, p, tw, lin_nodofs)
    assert float(jnp.abs(ru3 - ru2).max()) < 1e-12 * scale

    # the parity-RESIDENT apply (packed vectors in and out across the
    # whole Krylov solve) must match vmult after unpacking
    if layout == "pr" and stream == "dofs" and op_pl.pr_supported():
        x = op_pl.pr_pack(u, p)
        r = op_pl.vmult_pr(x, tw, lin)
        ru4, rp4 = op_pl.pr_unpack(r)
        assert float(jnp.abs(ru4[:, : us.n_dofs] - ru2[:, : us.n_dofs]).max()) < 1e-12 * scale
        assert float(jnp.abs(rp4[: ps.n_dofs] - rp2[: ps.n_dofs]).max()) < 1e-12 * scale
        # composability: a second resident apply must equal
        # pack(vmult(unpack)) — the padded tail stays consistent
        r2 = op_pl.vmult_pr(r, tw, lin)
        ru5, rp5 = op_pl.pr_unpack(r2)
        ru6, rp6 = op_pl.vmult(ru4, rp4, tw, lin)
        s2 = float(jnp.abs(ru6).max())
        assert float(jnp.abs(ru5[:, : us.n_dofs] - ru6[:, : us.n_dofs]).max()) < 1e-12 * s2
        assert float(jnp.abs(rp5[: ps.n_dofs] - rp6[: ps.n_dofs]).max()) < 1e-12 * s2
