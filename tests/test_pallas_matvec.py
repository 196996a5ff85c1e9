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


def test_pr_pack_preserves_inner_products():
    """The resident Krylov loop runs its dots/norms on packed vectors:
    pack must be an isometry onto the nodal dofs (phantom anchors and
    padding exactly zero)."""
    import jax

    par, us, ps, cu, cp = _make_op(3, 2)
    os.environ["ADAFLO_PALLAS_MATVEC"] = "1"
    try:
        op = NavierStokesOperator(par, us, ps, cu, cp)
    finally:
        del os.environ["ADAFLO_PALLAS_MATVEC"]
    assert op.pr_supported()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u1 = jax.random.normal(k1, (3, us.n_dofs_padded))
    p1 = jax.random.normal(k1, (ps.n_dofs_padded,))
    u2 = jax.random.normal(k2, (3, us.n_dofs_padded))
    p2 = jax.random.normal(k2, (ps.n_dofs_padded,))
    # zero the padding tails (Krylov vectors keep them zero)
    u1 = u1.at[:, us.n_dofs :].set(0.0)
    u2 = u2.at[:, us.n_dofs :].set(0.0)
    p1 = p1.at[ps.n_dofs :].set(0.0)
    p2 = p2.at[ps.n_dofs :].set(0.0)
    x1, x2 = op.pr_pack(u1, p1), op.pr_pack(u2, p2)
    d_nodal = float(jnp.vdot(u1, u2) + jnp.vdot(p1, p2))
    d_packed = float(jnp.vdot(x1, x2))
    assert abs(d_packed - d_nodal) < 1e-12 * abs(d_nodal)
    # round trip is exact
    uu, pp = op.pr_unpack(x1)
    assert float(jnp.abs(uu - u1).max()) == 0.0
    assert float(jnp.abs(pp - p1).max()) == 0.0


@pytest.mark.medium
def test_pr_resident_solver_step_matches_einsum(monkeypatch):
    """A full coupled Newton time step with the parity-RESIDENT Krylov
    solve (production default on eligible TPU meshes; forced on here via
    interpret mode) must reproduce the einsum-path solution to solver
    tolerance."""
    import numpy as np

    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

    def run(pallas: str):
        monkeypatch.setenv("ADAFLO_PALLAS_MATVEC", pallas)
        monkeypatch.setenv("ADAFLO_PALLAS_LAYOUT", "pr")
        par = FlowParameters.from_string(
            """
subsection Time stepping
  set end time = 0.05
  set step size = 0.05
end
subsection Navier-Stokes
  set dimension = 3
  set velocity degree = 2
  set viscosity = 0.05
  subsection Solver
    set NL max iterations = 6
    set NL tolerance = 1.e-10
    set lin max iterations = 200
    set lin tolerance = 1.e-9
  end
end
subsection Output options
  set output verbosity = 0
end
"""
        )
        mesh = StructuredMesh((3, 3, 3), (0.0,) * 3, (1.0,) * 3)
        ns = NavierStokes(par, mesh)
        ns.set_velocity_dirichlet_boundary(
            0,
            lambda x, t: np.stack(
                [-(x[:, 1] - 0.5), x[:, 0] - 0.5, 0.0 * x[:, 2]]
            ),
        )
        ns.fix_pressure_constant(0)
        ns.setup_problem()
        ns.advance_time_step()
        return np.asarray(ns.solution[0]), np.asarray(ns.solution[1])

    u_pr, p_pr = run("1")
    u_ref, p_ref = run("0")
    scale = np.abs(u_ref).max()
    assert np.abs(u_pr - u_ref).max() < 1e-7 * scale
    assert np.abs(p_pr - p_ref).max() < 1e-6 * max(np.abs(p_ref).max(), 1.0)


@pytest.mark.parametrize("dim", [3, 2])
@pytest.mark.parametrize("variant", ["constrained", "varcoeff", "both"])
def test_pr2_constraints_and_variable_coefficients(monkeypatch, variant, dim):
    """Round-5 kernel features: (a) the constraint-identity rows fold into
    the resident kernel as a signed ids stream (gather-side resolve +
    emission-side identity), (b) per-q-point variable rho/mu/damping
    stream through the kernel (the reference's two-phase configuration of
    the hot kernel, navier_stokes_matrix.cc:740-890). Both must match the
    einsum vmult to machine precision."""
    import jax

    par, us, ps, cu, cp = _make_op(dim, 2)
    if variant in ("constrained", "both"):
        # Dirichlet rows on two boundaries + a pressure fix dof
        bdofs = us.boundary_dofs(0)
        cu = []
        for c in range(dim):
            con = Constraints(us.n_dofs)
            con.add_dirichlet(bdofs)
            con.close()
            cu.append(con)
        cp = Constraints(ps.n_dofs)
        cp.add_dirichlet(np.array([0]))
        cp.close()

    monkeypatch.setenv("ADAFLO_PALLAS_LAYOUT", "pr")
    monkeypatch.setenv("ADAFLO_PALLAS_MATVEC", "1")
    op_pl = NavierStokesOperator(par, us, ps, cu, cp)
    monkeypatch.setenv("ADAFLO_PALLAS_MATVEC", "0")
    op_ref = NavierStokesOperator(par, us, ps, cu, cp)

    tw = TimeWeights(*(jnp.float64(v) for v in (30.0, -30.0, 0.0, 1.0)))
    key = jax.random.PRNGKey(5)
    u = jax.random.normal(key, (dim, us.n_dofs))
    p = jax.random.normal(key, (ps.n_dofs,))
    ld = op_ref._gather_u(u, resolve=False)
    lv = op_ref.ev_u.values(ld)
    lg = op_ref.ev_u.gradients(ld)
    lin = Linearized(lv, lg, jnp.trace(lg, axis1=1, axis2=2), ld)

    from adaflo_tpu.ops.navier_stokes import Coefficients

    coeffs = Coefficients()
    if variant in ("varcoeff", "both"):
        E, n_q = us.mesh.n_cells, op_ref.n_q
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
        coeffs = Coefficients(
            rho=1.0 + jax.random.uniform(k1, (E, n_q)),
            mu=0.1 + 0.05 * jax.random.uniform(k2, (E, n_q)),
            damping=0.3 * jax.random.uniform(k3, (E, n_q)),
        )

    ru2, rp2 = op_ref.vmult(u, p, tw, lin, coeffs)

    assert op_pl.pr_active(lin, coeffs)
    x = op_pl.pr_pack(u, p)
    ct, has = op_pl.pr_coeff_stream(coeffs)
    if variant == "constrained":
        assert ct is None
    else:
        # f64 stream for the exactness comparison (deployment uses bf16)
        from adaflo_tpu.ops.pallas_matvec import qcoeff_t

        ct = op_pl.lat_u.cells_to_anchors(
            qcoeff_t(coeffs, op_pl.n_q, op_pl._pallas_tables.g,
                     dtype=jnp.float64)
        )
    r, norm = op_pl.vmult_pr(x, tw, lin, ct=ct, has=has, want_norm=True)
    ru1, rp1 = op_pl.pr_unpack(r)

    scale = float(jnp.abs(ru2).max())
    assert (
        float(jnp.abs(ru1[:, : us.n_dofs] - ru2[:, : us.n_dofs]).max())
        < 1e-12 * scale
    )
    assert (
        float(jnp.abs(rp1[: ps.n_dofs] - rp2[: ps.n_dofs]).max())
        < 1e-12 * scale
    )
    # fused norm matches the packed result's norm
    assert abs(float(norm) - float(jnp.vdot(r, r))) < 1e-10 * max(
        float(jnp.vdot(r, r)), 1.0
    )
    # fused output scale is exact
    r3 = op_pl.vmult_pr(x, tw, lin, ct=ct, has=has, scale=jnp.float64(0.5))
    assert float(jnp.abs(r3 - 0.5 * r).max()) < 1e-13 * scale
