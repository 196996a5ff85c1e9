"""Validation of the matrix-free NS operator.

Two independent checks:
1. For polynomial fields that lie exactly in the FE spaces, the assembled
   weak-form residual contracted with a polynomial test field must equal the
   same integral evaluated directly with numpy at the quadrature points
   (independent of the sum-factorization/gather/scatter machinery).
2. The Newton-linearized vmult must be the exact Frechet derivative of the
   residual assembly (checked with jax.jvp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.navier_stokes import (
    Coefficients,
    NavierStokesOperator,
    TimeWeights,
)
from adaflo_tpu.parameters import FlowParameters, Linearization


def make_setup(
    dim=2, deg_u=2, cells=2, viscosity=0.7, density=1.3, extra_prm=""
):
    prm = f"""
subsection Navier-Stokes
  set dimension = {dim}
  set velocity degree = {deg_u}
  set viscosity = {viscosity}
  set density = {density}
{extra_prm}
end
"""
    par = FlowParameters.from_string(prm)
    mesh = StructuredMesh((cells,) * dim, (0.0,) * dim, (1.0,) * dim)
    u_space = ScalarSpace(mesh, deg_u)
    p_space = ScalarSpace(mesh, deg_u - 1)
    cu = []
    for _ in range(dim):
        c = Constraints(u_space.n_dofs)
        c.close()
        cu.append(c)
    cp = Constraints(p_space.n_dofs)
    cp.close()
    op = NavierStokesOperator(par, u_space, p_space, cu, cp)
    return par, mesh, u_space, p_space, op


def interp(space, fn):
    return jnp.asarray(fn(space.node_coords))


TW = TimeWeights(
    jnp.float64(3.0), jnp.float64(-4.0), jnp.float64(1.0), jnp.float64(1.0)
)


def test_residual_matches_direct_quadrature_2d():
    par, mesh, u_space, p_space, op = make_setup()
    # all fields polynomial and inside the FE spaces (Q2 / Q1)
    u_fn = lambda x: np.stack([x[:, 0] ** 2 * x[:, 1], -x[:, 0] * x[:, 1] ** 2])
    uo_fn = lambda x: np.stack([x[:, 0] * x[:, 1], x[:, 0] ** 2])
    uoo_fn = lambda x: np.stack([x[:, 1] ** 2, x[:, 0] + x[:, 1]])
    v_fn = lambda x: np.stack([x[:, 0] * x[:, 1] ** 2, x[:, 0] ** 2 - x[:, 1]])
    p_fn = lambda x: 2 * x[:, 0] - 3 * x[:, 1] + x[:, 0] * x[:, 1]
    q_fn = lambda x: 1 + x[:, 0] - x[:, 1]

    u = interp(u_space, u_fn)
    uo = interp(u_space, uo_fn)
    uoo = interp(u_space, uoo_fn)
    v = interp(u_space, v_fn)
    p = interp(p_space, p_fn)
    q = interp(p_space, q_fn)

    ru, rp, lin = op.residual_assemble(u, p, uo, uoo, TW)
    fem_value = float(jnp.sum(ru * v) + jnp.sum(rp * q))

    # --- independent direct quadrature with numpy ---------------------
    qp = op.ev_u.quad_coords(mesh)  # (E, n_q, dim)
    X = qp.reshape(-1, 2)
    x, y = X[:, 0], X[:, 1]
    U = np.stack([x**2 * y, -x * y**2], axis=-1)
    Uo = np.stack([x * y, x**2], axis=-1)
    Uoo = np.stack([y**2, x + y], axis=-1)
    V = np.stack([x * y**2, x**2 - y], axis=-1)
    P = 2 * x - 3 * y + x * y
    Q = 1 + x - y
    gradU = np.empty((len(x), 2, 2))  # [c, d] = d u_c / d x_d
    gradU[:, 0, 0] = 2 * x * y
    gradU[:, 0, 1] = x**2
    gradU[:, 1, 0] = -(y**2)
    gradU[:, 1, 1] = -2 * x * y
    gradV = np.empty_like(gradU)
    gradV[:, 0, 0] = y**2
    gradV[:, 0, 1] = 2 * x * y
    gradV[:, 1, 0] = 2 * x
    gradV[:, 1, 1] = -1.0
    divU = gradU[:, 0, 0] + gradU[:, 1, 1]
    divV = gradV[:, 0, 0] + gradV[:, 1, 1]
    w, wo, woo, tau1 = 3.0, -4.0, 1.0, 1.0
    beta = par.beta_convective_term_momentum_balance
    conv = w * U + wo * Uo + woo * Uoo
    conv += tau1 * (
        beta * divU[:, None] * U + np.einsum("qd,qcd->qc", U, gradU)
    )
    conv *= par.density
    sym = gradU + np.swapaxes(gradU, 1, 2)
    stress = par.viscosity * tau1 * sym
    stress[:, 0, 0] -= P
    stress[:, 1, 1] -= P
    integrand = (
        np.einsum("qc,qc->q", conv, V)
        + np.einsum("qcd,qcd->q", stress, gradV)
        - divU * Q
    )
    jxw = np.tile(np.asarray(op.ev_u.jxw), mesh.n_cells)
    direct = float(np.sum(integrand * jxw))
    assert np.isclose(fem_value, direct, rtol=1e-12)


def test_newton_vmult_is_jvp_of_residual():
    par, mesh, u_space, p_space, op = make_setup(viscosity=0.3, density=2.0)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((2, u_space.n_dofs)))
    p = jnp.asarray(rng.standard_normal(p_space.n_dofs))
    uo = jnp.asarray(rng.standard_normal((2, u_space.n_dofs)))
    uoo = jnp.asarray(rng.standard_normal((2, u_space.n_dofs)))
    du = jnp.asarray(rng.standard_normal((2, u_space.n_dofs)))
    dp = jnp.asarray(rng.standard_normal(p_space.n_dofs))

    def assemble(uu, pp):
        ru, rp, _ = op.residual_assemble(uu, pp, uo, uoo, TW)
        return ru, rp

    _, _, lin = op.residual_assemble(u, p, uo, uoo, TW)
    (ru_j, rp_j) = jax.jvp(assemble, (u, p), (du, dp))[1]
    ru_v, rp_v = op.vmult(du, dp, TW, lin)
    assert np.allclose(np.asarray(ru_j), np.asarray(ru_v), atol=1e-10)
    assert np.allclose(np.asarray(rp_j), np.asarray(rp_v), atol=1e-10)


def test_picard_vmult_drops_newton_terms():
    par, mesh, u_space, p_space, op = make_setup(
        extra_prm="""subsection Solver
  set linearization scheme = coupled implicit Picard
end"""
    )
    assert par.linearization == Linearization.coupled_implicit_picard
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((2, u_space.n_dofs)))
    p = jnp.asarray(rng.standard_normal(p_space.n_dofs))
    zero = jnp.zeros_like(u)
    _, _, lin = op.residual_assemble(u, p, zero, zero, TW)
    assert lin.grad is None  # only divergence is frozen for Picard
    du = jnp.asarray(rng.standard_normal((2, u_space.n_dofs)))
    dp = jnp.asarray(rng.standard_normal(p_space.n_dofs))
    ru, rp = op.vmult(du, dp, TW, lin)
    assert np.isfinite(np.asarray(ru)).all()


def test_stokes_operator_symmetry():
    par, mesh, u_space, p_space, op = make_setup(
        extra_prm="  set physical type = stokes"
    )
    rng = np.random.default_rng(3)
    n_u, n_p = u_space.n_dofs, p_space.n_dofs
    x1u = jnp.asarray(rng.standard_normal((2, n_u)))
    x1p = jnp.asarray(rng.standard_normal(n_p))
    x2u = jnp.asarray(rng.standard_normal((2, n_u)))
    x2p = jnp.asarray(rng.standard_normal(n_p))
    tw = TimeWeights(*(jnp.float64(v) for v in (0.0, 0.0, 0.0, 1.0)))
    y1u, y1p = op.vmult(x1u, x1p, tw, None)
    y2u, y2p = op.vmult(x2u, x2p, tw, None)
    # the Stokes block system [[A, B^T], [B, 0]] with our signs satisfies
    # <A x1, x2> symmetry: u-block symmetric, coupling blocks adjoint
    s12 = float(jnp.sum(y1u * x2u) + jnp.sum(y1p * x2p))
    s21 = float(jnp.sum(y2u * x1u) + jnp.sum(y2p * x1p))
    # (v, -p) and (-q, div u): B and B^T with matching sign -> symmetric overall
    assert np.isclose(s12, s21, rtol=1e-11)


def test_velocity_vmult_equals_u_block():
    par, mesh, u_space, p_space, op = make_setup()
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((2, u_space.n_dofs)))
    p = jnp.asarray(rng.standard_normal(p_space.n_dofs))
    zero = jnp.zeros_like(u)
    _, _, lin = op.residual_assemble(u, p, zero, zero, TW)
    du = jnp.asarray(rng.standard_normal((2, u_space.n_dofs)))
    full_u, _ = op.vmult(du, jnp.zeros(p_space.n_dofs), TW, lin)
    only_u = op.velocity_vmult(du, TW, lin)
    assert np.allclose(np.asarray(full_u), np.asarray(only_u), atol=1e-11)


def test_divergence_vmult():
    par, mesh, u_space, p_space, op = make_setup()
    # u = (x, -y): div u = 0 -> zero; u = (x, y): div = 2
    u0 = interp(u_space, lambda x: np.stack([x[:, 0], -x[:, 1]]))
    r0 = op.divergence_vmult_add(jnp.zeros(p_space.n_dofs), u0)
    assert np.allclose(np.asarray(r0), 0.0, atol=1e-12)
    u2 = interp(u_space, lambda x: np.stack([x[:, 0], x[:, 1]]))
    r2 = op.divergence_vmult_add(jnp.zeros(p_space.n_dofs), u2)
    # sum over pressure test functions of -(q, div u) = -2 * volume
    assert np.isclose(float(r2.sum()), -2.0, atol=1e-12)


def test_pressure_poisson_vmult_is_scaled_laplacian():
    par, mesh, u_space, p_space, op = make_setup()
    # p = x: grad = (1,0); (grad q, c grad p) summed over q = 0 (constants)
    p1 = interp(p_space, lambda x: x[:, 0])
    r = op.pressure_poisson_vmult(p1, jnp.float64(0.25))
    assert np.isclose(float(r.sum()), 0.0, atol=1e-12)
    # energy: p^T L p = c * int |grad p|^2 = 0.25 * 1
    assert np.isclose(float(p1 @ r), 0.25, atol=1e-12)


def test_pressure_mass_vmult():
    par, mesh, u_space, p_space, op = make_setup()
    p1 = interp(p_space, lambda x: 1.0 + 0 * x[:, 0])
    r = op.pressure_mass_vmult(p1, jnp.float64(2.0))
    assert np.isclose(float(p1 @ r), 2.0, atol=1e-12)  # 2 * volume


def test_pressure_fix_projection():
    par, mesh, u_space, p_space, op = make_setup()
    op.enable_pressure_fix()
    rng = np.random.default_rng(5)
    rp = jnp.asarray(rng.standard_normal(p_space.n_dofs))
    proj = op.apply_pressure_average_projection(rp)
    mode, weights, _ = op.pressure_fix_mode
    # projection removes the weighted average; idempotent
    assert abs(float(weights @ proj)) < 1e-12
    again = op.apply_pressure_average_projection(proj)
    assert np.allclose(np.asarray(again), np.asarray(proj), atol=1e-13)


def test_residual_3d_smoke():
    par, mesh, u_space, p_space, op = make_setup(dim=3, cells=1)
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.standard_normal((3, u_space.n_dofs)))
    p = jnp.asarray(rng.standard_normal(p_space.n_dofs))
    zero = jnp.zeros_like(u)
    ru, rp, lin = op.residual_assemble(u, p, zero, zero, TW)
    du = jnp.asarray(rng.standard_normal((3, u_space.n_dofs)))
    dp = jnp.asarray(rng.standard_normal(p_space.n_dofs))

    def assemble(uu, pp):
        r1, r2, _ = op.residual_assemble(uu, pp, zero, zero, TW)
        return r1, r2

    (ru_j, rp_j) = jax.jvp(assemble, (u, p), (du, dp))[1]
    ru_v, rp_v = op.vmult(du, dp, TW, lin)
    assert np.allclose(np.asarray(ru_j), np.asarray(ru_v), atol=1e-9)
    assert np.allclose(np.asarray(rp_j), np.asarray(rp_v), atol=1e-9)
