"""Krylov solver tests against dense numpy solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaflo_tpu.solvers.krylov import bicgstab, cg, fgmres, gmres


def spd_matrix(n, rng, cond=100.0):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.logspace(0, np.log10(cond), n)
    return Q @ np.diag(d) @ Q.T


def test_cg_spd():
    rng = np.random.default_rng(0)
    n = 40
    A = spd_matrix(n, rng)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = cg(lambda x: Aj @ x, jnp.asarray(b), jnp.zeros(n), 1e-10, 200)
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-7)


def test_cg_preconditioned_fewer_iterations():
    rng = np.random.default_rng(1)
    n = 60
    A = spd_matrix(n, rng, cond=1e4)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    diag = jnp.asarray(1.0 / np.diag(A))
    plain = cg(lambda x: Aj @ x, jnp.asarray(b), jnp.zeros(n), 1e-8, 500)
    prec = cg(
        lambda x: Aj @ x, jnp.asarray(b), jnp.zeros(n), 1e-8, 500,
        M=lambda r: diag * r,
    )
    assert bool(prec.converged)
    assert int(prec.iterations) <= int(plain.iterations)


def test_cg_reduction_control():
    rng = np.random.default_rng(2)
    n = 30
    A = spd_matrix(n, rng)
    b = 1e6 * rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = cg(
        lambda x: Aj @ x, jnp.asarray(b), jnp.zeros(n), 1e-50, 500,
        reduction=1e-6,
    )
    assert bool(res.converged)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) <= 1e-5 * np.linalg.norm(b)


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(3)
    n = 50
    A = np.eye(n) * 3 + 0.5 / np.sqrt(n) * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = gmres(lambda x: Aj @ x, jnp.asarray(b), jnp.zeros(n), 1e-9, 200, 20)
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-7)
    # residual reported is the true residual (right preconditioning)
    r = np.linalg.norm(b - A @ np.asarray(res.x))
    assert abs(r - float(res.residual)) < 1e-6


def test_gmres_with_restart_and_preconditioner():
    rng = np.random.default_rng(4)
    n = 80
    A = np.diag(np.linspace(1, 500, n)) + 0.1 / np.sqrt(n) * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    Minv = jnp.asarray(1.0 / np.diag(A))
    res = gmres(
        lambda x: Aj @ x, jnp.asarray(b), jnp.zeros(n), 1e-8, 300, 25,
        M=lambda r: Minv * r,
    )
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-5)


def test_fgmres_with_inner_solver():
    rng = np.random.default_rng(5)
    n = 50
    A = np.eye(n) * 4 + 0.3 / np.sqrt(n) * rng.standard_normal((n, n))
    Asym = 0.5 * (A + A.T)
    Aj = jnp.asarray(A)
    Asj = jnp.asarray(Asym)

    def inner(r):
        # nonlinear preconditioner: few CG iterations on the symmetric part
        return cg(lambda x: Asj @ x, r, jnp.zeros_like(r), 1e-2, 10).x

    b = rng.standard_normal(n)
    res = fgmres(lambda x: Aj @ x, jnp.asarray(b), jnp.zeros(n), 1e-9, 200, 20, M=inner)
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-6)


def test_bicgstab():
    rng = np.random.default_rng(6)
    n = 50
    A = np.eye(n) * 3 + 0.4 / np.sqrt(n) * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = bicgstab(lambda x: Aj @ x, jnp.asarray(b), jnp.zeros(n), 1e-9, 300)
    r = np.linalg.norm(b - A @ np.asarray(res.x))
    assert r < 1e-7


def test_pytree_block_vectors():
    """Solvers operate on (u, p) tuples directly."""
    rng = np.random.default_rng(7)
    n1, n2 = 20, 12
    n = n1 + n2
    A = spd_matrix(n, rng)
    Aj = jnp.asarray(A)

    def Ablock(xb):
        x = jnp.concatenate([xb[0], xb[1]])
        y = Aj @ x
        return (y[:n1], y[n1:])

    b = rng.standard_normal(n)
    bb = (jnp.asarray(b[:n1]), jnp.asarray(b[n1:]))
    x0 = (jnp.zeros(n1), jnp.zeros(n2))
    res = cg(Ablock, bb, x0, 1e-10, 200)
    x = np.concatenate([np.asarray(res.x[0]), np.asarray(res.x[1])])
    assert np.allclose(x, np.linalg.solve(A, b), atol=1e-7)
    res_g = gmres(Ablock, bb, x0, 1e-10, 200, 30)
    xg = np.concatenate([np.asarray(res_g.x[0]), np.asarray(res_g.x[1])])
    assert np.allclose(xg, np.linalg.solve(A, b), atol=1e-6)


def test_jit_compatibility():
    rng = np.random.default_rng(8)
    n = 24
    A = spd_matrix(n, rng)
    Aj = jnp.asarray(A)

    @jax.jit
    def solve(b):
        return cg(lambda x: Aj @ x, b, jnp.zeros(n), 1e-10, 100)

    b = jnp.asarray(rng.standard_normal(n))
    res = solve(b)
    assert np.allclose(np.asarray(res.x), np.linalg.solve(A, np.asarray(b)), atol=1e-7)
