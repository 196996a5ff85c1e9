"""Adaptive ForestSpace: dof numbering, hanging-node constraints, and a
matrix-free Poisson solve on a mixed-level mesh.

Mirrors the reference's reliance on deal.II make_hanging_node_constraints +
matrix-free loops on adaptively refined p4est meshes
(/root/reference/source/two_phase_base_algorithm.cc refine_grid,
navier_stokes.cc:229-259): a polynomial of the FE degree must be reproduced
EXACTLY on a hanging-node mesh, both by interpolation (continuity across
coarse/fine faces) and by the constrained Galerkin solve.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from adaflo_tpu.fe.forest_space import ForestSpace
from adaflo_tpu.mesh.forest import ForestMesh
from adaflo_tpu.ops.forest_ops import ForestHelmholtzOperator
from adaflo_tpu.solvers.krylov import cg
from adaflo_tpu.solvers.preconditioner import DiagonalPreconditioner


def _adaptive_forest_2d(degree_refines=2):
    """Unit square, one root, refine cells near (0.3, 0.4) -> mixed levels."""
    forest = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    forest.refine_global(1)
    for _ in range(degree_refines):
        centers, _ = forest.cell_geometry()
        d = np.linalg.norm(centers - np.array([0.3, 0.4]), axis=1)
        forest.adapt((d < 0.3).astype(np.int8))
    return forest


def test_uniform_forest_matches_structured_counts():
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.structured import StructuredMesh

    forest = ForestMesh((2, 3), (0.0, 0.0), (1.0, 1.5))
    forest.refine_global(2)
    fsp = ForestSpace(forest, 2)
    mesh = StructuredMesh((8, 12), (0.0, 0.0), (1.0, 1.5))
    ssp = ScalarSpace(mesh, 2)
    assert fsp.n_cells == mesh.n_cells
    assert fsp.n_dofs == ssp.n_dofs
    assert len(fsp.hanging_slave) == 0
    # whole-boundary dof counts agree (default boundary id 0 = all sides)
    assert len(fsp.all_boundary_dofs()) == len(ssp.boundary_dofs(0))
    # per-side counts: full grid is 17 x 25 nodes
    assert len(fsp.side_dofs(0, 0)) == 25
    assert len(fsp.side_dofs(1, 1)) == 17


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_hanging_interpolation_continuity_2d(degree):
    """A global polynomial of the FE degree interpolated at nodes must
    satisfy every hanging constraint and evaluate continuously."""
    forest = _adaptive_forest_2d()
    sp = ForestSpace(forest, degree)
    assert len(sp.hanging_slave) > 0  # the mesh does have hanging nodes

    k = degree
    f = lambda p: (p[:, 0] ** k + 2.0 * p[:, 1] ** k
                   + (p[:, 0] * p[:, 1]) ** min(k, 1) + 0.5)
    u = jnp.asarray(f(sp.node_coords))
    con = sp.make_constraints()
    # interpolant of a continuous piecewise-poly function satisfies the
    # hanging constraints identically
    err = np.asarray(con.distribute(u) - u)
    # distribute zeroes dirichlet rows; none were set here
    assert np.abs(err).max() < 1e-12

    # continuity: quad-point evaluation reproduces f on every cell
    op = ForestHelmholtzOperator(sp, con)
    qc = op.ev.quad_coords(sp)
    vals = np.asarray(op.ev.values(u[jnp.asarray(sp.cell_dofs)]))
    exact = f(qc.reshape(-1, 2)).reshape(vals.shape)
    assert np.abs(vals - exact).max() < 1e-12


def test_hanging_weights_partition_of_unity():
    sp = ForestSpace(_adaptive_forest_2d(), 2)
    con = sp.make_constraints()
    # each hanging row's weights sum to 1 (constants are reproduced)
    for s in np.unique(con.slave):
        assert abs(con.weight[con.slave == s].sum() - 1.0) < 1e-12


@pytest.mark.parametrize("dim", [2, 3])
def test_adaptive_poisson_exact_polynomial(dim):
    """-lap(u) = f with u = prod x_i(1-x_i) (degree 2): the Q2 Galerkin
    solution on a hanging-node mesh is exact up to solver tolerance."""
    if dim == 2:
        forest = _adaptive_forest_2d()
    else:
        forest = ForestMesh((1, 1, 1), (0.0,) * 3, (1.0,) * 3)
        forest.refine_global(1)
        centers, _ = forest.cell_geometry()
        d = np.linalg.norm(centers - 0.25, axis=1)
        forest.adapt((d < 0.35).astype(np.int8))
    sp = ForestSpace(forest, 2)
    if dim == 3:
        assert len(sp.hanging_slave) > 0
    con = sp.make_constraints(dirichlet=sp.all_boundary_dofs())
    op = ForestHelmholtzOperator(sp, con, n_q_1d=4)

    def u_exact(p):
        return np.prod(p * (1.0 - p), axis=1)

    def f_rhs(p):
        out = np.zeros(len(p))
        for a in range(dim):
            prod = np.ones(len(p))
            for b in range(dim):
                if b != a:
                    prod *= p[:, b] * (1.0 - p[:, b])
            out += 2.0 * prod
        return out

    qc = op.ev.quad_coords(sp)
    fq = jnp.asarray(f_rhs(qc.reshape(-1, dim)).reshape(qc.shape[:2]))
    b = op.rhs(fq)
    A = lambda v: op.vmult(v, alpha=None, beta=1.0)
    prec = DiagonalPreconditioner(op.diagonal(alpha=None, beta=1.0))
    res = cg(A, b, jnp.zeros_like(b), 1e-13, 400, M=prec)
    err = op.l2_error(res.x, u_exact)
    assert err < 5e-11, (err, int(res.iterations))


def test_adaptive_poisson_convergence_2d():
    """Non-polynomial solution: error decreases under adaptive refinement."""

    def u_exact(p):
        return np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])

    def f_rhs(p):
        return 2.0 * np.pi**2 * u_exact(p)

    errs = []
    for refines in (0, 1, 2):
        forest = _adaptive_forest_2d(refines)
        sp = ForestSpace(forest, 2)
        con = sp.make_constraints(dirichlet=sp.all_boundary_dofs())
        op = ForestHelmholtzOperator(sp, con, n_q_1d=4)
        qc = op.ev.quad_coords(sp)
        fq = jnp.asarray(f_rhs(qc.reshape(-1, 2)).reshape(qc.shape[:2]))
        b = op.rhs(fq)
        A = lambda v: op.vmult(v, alpha=None, beta=1.0)
        prec = DiagonalPreconditioner(op.diagonal(alpha=None, beta=1.0))
        res = cg(A, b, jnp.zeros_like(b), 1e-12, 600, M=prec)
        errs.append(op.l2_error(res.x, u_exact))
    assert errs[1] < errs[0]
    assert errs[2] < errs[1]


def test_solution_transfer_refine_and_coarsen():
    """Nodal transfer across adapt(): a degree-k polynomial survives
    refinement exactly; smooth data survives coarsening to interpolation
    accuracy (counterpart of deal.II SolutionTransfer around refine_grid,
    two_phase_base_algorithm.cc)."""
    from adaflo_tpu.fe.forest_transfer import ForestFunction, transfer_solution

    forest = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    forest.refine_global(1)
    centers, _ = forest.cell_geometry()
    forest.adapt((np.linalg.norm(centers - 0.4, axis=1) < 0.3).astype(np.int8))

    sp = ForestSpace(forest, 2)
    f = lambda p: p[:, 0] ** 2 + 0.5 * p[:, 0] * p[:, 1] - p[:, 1] ** 2 + 1.0
    u = f(sp.node_coords)
    snap = ForestFunction(sp)

    # refine some cells, coarsen others
    centers, _ = forest.cell_geometry()
    flags = np.zeros(forest.n_cells, dtype=np.int8)
    flags[np.linalg.norm(centers - 0.4, axis=1) < 0.2] = 1
    flags[centers[:, 0] > 0.7] = -1
    forest.adapt(flags)
    sp2 = ForestSpace(forest, 2)
    assert sp2.n_cells != sp.n_cells

    u2 = transfer_solution(snap, sp2, u)
    # a biquadratic is in every Q2 space: transfer must be exact
    assert np.abs(u2 - f(sp2.node_coords)).max() < 1e-12

    # the transferred vector satisfies the new hanging constraints
    import jax.numpy as jnp

    con2 = sp2.make_constraints()
    assert np.abs(np.asarray(con2.distribute(jnp.asarray(u2))) - u2).max() < 1e-12


def test_forest_function_point_evaluation_vector():
    from adaflo_tpu.fe.forest_transfer import ForestFunction

    forest = _adaptive_forest_2d(1)
    sp = ForestSpace(forest, 2)
    fn = ForestFunction(sp)
    u = np.stack([sp.node_coords[:, 0], 2.0 * sp.node_coords[:, 1]])  # (2, n)
    rng = np.random.default_rng(3)
    pts = rng.uniform(0.0, 1.0, size=(57, 2))
    vals = fn.evaluate(u, pts)
    assert vals.shape == (2, 57)
    assert np.abs(vals[0] - pts[:, 0]).max() < 1e-13
    assert np.abs(vals[1] - 2.0 * pts[:, 1]).max() < 1e-13


@pytest.mark.medium
def test_forest_gmg_poisson():
    """Global-coarsening GMG on the forest hierarchy: mesh-independent-ish
    CG counts (counterpart of the reference's ML-AMG on p4est meshes) and
    the same solution as diagonal-preconditioned CG."""
    from adaflo_tpu.solvers.forest_multigrid import ForestGMG

    forest = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    forest.refine_global(3)
    centers, _ = forest.cell_geometry()
    d = np.linalg.norm(centers - np.array([0.3, 0.4]), axis=1)
    forest.adapt((d < 0.3).astype(np.int8))
    sp = ForestSpace(forest, 2)
    con = sp.make_constraints(dirichlet=sp.all_boundary_dofs())
    op = ForestHelmholtzOperator(sp, con, n_q_1d=4)
    qc = op.ev.quad_coords(sp)
    f = 2 * np.pi**2 * np.sin(np.pi * qc[..., 0]) * np.sin(np.pi * qc[..., 1])
    b = op.rhs(jnp.asarray(f))
    A = lambda v: op.vmult(v, alpha=None, beta=1.0)

    prec = DiagonalPreconditioner(op.diagonal(alpha=None, beta=1.0))
    r_diag = cg(A, b, jnp.zeros_like(b), 1e-10, 800, M=prec)

    sides = [(a, s) for a in range(2) for s in (0, 1)]
    gmg = ForestGMG(sp, sides, sp.n_dofs_padded, min_coarse_nodes=100)
    assert len(gmg.levels) >= 3
    st = gmg.compute(jnp.float64(0.0), jnp.float64(1.0))
    r_gmg = cg(A, b, jnp.zeros_like(b), 1e-10, 100, M=lambda r: gmg.vmult(st, r))
    assert int(r_gmg.iterations) <= 12, int(r_gmg.iterations)
    assert int(r_gmg.iterations) < int(r_diag.iterations) // 5
    assert float(jnp.abs(r_gmg.x - r_diag.x).max()) < 1e-8


@pytest.mark.medium
def test_forest_gmg_helmholtz_state_reuse():
    """compute() is pure in (alpha, beta): two states from one geometry
    precondition different operators correctly."""
    from adaflo_tpu.solvers.forest_multigrid import ForestGMG

    forest = _adaptive_forest_2d(1)
    sp = ForestSpace(forest, 2)
    con = sp.make_constraints(dirichlet=sp.all_boundary_dofs())
    op = ForestHelmholtzOperator(sp, con, n_q_1d=3)
    sides = [(a, s) for a in range(2) for s in (0, 1)]
    gmg = ForestGMG(sp, sides, sp.n_dofs_padded, min_coarse_nodes=50)
    b = jnp.asarray(np.random.default_rng(0).normal(size=sp.n_dofs))
    b = b.at[con.constrained_dofs].set(0.0)
    for alpha in (0.0, 10.0):
        st = gmg.compute(jnp.float64(alpha), jnp.float64(1.0))
        A = lambda v: op.vmult(v, alpha=alpha if alpha else None, beta=1.0)
        res = cg(A, b, jnp.zeros_like(b), 1e-10, 60, M=lambda r: gmg.vmult(st, r))
        assert bool(res.converged), (alpha, int(res.iterations))
