"""Unstructured-quad meshes, mapped (curved) geometry, and the NS solver on
them — the machinery behind the flow_past_cylinder configuration.

Anchors against the reference where the discretization matches exactly:
deal.II's refinement vertex placement (flow_past_cylinder.cc:227-240 encodes
the expected coordinates), cell/dof counts and the 'size last cell' line of
tests/flow_past_cylinder.output.
"""

import numpy as np
import pytest

from adaflo_tpu.fe.mapped_space import CellMapping, MappedSpace
from adaflo_tpu.mesh.unstructured import PolarManifold, QuadMesh
from adaflo_tpu.ops.mapped import MappedEvaluator


# ---------------------------------------------------------------------------
def test_quadmesh_rectangle_counts():
    m = QuadMesh.subdivided_hyper_rectangle((3, 2), (0.0, 0.0), (3.0, 2.0))
    assert m.n_cells == 6 and m.n_vertices == 12
    m.refine_global(1)
    assert m.n_cells == 24
    assert m.all_boundary_ids() == {0}


def test_hyper_shell_refinement_matches_dealii():
    """deal.II's flat-manifold cell refinement places the new center at the
    mean of 4 vertices + 4 edge midpoints; the reference driver hard-codes
    the resulting coordinates (flow_past_cylinder.cc:232-240)."""
    center = np.array([0.5, 0.2])
    middle = QuadMesh.hyper_shell(center, 0.05, 0.2, 4)
    middle.set_manifold(0, PolarManifold(center))
    middle.set_manifold_id_by_center(
        lambda c: np.linalg.norm(c - center) <= 0.05, 0
    )
    middle.refine_global(1)
    assert middle.n_cells == 16
    for target in [
        (0.56379, 0.13621),
        (0.56379, 0.26379),
        (0.43621, 0.13621),
        (0.43621, 0.26379),
    ]:
        d = np.abs(middle.vertices - np.array(target)).max(axis=1)
        assert d.min() < 1e-4, target
    # inner-circle midpoints went onto the circle (polar manifold)
    r = np.linalg.norm(middle.vertices - center, axis=1)
    assert (np.abs(r - 0.05) < 1e-12).sum() == 8


def test_flow_past_cylinder_mesh_reference_parity():
    """Cell/dof counts and last-cell size of the reference golden
    (tests/flow_past_cylinder.output:2-4): 2176 cells, 39984 + 8976 dofs,
    size last cell 0.0253144."""
    from adaflo_tpu.drivers.flow_past_cylinder import create_triangulation

    tria = create_triangulation()
    assert tria.n_cells == 136
    tria.refine_global(2)
    assert tria.n_cells == 2176
    mapping = CellMapping(tria, 3)
    su = MappedSpace(tria, 3, mapping)
    sp = MappedSpace(tria, 2, mapping)
    assert 2 * su.n_dofs == 39984
    assert sp.n_dofs == 8976
    assert abs(tria.last_cell_diameter / np.sqrt(2) - 0.0253144) < 1e-6
    # all cylinder-boundary vertices lie exactly on the circle
    r = np.linalg.norm(tria.vertices - np.array([0.5, 0.2]), axis=1)
    assert (np.abs(r - 0.05) < 1e-12).sum() == 64


# ---------------------------------------------------------------------------
def test_mapped_evaluator_annulus_area():
    """Integration over curved cells converges at high order to the exact
    annulus area."""
    import jax

    center = np.array([0.5, 0.2])
    errs = []
    for nref in (1, 2):
        m = QuadMesh.hyper_shell(center, 0.05, 0.2, 4)
        m.set_manifold(0, PolarManifold(center))
        m.set_manifold_id_by_center(lambda c: True, 0)
        m.refine_global(nref)
        mp = CellMapping(m, 3)
        ev = MappedEvaluator(2, MappedSpace(m, 2, mp).basis, 4, mp)
        exact = np.pi * (0.2**2 - 0.05**2)
        errs.append(abs(float(ev.jxw_cells.sum()) - exact) / exact)
    assert errs[0] < 1e-5
    assert errs[1] < errs[0] / 16  # >= 4th order


def test_mapped_evaluator_exact_on_straight_quads():
    """On straight-edged (bilinear) quads, physical polynomials up to the
    tensor degree are reproduced exactly, and integrate_gradients is the
    exact adjoint of gradients."""
    import jax.numpy as jnp

    m = QuadMesh.subdivided_hyper_rectangle((4, 3), (0.0, 0.0), (1.0, 0.8))
    m.distort_random(0.2, seed=3)
    mp = CellMapping(m, 2)
    sp = MappedSpace(m, 2, mp)
    ev = MappedEvaluator(2, sp.basis, 4, mp)
    assert abs(float(ev.jxw_cells.sum()) - 0.8) < 1e-12

    def f(p):
        return 2 * p[..., 0] - 3 * p[..., 1] + 0.5

    u = jnp.asarray(f(sp.node_coords))[sp.cell_dofs]
    qc = ev.quad_coords()
    assert np.abs(np.asarray(ev.values(u)) - f(qc)).max() < 1e-12
    g = np.asarray(ev.gradients(u))
    assert np.abs(g[:, 0] - 2).max() < 1e-11
    assert np.abs(g[:, 1] + 3).max() < 1e-11

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(sp.n_dofs))
    b = jnp.asarray(rng.rand(sp.n_dofs))

    def scatter(r):
        out = np.zeros(sp.n_dofs)
        np.add.at(out, sp.cell_dofs.ravel(), np.asarray(r).ravel())
        return out

    Ka = scatter(ev.integrate_gradients(ev.gradients(a[sp.cell_dofs])))
    Kb = scatter(ev.integrate_gradients(ev.gradients(b[sp.cell_dofs])))
    assert abs(float(np.asarray(b) @ Ka) - float(np.asarray(a) @ Kb)) < 1e-12


def test_mapped_poisson_convergence():
    """-Laplace u = f on a distorted mesh: Q2 L2 error converges at order 3
    (the ForestHelmholtzOperator runs unchanged on the mapped path)."""
    import jax.numpy as jnp

    from adaflo_tpu.ops.forest_ops import ForestHelmholtzOperator
    from adaflo_tpu.solvers.krylov import cg

    def solve(nref):
        m = QuadMesh.subdivided_hyper_rectangle((2, 2), (0.0, 0.0), (1.0, 1.0))
        m.distort_random(0.15, seed=7)
        m.refine_global(nref)
        mp = CellMapping(m, 2)
        sp = MappedSpace(m, 2, mp)
        con = sp.make_constraints(sp.all_boundary_dofs())
        op = ForestHelmholtzOperator(sp, con)
        qc = op.ev.quad_coords()
        f = 2 * np.pi**2 * np.sin(np.pi * qc[..., 0]) * np.sin(np.pi * qc[..., 1])
        rhs = op.rhs(jnp.asarray(f))
        A = lambda x: op.vmult(x, alpha=None, beta=1.0)
        dinv = 1.0 / op.diagonal(alpha=None, beta=1.0)
        x = cg(A, rhs, jnp.zeros_like(rhs), jnp.float64(1e-12), 2000,
               M=lambda r: dinv * r).x
        exact = lambda p: np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])
        return op.l2_error(x, exact)

    e1, e2 = solve(1), solve(2)
    assert e2 < e1 / 6.5, (e1, e2)  # ~order 3


# ---------------------------------------------------------------------------
@pytest.mark.medium
def test_flow_past_cylinder_small_golden():
    from pathlib import Path

    from adaflo_tpu.drivers.flow_past_cylinder import main
    from adaflo_tpu.testing import compare_with_golden, run_driver_capture

    here = Path(__file__).parent
    text = run_driver_capture(main, str(here / "prms" / "flow_past_cylinder_small.prm"))
    assert " Number of active cells: 544." in text
    assert "converged." in text
    compare_with_golden(text, here / "golden" / "flow_past_cylinder_small.output")


# ---------------------------------------------------------------------------
def test_mapped_navier_stokes_poiseuille_exact():
    """Stationary NS on a distorted unstructured channel with full Dirichlet
    + pressure fix reproduces the quadratic Poiseuille solution to solver
    tolerance (the discrete space contains it on bilinear-mapped quads)."""
    import io

    from adaflo_tpu.parameters import FlowParameters, PhysicalType
    from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

    par = FlowParameters()
    par.dimension = 2
    par.global_refinements = 1
    par.velocity_degree = 2
    par.viscosity = 0.5
    par.physical_type = PhysicalType.incompressible_stationary
    par.time_step_size_start = 0.1
    par.end_time = 0.1
    par.max_nl_iteration = 12
    par.tol_nl_iteration = 1e-11
    par.max_lin_iteration = 300
    par.tol_lin_iteration = 1e-8
    par.output_verbosity = 0

    mesh = QuadMesh.subdivided_hyper_rectangle((8, 2), (-2.0, -1.0), (2.0, 1.0))
    mesh.distort_random(0.15, seed=5)

    nu = par.viscosity

    def exact_u(x, t=0.0):
        v = np.zeros((2, len(x)))
        v[0] = 0.5 / nu * (1 - x[:, 1]) * (1 + x[:, 1])
        return v

    ns = NavierStokes(par, mesh, out=io.StringIO())
    ns.set_velocity_dirichlet_boundary(0, exact_u)
    ns.fix_pressure_constant(0, lambda x, t: 2 - x[:, 0])
    ns.setup_problem(exact_u)
    ns.advance_time_step()
    u = np.asarray(ns.solution[0])
    p = np.asarray(ns.solution[1])
    ex = exact_u(ns.u_space.node_coords)
    assert np.abs(u[0][: ns.u_space.n_dofs] - ex[0]).max() < 1e-9
    assert np.abs(u[1][: ns.u_space.n_dofs]).max() < 1e-9
    pex = 2 - ns.p_space.node_coords[:, 0]
    assert np.abs(p[: ns.p_space.n_dofs] - pex).max() < 1e-7
