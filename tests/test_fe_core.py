"""FE core tests: bases, quadrature, mesh, spaces, tensor evaluation."""

import jax.numpy as jnp
import numpy as np
import pytest

from adaflo_tpu.fe.basis import (
    LagrangeBasis1D,
    gauss_lobatto_points,
    gauss_quadrature,
)
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.tensor import CellEvaluator


# ---------------------------------------------------------------- basis
def test_gauss_quadrature_exactness():
    for n in range(1, 8):
        q, w = gauss_quadrature(n)
        # exact for polynomials up to degree 2n-1 on [0,1]
        for d in range(2 * n):
            assert np.isclose(np.sum(w * q**d), 1.0 / (d + 1), atol=1e-13)


def test_gauss_lobatto_points():
    assert np.allclose(gauss_lobatto_points(2), [0, 1])
    assert np.allclose(gauss_lobatto_points(3), [0, 0.5, 1])
    p4 = gauss_lobatto_points(4)
    assert np.allclose(p4, [0, 0.5 - np.sqrt(5) / 10, 0.5 + np.sqrt(5) / 10, 1])


def test_lagrange_partition_of_unity():
    for deg in range(1, 6):
        b = LagrangeBasis1D(deg)
        x = np.linspace(0, 1, 17)
        V, D = b.tabulate(x)
        assert np.allclose(V.sum(axis=1), 1.0, atol=1e-12)
        assert np.allclose(D.sum(axis=1), 0.0, atol=1e-10)
        # nodal property
        Vn, _ = b.tabulate(b.nodes)
        assert np.allclose(Vn, np.eye(deg + 1), atol=1e-12)


def test_lagrange_derivative_exact_for_poly():
    b = LagrangeBasis1D(3)
    # interpolate x^3 at nodes; derivative must be 3x^2 at sample points
    coef = b.nodes**3
    x = np.linspace(0, 1, 9)
    V, D = b.tabulate(x)
    assert np.allclose(V @ coef, x**3, atol=1e-12)
    assert np.allclose(D @ coef, 3 * x**2, atol=1e-11)


# ---------------------------------------------------------------- mesh
def test_mesh_refine_and_counts():
    mesh = StructuredMesh.subdivided_hyper_rectangle((4, 1), (-2, -1), (2, 0))
    assert mesh.n_cells == 4
    mesh.refine_global(4)
    assert mesh.n_cells == 1024  # matches poiseuille_ns.output line 2
    assert np.allclose(mesh.h, [4 / 64, 1 / 16])


def test_boundary_id_predicates():
    mesh = StructuredMesh.subdivided_hyper_rectangle((4, 1), (-2, -1), (2, 0))
    mesh.refine_global(1)
    mesh.set_boundary_id(lambda c: np.abs(c[:, 0] - 2) < 1e-13, 1)
    mesh.set_boundary_id(lambda c: np.abs(c[:, 0] + 2) < 1e-13, 2)
    mesh.set_boundary_id(lambda c: np.abs(c[:, 1]) < 1e-13, 3)
    assert mesh.all_boundary_ids() == {0, 1, 2, 3}
    assert np.all(mesh.boundary_ids(0, 1) == 1)
    assert np.all(mesh.boundary_ids(0, 0) == 2)
    assert np.all(mesh.boundary_ids(1, 1) == 3)
    assert np.all(mesh.boundary_ids(1, 0) == 0)


def test_boundary_ids_survive_refinement():
    mesh = StructuredMesh.hyper_cube(2, 0, 1)
    mesh.set_side_boundary_id(0, 1, 7)
    mesh.refine_global(2)
    assert np.all(mesh.boundary_ids(0, 1) == 7)
    assert mesh.boundary_ids(0, 1).shape == (4,)


# ---------------------------------------------------------------- space
def test_dof_counts_poiseuille():
    mesh = StructuredMesh.subdivided_hyper_rectangle((4, 1), (-2, -1), (2, 0))
    mesh.refine_global(4)
    u_space = ScalarSpace(mesh, 2)
    p_space = ScalarSpace(mesh, 1)
    # velocity dofs 8514 = 2 * 4257, pressure 1105 (poiseuille_ns.output:3)
    assert 2 * u_space.n_dofs == 8514
    assert p_space.n_dofs == 1105


def test_cell_dofs_shared_nodes():
    mesh = StructuredMesh.hyper_cube(2, 0, 1)
    mesh.refine_global(1)  # 2x2 cells
    sp = ScalarSpace(mesh, 2)
    cd = sp.cell_dofs
    assert cd.shape == (4, 9)
    # right edge of cell 0 == left edge of cell 1
    assert np.array_equal(cd[0][[2, 5, 8]], cd[1][[0, 3, 6]])
    # top edge of cell 0 == bottom edge of cell 2
    assert np.array_equal(cd[0][[6, 7, 8]], cd[2][[0, 1, 2]])
    # all dofs touched
    assert set(cd.ravel().tolist()) == set(range(sp.n_dofs))


def test_periodic_space():
    mesh = StructuredMesh.hyper_cube(2, 0, 1)
    mesh.refine_global(2)
    mesh.set_periodic(0)
    sp = ScalarSpace(mesh, 2)
    assert sp.n_nodes_axis == (8, 9)
    cd = sp.cell_dofs
    # last cell in x wraps to first column
    row = cd.reshape(4, 4, 9)
    assert np.array_equal(row[0, 3][[2, 5, 8]], row[0, 0][[0, 3, 6]])


def test_node_coords_gauss_lobatto():
    mesh = StructuredMesh.hyper_cube(1, 0, 1)
    mesh.refine_global(1)
    sp = ScalarSpace(mesh, 3)
    x = sp.axis_node_coords(0)
    gl = gauss_lobatto_points(4)
    expect = np.concatenate([0.5 * gl[:-1], 0.5 + 0.5 * gl])
    assert np.allclose(x, expect)


def test_boundary_dofs():
    mesh = StructuredMesh.hyper_cube(2, 0, 1)
    mesh.refine_global(1)
    mesh.set_side_boundary_id(0, 0, 5)
    sp = ScalarSpace(mesh, 2)
    dofs = sp.boundary_dofs(5)
    coords = sp.node_coords[dofs]
    assert len(dofs) == 5
    assert np.allclose(coords[:, 0], 0.0)
    # id 0 boundary: everything else on the boundary
    d0 = sp.boundary_dofs(0)
    c0 = sp.node_coords[d0]
    on_bnd = (
        (np.abs(c0[:, 0] - 1) < 1e-12)
        | (np.abs(c0[:, 1]) < 1e-12)
        | (np.abs(c0[:, 1] - 1) < 1e-12)
    )
    assert on_bnd.all()


def test_boundary_faces():
    mesh = StructuredMesh.hyper_cube(2, 0, 1)
    mesh.refine_global(2)
    mesh.set_side_boundary_id(0, 1, 3)
    sp = ScalarSpace(mesh, 2)
    faces = sp.boundary_faces(3)
    assert len(faces) == 1
    axis, end, fd = faces[0]
    assert (axis, end) == (0, 1)
    assert fd.shape == (4, 3)
    assert np.allclose(sp.node_coords[fd.ravel()][:, 0], 1.0)


# ---------------------------------------------------------------- tensor eval
@pytest.mark.parametrize("dim", [1, 2, 3])
def test_evaluate_polynomial_exact(dim):
    """Q_k interpolant of a degree-k monomial evaluates/differentiates exactly."""
    deg = 2
    mesh = StructuredMesh(
        (2,) * dim, (0.0,) * dim, tuple(1.0 + 0.5 * a for a in range(dim))
    )
    sp = ScalarSpace(mesh, deg)
    ev = CellEvaluator(dim, sp.basis, deg + 2, mesh.h)
    coords = sp.node_coords
    # f = sum_a (x_a)^2 + 2*x_0
    f = (coords**2).sum(axis=1) + 2 * coords[:, 0]
    u_cells = jnp.asarray(f[sp.cell_dofs])
    vals = ev.values(u_cells)
    grads = ev.gradients(u_cells)
    qp = ev.quad_coords(mesh)  # (E, n_q, dim)
    f_exact = (qp**2).sum(axis=-1) + 2 * qp[..., 0]
    assert np.allclose(np.asarray(vals), f_exact, atol=1e-12)
    for a in range(dim):
        g_exact = 2 * qp[..., a] + (2.0 if a == 0 else 0.0)
        assert np.allclose(np.asarray(grads[:, a, :]), g_exact, atol=1e-11)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_integrate_mass_conservation(dim):
    """integrate_values(1) sums to the domain volume after scatter."""
    deg = 3
    mesh = StructuredMesh((2,) * dim, (0.0,) * dim, (2.0,) * dim)
    sp = ScalarSpace(mesh, deg)
    ev = CellEvaluator(dim, sp.basis, deg + 1, mesh.h)
    ones = jnp.ones((mesh.n_cells, ev.n_q))
    loc = ev.integrate_values(ones)
    # scatter-add
    r = jnp.zeros(sp.n_dofs).at[jnp.asarray(sp.cell_dofs).ravel()].add(loc.ravel())
    assert np.isclose(float(r.sum()), 2.0**dim, atol=1e-12)


def test_integrate_transpose_consistency():
    """integrate_* is the exact adjoint of values/gradients wrt the
    jxw-weighted inner product."""
    rng = np.random.default_rng(0)
    dim, deg = 2, 2
    mesh = StructuredMesh((3, 2), (0, 0), (1.5, 1.0))
    sp = ScalarSpace(mesh, deg)
    ev = CellEvaluator(dim, sp.basis, deg + 2, mesh.h)
    u = jnp.asarray(rng.standard_normal((mesh.n_cells, ev.n_local)))
    f = jnp.asarray(rng.standard_normal((mesh.n_cells, ev.n_q)))
    g = jnp.asarray(rng.standard_normal((mesh.n_cells, dim, ev.n_q)))
    # <E u, f>_w == <u, E^T (w f)>
    lhs = float(jnp.sum(ev.values(u) * f * ev.jxw))
    rhs = float(jnp.sum(u * ev.integrate_values(f)))
    assert np.isclose(lhs, rhs, atol=1e-12)
    lhs_g = float(jnp.sum(ev.gradients(u) * g * ev.jxw))
    rhs_g = float(jnp.sum(u * ev.integrate_gradients(g)))
    assert np.isclose(lhs_g, rhs_g, atol=1e-12)
