"""Residual-based artificial-viscosity stabilization of the LS advection
equation (level_set_okz_advance_concentration.cc:344-369 per-cell viscosity,
420-474 volume terms, 569-620 boundary-flux correction).

The discrete identity under test: for a LINEAR concentration field and a
spatially constant artificial viscosity, the volume term (grad phi, nu grad c)
minus the boundary-flux correction \\oint phi (n . nu grad c) integrates by
parts to -(phi, nu lap c) = 0 — interior-face fluxes cancel by continuity.
This pins the face matrices (normals, signs, JxW) against the volume kernel
without needing the reference binary.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.level_set import LevelSetOperators
from adaflo_tpu.ops.navier_stokes import TimeWeights
from adaflo_tpu.parameters import FlowParameters


def _make_ops(dim, stabilization=True):
    par = FlowParameters.from_string(
        f"""
subsection Two phase
  set concentration subdivisions = 2
  set convection stabilization = {int(stabilization)}
  set epsilon = 1.5
end
subsection Navier-Stokes
  set dimension = {dim}
  set velocity degree = 2
end
"""
    )
    if dim == 2:
        mesh = StructuredMesh((4, 3), (0.0, 0.0), (1.0, 1.2))
    else:
        mesh = StructuredMesh((3, 2, 2), (0.0,) * 3, (1.0, 1.2, 0.8))
    sub = par.concentration_subdivisions
    ls_space = ScalarSpace(mesh, sub, support="iso_q1")
    u_space = ScalarSpace(mesh, par.velocity_degree)
    p_space = ScalarSpace(mesh, par.velocity_degree - 1)
    cons = []
    for sp in (ls_space, ls_space, ls_space):
        c = Constraints(sp.n_dofs)
        c.close()
        cons.append(c)
    h = float(np.max(mesh.h))
    eps_used = par.epsilon * h / sub
    return par, LevelSetOperators(
        par,
        ls_space,
        u_space,
        p_space,
        cons[0],
        cons[1],
        cons[2],
        eps_used,
        h,
        float(np.min(mesh.h)),
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_stab_terms_annihilate_linear_fields(dim):
    par, ops = _make_ops(dim)
    ls = ops.ls_space
    coords = np.asarray(ls.node_coords)
    a = np.arange(1, dim + 1, dtype=np.float64)
    c = jnp.asarray(coords @ a + 0.7)
    cc = ops._gather_ls(c)
    grad = ops.ev_ls.gradients(cc)
    nu = jnp.ones(ls.mesh.n_cells)
    vol = ops.ev_ls.integrate_gradients(nu[:, None, None] * grad)
    face = ops._stab_face_term(cc, nu)
    total = ops.lat_ls.scatter_add(vol - face)
    assert float(jnp.abs(total).max()) < 1e-12


@pytest.mark.parametrize("dim", [2, 3])
def test_stab_viscosity_formula_and_vmult(dim):
    """nu_art follows adv.cc:361-369 (0.03 * max_vel * h * min(1, res/scal))
    and the stabilized vmult stays linear + consistent with the rhs terms."""
    par, ops = _make_ops(dim)
    ls, us = ops.ls_space, ops.u_space
    key_c = np.random.default_rng(3)
    n, nu_ = ls.n_dofs, us.n_dofs
    c = jnp.asarray(key_c.standard_normal(n) * 0.1)
    c_old = jnp.asarray(key_c.standard_normal(n) * 0.1)
    c_oo = jnp.asarray(key_c.standard_normal(n) * 0.1)
    u = jnp.asarray(key_c.standard_normal((dim, nu_)))
    tw = TimeWeights(*(jnp.float64(v) for v in (30.0, -30.0, 0.0, 1.0)))
    rhs, conv, nu_art = ops.advection_rhs(
        c, c_old, c_oo, u, u, u, tw, True, jnp.float64(0.05)
    )
    assert nu_art is not None and nu_art.shape == (ls.mesh.n_cells,)
    assert bool(jnp.all(jnp.isfinite(nu_art))) and float(nu_art.max()) > 0
    # the cap: nu <= 0.03 * max_vel_cell * h
    u_sum_max = float(
        jnp.max(jnp.sqrt(jnp.sum((2 * conv) ** 2, axis=1)))
    )
    assert float(nu_art.max()) <= 0.03 * u_sum_max * ops.cell_diameter + 1e-14
    # vmult linearity with the frozen nu_art
    md = ops.lumped_mass()
    x1 = jnp.asarray(key_c.standard_normal(n))
    x2 = jnp.asarray(key_c.standard_normal(n))
    a1 = ops.advection_vmult(x1, conv, tw, md, nu_art)
    a2 = ops.advection_vmult(x2, conv, tw, md, nu_art)
    a12 = ops.advection_vmult(x1 + 2.0 * x2, conv, tw, md, nu_art)
    assert float(jnp.abs(a12 - a1 - 2.0 * a2).max()) < 1e-9 * float(
        jnp.abs(a12).max()
    )
    # stabilization really changes the operator
    a_nostab = ops.advection_vmult(x1, conv, tw, md, None)
    assert float(jnp.abs(a1 - a_nostab).max()) > 1e-10


@pytest.mark.medium
def test_stab_on_adaptive_forest():
    """Convection stabilization on an ADAPTED forest (hanging nodes): the
    volume/boundary-flux terms satisfy the integration-by-parts identity on
    linear fields with the per-cell geometric face scales, and nu_art is a
    finite per-cell array using the per-cell diameter (adv.cc:344-369 on
    adaptive meshes — previously raised NotImplementedError here)."""
    import io

    from adaflo_tpu.drivers.rising_bubble import (
        MicroFluidicProblem,
        TwoPhaseParameters,
        initial_distance,
    )
    from adaflo_tpu.functions import ZeroFunction

    par = TwoPhaseParameters()
    par.dimension = 2
    par.global_refinements = 1
    par.adaptive_refinements = 2
    par.convection_stabilization = True
    par.end_time = 0.0  # setup only
    prob = MicroFluidicProblem(par, out=io.StringIO())
    s = prob.solver
    s.set_no_slip_boundary(0)
    s.fix_pressure_constant(0)
    s.set_symmetry_boundary(2)
    s.setup_problem(ZeroFunction(2), initial_distance)
    ops = s.ops
    assert ops.stabilization
    ls = ops.ls_space
    E = ls.mesh.n_cells
    assert ops._stab_cell_diameter.shape == (E,)

    # integration-by-parts identity on a linear field, constant nu:
    # int grad(phi) . nu grad(c) dV  ==  oint phi nu dc/dn dS on the domain
    # boundary (interior hanging faces cancel through the conforming basis)
    coords = np.asarray(ls.node_coords)
    c = jnp.asarray(coords @ np.array([1.0, 2.0]) + 0.7)
    # the solver pops the symmetry faces (the reference skips them,
    # adv.cc:569-620) — restore the full set for the identity check, which
    # needs every domain-boundary face of the arbitrary linear field
    ops._stab_faces = ops._build_stab_faces()
    cc = ops._gather_ls(c)
    grad = ops.ev_ls.gradients(cc)
    nu = jnp.ones(E)
    vol = ops.ev_ls.integrate_gradients(nu[:, None, None] * grad)
    face = ops._stab_face_term(cc, nu)
    # condense: the conforming test function of a master dof includes its
    # hanging slaves' rows (distribute_local_to_global tail) — the identity
    # holds for the condensed residual
    total = np.asarray(ops._scatter_ls(vol - face, ops.con_ls))
    free = np.setdiff1d(
        np.arange(ls.n_dofs), ops.con_ls.constrained_dofs
    )
    assert np.abs(total[: ls.n_dofs][free]).max() < 1e-10

    # a stabilized advection rhs evaluates with per-cell nu_art
    rng = np.random.default_rng(5)
    n, nu_n = ls.n_dofs_padded, s.navier_stokes.u_space.n_dofs_padded
    cr = jnp.asarray(rng.standard_normal(n) * 0.1)
    u = jnp.asarray(rng.standard_normal((2, nu_n)))
    tw = TimeWeights(*(jnp.float64(v) for v in (30.0, -30.0, 0.0, 1.0)))
    rhs, conv, nu_art = ops.advection_rhs(
        cr, cr, cr, u, u, u, tw, True, jnp.float64(0.05)
    )
    assert nu_art is not None and nu_art.shape == (E,)
    assert bool(jnp.all(jnp.isfinite(nu_art)))
    assert bool(jnp.all(jnp.isfinite(rhs)))


@pytest.mark.parametrize("kind", ["mapped", "simplex", "extruded"])
def test_stab_identity_on_general_meshes(kind):
    """Round-5 #9: convection stabilization on curved/simplex/extruded
    meshes (previously a NotImplementedError; the reference supports any
    mesh through FEFaceValues, adv.cc:420-474, 569-620). On AFFINE cells
    (sheared parallelograms / straight triangles) quadrature is exact, so
    the integration-by-parts identity pins the per-face matrices: for a
    linear field and constant nu,
    int grad(phi).nu grad(c) dV == oint phi nu dc/dn dS."""
    from adaflo_tpu.fe.mapped_space import CellMapping, MappedSpace
    from adaflo_tpu.mesh.unstructured import QuadMesh

    par = FlowParameters.from_string(
        """
subsection Two phase
  set concentration subdivisions = 2
  set convection stabilization = 1
  set epsilon = 1.5
end
subsection Navier-Stokes
  set dimension = 2
  set velocity degree = 2
end
"""
    )
    sub = par.concentration_subdivisions

    def sheared_quad_mesh(nx, ny):
        xs, ys = np.meshgrid(
            np.linspace(0, 1, nx + 1), np.linspace(0, 1.2, ny + 1)
        )
        verts = np.stack(
            [xs.ravel() + 0.3 * ys.ravel(), ys.ravel()], axis=1
        )
        cells = []
        for j in range(ny):
            for i in range(nx):
                v0 = j * (nx + 1) + i
                cells.append([v0, v0 + 1, v0 + nx + 1, v0 + nx + 2])
        return QuadMesh(verts, np.asarray(cells))

    if kind == "mapped":
        mesh = sheared_quad_mesh(3, 2)
        mp = CellMapping(mesh, 2)
        ls_space = MappedSpace(mesh, sub, mp, "iso_q1")
        u_space = MappedSpace(mesh, 2, mp)
        p_space = MappedSpace(mesh, 1, mp)
    elif kind == "simplex":
        from adaflo_tpu.fe.simplex import SimplexSpace
        from adaflo_tpu.mesh.unstructured import TriMesh

        xs, ys = np.meshgrid(np.linspace(0, 1, 4), np.linspace(0, 1.2, 3))
        verts = np.stack([xs.ravel(), ys.ravel()], axis=1)
        cells = []
        for j in range(2):
            for i in range(3):
                v0 = j * 4 + i
                cells.append([v0, v0 + 1, v0 + 5])
                cells.append([v0, v0 + 5, v0 + 4])
        mesh = TriMesh(verts, np.asarray(cells))
        ls_space = SimplexSpace(mesh, sub)
        u_space = SimplexSpace(mesh, 2)
        p_space = SimplexSpace(mesh, 1)
    else:
        from adaflo_tpu.fe.extruded_space import ExtrudedSpace
        from adaflo_tpu.mesh.extruded import ExtrudedMesh

        base = sheared_quad_mesh(3, 2)
        mesh = ExtrudedMesh(base, 2, 0.8)
        mp = CellMapping(base, 2)
        ls_space = ExtrudedSpace(mesh, sub, mp, "iso_q1")
        u_space = ExtrudedSpace(mesh, 2, mp)
        p_space = ExtrudedSpace(mesh, 1, mp)

    cons = []
    for _ in range(3):
        c = Constraints(ls_space.n_dofs)
        c.close()
        cons.append(c)
    dim = ls_space.dim
    h = 0.5
    ops = LevelSetOperators(
        par,
        ls_space,
        u_space,
        p_space,
        cons[0],
        cons[1],
        cons[2],
        par.epsilon * h / sub,
        h,
        h,
    )
    assert ops.stabilization
    assert ops._stab_faces_general is not None
    E = ls_space.n_cells
    assert ops._stab_cell_diameter.shape == (E,)

    coords = np.asarray(ls_space.node_coords)
    a = np.array([1.0, 2.0, -0.5][:dim])
    c = jnp.asarray(coords @ a + 0.7)
    cc = ops._gather_ls(c)
    grad = ops.ev_ls.gradients(cc)
    nu = jnp.ones(E)
    vol = ops.ev_ls.integrate_gradients(nu[:, None, None] * grad)
    face = ops._stab_face_term(cc, nu)
    total = np.asarray(ops._scatter_ls(vol - face))
    assert np.abs(total[: ls_space.n_dofs]).max() < 1e-10
