"""Augmented Taylor-Hood (FE_Q_DG0 pressure) on adaptive forests and
graded lattices.

The DG0 interior-penalty graph (ns_prec.cc:1636-1684, 2248-2342 incl.
hanging subfaces) generalizes from the uniform banded-diff path to a
static face list; a uniformly refined forest must reproduce the
structured-lattice operator exactly, and a 2:1-adapted forest's graph
must be symmetric with zero row sums (a graph Laplacian).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.forest import ForestMesh
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.navier_stokes import NavierStokesOperator
from adaflo_tpu.parameters import FlowParameters


def _params(dim=2):
    return FlowParameters.from_string(
        f"""
subsection Navier-Stokes
  set dimension = {dim}
  set velocity degree = 2
  set augmented Taylor-Hood elements = 1
end
"""
    )


def _operator_for(mesh, par):
    from adaflo_tpu.fe.forest_space import ForestSpace

    if isinstance(mesh, ForestMesh):
        us, ps = ForestSpace(mesh, 2), ForestSpace(mesh, 1)
    else:
        us, ps = ScalarSpace(mesh, 2), ScalarSpace(mesh, 1)
    cu = []
    for _ in range(par.dimension):
        c = Constraints(us.n_dofs)
        c.close()
        cu.append(c)
    cp = Constraints(ps.n_dofs)
    cp.close()
    return NavierStokesOperator(par, us, ps, cu, cp)


def _dense_graph(op, E):
    cols = []
    for k in range(E):
        pc = jnp.zeros(E).at[k].set(1.0)
        cols.append(np.asarray(op._dg0_graph_laplacian(pc)))
    return np.stack(cols, axis=1)


def test_forest_dg0_graph_matches_uniform():
    par = _params(2)
    fm = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    fm.refine_global(1)  # uniform 4x4 forest
    op_f = _operator_for(fm, par)

    sm = StructuredMesh((4, 4), (0.0, 0.0), (1.0, 1.0))
    op_s = _operator_for(sm, par)

    E = 16
    Gf = _dense_graph(op_f, E)
    Gs = _dense_graph(op_s, E)
    # map forest (Morton) cell order onto the lattice raster order
    centers, _ = fm.cell_geometry()
    lex = np.lexsort((centers[:, 0], centers[:, 1]))
    Gf_lex = Gf[np.ix_(lex, lex)]
    assert np.allclose(Gf_lex, Gs, atol=1e-12)
    assert np.allclose(
        np.asarray(op_f.dg0_diagonal())[lex], np.diag(Gs), atol=1e-12
    )
    # per-cell volumes
    vf = np.asarray(op_f._cell_volumes())
    assert np.allclose(vf, 1.0 / 16.0, atol=1e-14)


def test_adapted_forest_dg0_graph_is_laplacian():
    par = _params(2)
    fm = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    fm.refine_global(1)
    # refine two cells -> 2:1 hanging faces
    flags = np.zeros(fm.n_cells, np.int8)
    flags[0] = 1
    flags[5] = 1
    fm.adapt(flags)
    op = _operator_for(fm, par)
    E = fm.n_cells
    G = _dense_graph(op, E)
    assert np.allclose(G, G.T, atol=1e-12)  # symmetric
    assert np.allclose(G.sum(axis=1), 0.0, atol=1e-12)  # zero row sums
    offdiag = G - np.diag(np.diag(G))
    assert (offdiag <= 1e-12).all()  # M-matrix sign structure
    assert (np.diag(G) > 0).all()
    assert np.allclose(np.diag(G), np.asarray(op.dg0_diagonal()), atol=1e-12)
    # volumes consistent with levels
    _, h = fm.cell_geometry()
    assert np.allclose(np.asarray(op._cell_volumes()), np.prod(h, axis=1))


def test_graded_dg0_graph_matches_uniform_when_ungraded():
    par = _params(2)
    sm_u = StructuredMesh((4, 3), (0.0, 0.0), (1.0, 0.75))
    op_u = _operator_for(sm_u, par)
    sm_g = StructuredMesh((4, 3), (0.0, 0.0), (1.0, 0.75))
    # identity transform marks the mesh graded without changing geometry
    sm_g.apply_axis_transform(0, lambda x: x)
    assert sm_g.is_graded
    op_g = _operator_for(sm_g, par)
    E = 12
    assert op_g._dg0_faces() is not None and op_u._dg0_faces() is None
    Gu = _dense_graph(op_u, E)
    Gg = _dense_graph(op_g, E)
    assert np.allclose(Gg, Gu, atol=1e-12)
    assert np.allclose(
        np.asarray(op_g.dg0_diagonal()), np.asarray(op_u.dg0_diagonal())
    )
    assert np.allclose(
        np.asarray(op_g._cell_volumes()), np.asarray(op_u._cell_volumes())
    )


def test_graded_dg0_graph_nonuniform_consistency():
    par = _params(2)
    sm = StructuredMesh((4, 3), (0.0, 0.0), (1.0, 1.0))
    sm.apply_axis_transform(0, lambda x: x**2)
    op = _operator_for(sm, par)
    E = 12
    G = _dense_graph(op, E)
    assert np.allclose(G, G.T, atol=1e-12)
    assert np.allclose(G.sum(axis=1), 0.0, atol=1e-12)
    assert (np.diag(G) > 0).all()
    assert np.allclose(np.diag(G), np.asarray(op.dg0_diagonal()), atol=1e-12)
    # volumes = row sums of jxw must equal the analytic cell volumes
    w = np.diff(np.asarray(sm.axis_nodes(0)))
    vols = np.asarray(op._cell_volumes()).reshape(3, 4)
    assert np.allclose(vols, w[None, :] * (1.0 / 3.0), atol=1e-12)
