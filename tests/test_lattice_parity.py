"""Parity-packed ("pe") lattice gather/scatter vs the window-split path.

gather_pe enumerates cells on the extended anchor raster prod(nc_a + 1);
restricted to real anchors it must agree with gather_t exactly, and
scatter_add_pe must be its exact transpose (phantom anchors masked).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.lattice import LatticeOps


def _real_anchor_idx(lat):
    """Flat anchor-raster indices of the real cells, in cell-raster order."""
    ash = lat.anchor_shape
    ncs = tuple(reversed(lat.n_cells_axis))  # (z, y, x)
    grids = np.meshgrid(*[np.arange(nc) for nc in ncs], indexing="ij")
    idx = np.zeros_like(grids[0])
    for a in range(lat.dim):
        idx = idx * ash[a] + grids[a]
    return idx.reshape(-1)


@pytest.mark.parametrize(
    "cells,degree",
    [((3, 4, 2), 2), ((3, 4, 2), 1), ((2, 3, 2), 3), ((5, 3), 2), ((4, 5), 1)],
)
def test_parity_gather_matches_gather_t(cells, degree):
    dim = len(cells)
    mesh = StructuredMesh(cells, (0.0,) * dim, tuple(float(c) for c in cells))
    sp = ScalarSpace(mesh, degree)
    lat = LatticeOps.for_space(sp)
    u = jax.random.normal(jax.random.PRNGKey(0), (sp.n_dofs,))

    xt = np.asarray(lat.gather_t(u))  # (n_loc, E)
    xpe = np.asarray(lat.gather_pe(u))  # (n_loc, EA)
    real = _real_anchor_idx(lat)
    assert np.array_equal(xpe[:, real], xt)


@pytest.mark.parametrize(
    "cells,degree", [((3, 4, 2), 2), ((2, 3, 2), 3), ((5, 3), 2)]
)
def test_parity_scatter_is_transpose(cells, degree):
    dim = len(cells)
    mesh = StructuredMesh(cells, (0.0,) * dim, tuple(float(c) for c in cells))
    sp = ScalarSpace(mesh, degree)
    lat = LatticeOps.for_space(sp)
    key = jax.random.PRNGKey(1)
    r_t = jax.random.normal(key, (lat.n_loc, lat.n_cells))

    # embed the cell-raster rows at the real anchors, garbage elsewhere
    real = _real_anchor_idx(lat)
    r_pe = jax.random.normal(jax.random.PRNGKey(2), (lat.n_loc, lat.n_anchors))
    r_pe = r_pe.at[:, real].set(r_t)

    ref = np.asarray(lat.scatter_add_t(r_t))
    got = np.asarray(lat.scatter_add_pe(r_pe))
    assert np.allclose(got, ref, rtol=0, atol=1e-12 * max(1.0, np.abs(ref).max()))


def test_cells_to_anchors_roundtrip():
    mesh = StructuredMesh((3, 2, 4), (0.0,) * 3, (1.0,) * 3)
    sp = ScalarSpace(mesh, 2)
    lat = LatticeOps.for_space(sp)
    s = jax.random.normal(jax.random.PRNGKey(3), (7, lat.n_cells))
    sa = np.asarray(lat.cells_to_anchors(s))
    real = _real_anchor_idx(lat)
    assert sa.shape == (7, lat.n_anchors)
    assert np.array_equal(sa[:, real], np.asarray(s))
    mask = lat.anchor_mask()
    phantom = np.setdiff1d(np.arange(lat.n_anchors), real)
    assert np.all(sa[:, phantom] == 0)
    assert np.all(mask[real] == 1) and np.all(mask[phantom] == 0)


def test_parity_rows_cover_all_locals():
    for cells, degree in [((3, 4, 2), 2), ((4, 3), 3)]:
        dim = len(cells)
        mesh = StructuredMesh(cells, (0.0,) * dim, (1.0,) * dim)
        sp = ScalarSpace(mesh, degree)
        lat = LatticeOps.for_space(sp)
        rows = lat._parity_rows()
        assert len(rows) == (degree + 1) ** dim
        assert len(set(rows)) == len(rows)
        n_sub = degree**dim
        assert all(0 <= s < n_sub for s, _ in rows)
