"""Native Morton forest (AMR groundwork) tests."""

import numpy as np
import pytest

from adaflo_tpu.mesh.forest import ForestMesh


def test_uniform_refinement_counts():
    f = ForestMesh((2, 2), (0, 0), (1, 1))
    assert f.n_cells == 4
    f.refine_global(2)
    assert f.n_cells == 64
    assert f.max_level == 2
    centers, h = f.cell_geometry()
    assert np.allclose(h, 1 / 8)
    # Morton order: cells cover the domain exactly once
    assert len(np.unique(centers, axis=0)) == 64
    assert np.isclose((h.prod(axis=1)).sum(), 1.0)


def test_local_refinement_and_balance():
    f = ForestMesh((2, 2), (0, 0), (1, 1))
    f.refine_global(1)  # 16 cells level 1
    # refine a single cell twice: 2:1 balance must force neighbors to split
    flags = np.zeros(f.n_cells, dtype=np.int8)
    flags[0] = 1
    f.adapt(flags)
    flags = np.zeros(f.n_cells, dtype=np.int8)
    centers, h = f.cell_geometry()
    # refine the smallest cell closest to the origin corner
    i = np.argmin(centers.sum(axis=1))
    flags[i] = 1
    n = f.adapt(flags)
    _, levels, _ = f.cells()
    # balance: no two face-adjacent cells differ by more than one level
    for i in range(f.n_cells):
        for axis in range(2):
            for side in range(2):
                idx, rel = f.face_neighbors(i, axis, side)
                for j in idx:
                    assert abs(int(levels[i]) - int(levels[j])) <= 1
    assert np.isclose(f.cell_geometry()[1].prod(axis=1).sum(), 1.0)


def test_coarsening_sibling_groups():
    f = ForestMesh((1, 1), (0, 0), (1, 1))
    f.refine_global(2)
    assert f.n_cells == 16
    # coarsen everything back one level
    n = f.adapt(-np.ones(f.n_cells, dtype=np.int8))
    assert n == 4
    assert f.max_level == 1


def test_face_neighbors_same_level():
    f = ForestMesh((2, 1), (0, 0), (2, 1))
    f.refine_global(1)  # 8 cells
    centers, h = f.cell_geometry()
    # find the cell at lower-left and its +x neighbor
    i = int(np.argmin(centers[:, 0] + 10 * centers[:, 1]))
    idx, rel = f.face_neighbors(i, 0, 1)
    assert rel == 0 and len(idx) == 1
    j = int(idx[0])
    assert np.isclose(centers[j, 0] - centers[i, 0], h[i, 0])
    # domain boundary
    idx, rel = f.face_neighbors(i, 0, 0)
    assert len(idx) == 0


def test_cross_level_neighbors():
    f = ForestMesh((2, 2), (0, 0), (1, 1))
    flags = np.zeros(f.n_cells, dtype=np.int8)
    flags[0] = 1
    f.adapt(flags)
    centers, h = f.cell_geometry()
    _, levels, _ = f.cells()
    fine = np.flatnonzero(levels == 1)
    coarse = np.flatnonzero(levels == 0)
    assert len(fine) == 4 and len(coarse) == 3
    # a coarse cell adjacent to the refined one sees 2 finer neighbors
    found_fine = False
    for i in coarse:
        for axis in range(2):
            for side in range(2):
                idx, rel = f.face_neighbors(int(i), axis, side)
                if rel == 1 and len(idx) == 2:
                    found_fine = True
    assert found_fine
