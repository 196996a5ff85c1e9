"""Adaptive Morton forest mesh (AMR groundwork).

Python face of the native C++ forest (adaflo_tpu/native/forest.cc — the TPU
build's p4est counterpart, SURVEY.md section 2.3): forest-of-octrees over a
structured root grid, refine/coarsen with 2:1 balance, Morton enumeration of
active cells and cross-level face-neighbor queries. The solver integration
(hanging-node constraints + general index-map operator path + solution
transfer) builds on these queries.

The shared library is compiled on demand with g++ if missing.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent.parent / "native"


def _load():
    so = _DIR / "libforest.so"
    src = _DIR / "forest.cc"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", str(so), str(src)],
            check=True,
        )
    lib = ctypes.CDLL(str(so))
    lib.forest_create.restype = ctypes.c_void_p
    lib.forest_create.argtypes = [ctypes.c_int] * 4
    lib.forest_destroy.argtypes = [ctypes.c_void_p]
    lib.forest_n_cells.restype = ctypes.c_int64
    lib.forest_n_cells.argtypes = [ctypes.c_void_p]
    lib.forest_max_level.restype = ctypes.c_int
    lib.forest_max_level.argtypes = [ctypes.c_void_p]
    lib.forest_get_cells.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.forest_adapt.restype = ctypes.c_int64
    lib.forest_adapt.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int8)]
    lib.forest_face_neighbors.restype = ctypes.c_int
    lib.forest_face_neighbors.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


_LIB = None


class ForestMesh:
    """Adaptive forest over a structured root grid on a hyper-rectangle."""

    def __init__(self, n_roots, origin, lengths) -> None:
        global _LIB
        if _LIB is None:
            _LIB = _load()
        self.dim = len(n_roots)
        self.n_roots = tuple(int(n) for n in n_roots)
        self.origin = np.asarray(origin, dtype=np.float64)
        self.lengths = np.asarray(lengths, dtype=np.float64)
        nz = self.n_roots[2] if self.dim == 3 else 1
        self._h = _LIB.forest_create(
            self.dim, self.n_roots[0], self.n_roots[1], nz
        )
        # boundary ids per (axis, side), deal.II-style colorization; the
        # default id 0 covers the whole boundary like GridGenerator defaults
        self._boundary_ids = {
            (a, s): 0 for a in range(self.dim) for s in (0, 1)
        }

    def set_boundary_id(self, axis: int, side: int, bid: int) -> None:
        self._boundary_ids[(axis, side)] = bid

    def boundary_ids(self, axis: int, side: int):
        return np.array([self._boundary_ids[(axis, side)]])

    def sides_with_boundary_id(self, bid: int):
        return [k for k, v in self._boundary_ids.items() if v == bid]

    @property
    def cell_diameter(self) -> float:
        """Diameter of the smallest (finest-level) cell."""
        _, h = self.cell_geometry()
        return float(np.linalg.norm(h, axis=1).min())

    def set_periodic(self, axis: int) -> None:
        raise NotImplementedError(
            "periodicity on adaptive forests is not supported; use "
            "StructuredMesh for periodic directions"
        )

    def __del__(self):
        if getattr(self, "_h", None) and _LIB is not None:
            _LIB.forest_destroy(self._h)
            self._h = None

    @property
    def n_cells(self) -> int:
        return int(_LIB.forest_n_cells(self._h))

    @property
    def max_level(self) -> int:
        return int(_LIB.forest_max_level(self._h))

    def cells(self):
        """(roots (E,3), levels (E,), anchors (E,3)) in Morton order."""
        E = self.n_cells
        roots = np.zeros(3 * E, dtype=np.int32)
        levels = np.zeros(E, dtype=np.int32)
        anchors = np.zeros(3 * E, dtype=np.int64)
        _LIB.forest_get_cells(
            self._h,
            roots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            levels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            anchors.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return roots.reshape(E, 3), levels, anchors.reshape(E, 3)

    def adapt(self, flags: np.ndarray) -> int:
        """flags: +1 refine, -1 coarsen (sibling groups), 0 keep. Applies
        2:1 balance; returns the new cell count."""
        flags = np.ascontiguousarray(flags, dtype=np.int8)
        assert len(flags) == self.n_cells
        return int(
            _LIB.forest_adapt(
                self._h, flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
            )
        )

    def refine_global(self, times: int = 1) -> None:
        for _ in range(times):
            self.adapt(np.ones(self.n_cells, dtype=np.int8))

    def face_neighbors(self, i: int, axis: int, side: int):
        """(indices, relation): relation 0 same level, -1 coarser, +1 finer;
        empty indices = domain boundary."""
        out = np.zeros(4, dtype=np.int32)
        rel = np.zeros(1, dtype=np.int32)
        n = _LIB.forest_face_neighbors(
            self._h,
            i,
            axis,
            side,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rel.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out[:n].copy(), int(rel[0])

    def clone(self) -> "ForestMesh":
        """Reconstruct an identical forest (adapt mutates in place; GMG
        hierarchies coarsen a copy)."""
        other = ForestMesh(self.n_roots, self.origin, self.lengths)
        other._boundary_ids = dict(self._boundary_ids)
        roots, levels, anchors = self.cells()
        target = set()
        for r, l, a in zip(roots, levels, anchors):
            target.add((tuple(r), int(l), tuple(a)))
        # refine any cell that is a strict ancestor of a target cell
        while True:
            o_roots, o_levels, o_anchors = other.cells()
            flags = np.zeros(other.n_cells, dtype=np.int8)
            changed = False
            for i, (r, l, a) in enumerate(zip(o_roots, o_levels, o_anchors)):
                if (tuple(r), int(l), tuple(a)) not in target:
                    flags[i] = 1
                    changed = True
            if not changed:
                return other
            other.adapt(flags)

    def coarsened(self) -> "ForestMesh":
        """One global-coarsening step: merge every complete sibling group
        (deal.II MGTransferGlobalCoarsening's next-coarser mesh)."""
        other = self.clone()
        other.adapt(np.full(other.n_cells, -1, dtype=np.int8))
        return other

    def cell_geometry(self):
        """(centers (E, dim), extents (E, dim)) in physical coordinates."""
        roots, levels, anchors = self.cells()
        h_root = self.lengths / np.asarray(self.n_roots)
        h = h_root[None, :] / (2.0 ** levels)[:, None]
        centers = (
            self.origin[None, :]
            + roots[:, : self.dim] * h_root[None, :]
            + (anchors[:, : self.dim] + 0.5) * h
        )
        return centers, h
