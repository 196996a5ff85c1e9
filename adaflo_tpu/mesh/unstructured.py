"""Unstructured quadrilateral meshes with manifold-aware refinement.

TPU-native counterpart of deal.II's Triangulation + GridGenerator +
Manifold machinery for the *unstructured* configurations of the reference
test suite: flow_past_cylinder.cc builds its mesh by merging structured
rectangles with a refined hyper_shell around the cylinder and attaches a
PolarManifold to the cylinder boundary
(/root/reference/tests/flow_past_cylinder.cc:181-280). Cells carry explicit
vertex coordinates; curved geometry enters through per-edge manifold ids
that steer where refinement places new points, exactly like deal.II:

- new edge midpoints come from the edge's manifold (polar for cylinder
  edges, straight average otherwise),
- new cell centers are the mean of the cell's 4 vertices and 4 edge
  midpoints (deal.II FlatManifold behavior; verified against the vertex
  coordinates hard-coded in flow_past_cylinder.cc:227-240, e.g.
  (0.56379, 0.13621) = shell center + 0.0902 * (cos -45, sin -45)).

Cell-local vertex order is lexicographic — v0=(0,0), v1=(1,0), v2=(0,1),
v3=(1,1) on the reference square — matching the rest of the framework.
Device kernels never see this class; fe/mapped_space.py turns it into dof
index maps and per-cell mapping support points.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Manifolds
class FlatManifold:
    def get_intermediate(self, p0: np.ndarray, p1: np.ndarray, t: float):
        return (1.0 - t) * p0 + t * p1


class PolarManifold:
    """Polar coordinates around a center: intermediate points interpolate
    radius and angle (along the shorter arc) — deal.II PolarManifold<2>."""

    def __init__(self, center) -> None:
        self.center = np.asarray(center, dtype=np.float64)

    def get_intermediate(self, p0: np.ndarray, p1: np.ndarray, t: float):
        d0 = p0 - self.center
        d1 = p1 - self.center
        r0 = np.hypot(d0[0], d0[1])
        r1 = np.hypot(d1[0], d1[1])
        a0 = np.arctan2(d0[1], d0[0])
        a1 = np.arctan2(d1[1], d1[0])
        da = a1 - a0
        if da > np.pi:
            da -= 2 * np.pi
        elif da < -np.pi:
            da += 2 * np.pi
        r = (1.0 - t) * r0 + t * r1
        a = a0 + t * da
        return self.center + r * np.array([np.cos(a), np.sin(a)])


# ---------------------------------------------------------------------------
class QuadMesh:
    """2D unstructured quadrilateral mesh.

    vertices: (V, 2) float64; cells: (E, 4) int64 in lexicographic local
    order. Edges are identified by their sorted vertex pair; boundary and
    manifold ids live on edges (boundary ids only meaningful on boundary
    edges). Local edges of a cell, in order: bottom (v0,v1), top (v2,v3),
    left (v0,v2), right (v1,v3)."""

    _LOCAL_EDGES = ((0, 1), (2, 3), (0, 2), (1, 3))

    def __init__(self, vertices: np.ndarray, cells: np.ndarray) -> None:
        self.dim = 2
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.cells = np.asarray(cells, dtype=np.int64)
        self.manifolds: Dict[int, object] = {}
        self._edge_boundary_id: Dict[Tuple[int, int], int] = {}
        self._edge_manifold_id: Dict[Tuple[int, int], int] = {}
        self.periodic = [False, False]
        # pre-refinement snapshots (coarse-to-fine): each _refine_once
        # appends the mesh state it refined, giving the geometric hierarchy
        # for mapped-mesh multigrid (children of cell e are 4e..4e+3)
        self.history: List["QuadMesh"] = []
        self._rebuild_edges()

    # -- topology -----------------------------------------------------------
    def _rebuild_edges(self) -> None:
        """Edge table + boundary edges (edges adjacent to exactly one cell)."""
        count: Dict[Tuple[int, int], int] = {}
        for cell in self.cells:
            for (a, b) in self._LOCAL_EDGES:
                key = (min(cell[a], cell[b]), max(cell[a], cell[b]))
                count[key] = count.get(key, 0) + 1
        self.edge_keys = sorted(count.keys())
        self.edge_index = {k: i for i, k in enumerate(self.edge_keys)}
        self.boundary_edge_keys = [k for k in self.edge_keys if count[k] == 1]
        # drop stale id entries for edges that no longer exist
        self._edge_boundary_id = {
            k: v for k, v in self._edge_boundary_id.items() if k in count
        }
        self._edge_manifold_id = {
            k: v for k, v in self._edge_manifold_id.items() if k in count
        }

    @property
    def n_cells(self) -> int:
        return len(self.cells)

    @property
    def n_vertices(self) -> int:
        return len(self.vertices)

    @property
    def n_edges(self) -> int:
        return len(self.edge_keys)

    @property
    def cell_diameter(self) -> float:
        """Diameter of the smallest cell (max diagonal length)."""
        v = self.vertices[self.cells]  # (E, 4, 2)
        d1 = np.linalg.norm(v[:, 3] - v[:, 0], axis=1)
        d2 = np.linalg.norm(v[:, 2] - v[:, 1], axis=1)
        return float(np.maximum(d1, d2).min())

    @property
    def last_cell_diameter(self) -> float:
        """Diameter of the last cell (deal.II triangulation.last()->diameter(),
        printed by the reference as 'Approximate size last cell',
        navier_stokes.cc:174)."""
        v = self.vertices[self.cells[-1]]
        return float(
            max(np.linalg.norm(v[3] - v[0]), np.linalg.norm(v[2] - v[1]))
        )

    def cell_centers(self) -> np.ndarray:
        return self.vertices[self.cells].mean(axis=1)

    # -- ids ------------------------------------------------------------------
    def _edge_key(self, a: int, b: int) -> Tuple[int, int]:
        return (min(a, b), max(a, b))

    def edge_midpoint_flat(self, key: Tuple[int, int]) -> np.ndarray:
        return 0.5 * (self.vertices[key[0]] + self.vertices[key[1]])

    def set_manifold(self, manifold_id: int, manifold) -> None:
        self.manifolds[manifold_id] = manifold

    def edge_manifold(self, key: Tuple[int, int]):
        mid = self._edge_manifold_id.get(key, -1)
        return self.manifolds.get(mid, _FLAT)

    def for_each_boundary_edge(self, fn: Callable) -> None:
        """fn(key, center) for every boundary edge; center is the straight
        midpoint (deal.II face->center() of a straight face)."""
        for key in self.boundary_edge_keys:
            fn(key, self.edge_midpoint_flat(key))

    def set_boundary_id_by_center(
        self, predicate: Callable[[np.ndarray], bool], boundary_id: int
    ) -> None:
        for key in self.boundary_edge_keys:
            if predicate(self.edge_midpoint_flat(key)):
                self._edge_boundary_id[key] = boundary_id

    def set_manifold_id_by_center(
        self, predicate: Callable[[np.ndarray], bool], manifold_id: int
    ) -> None:
        for key in self.edge_keys:
            if predicate(self.edge_midpoint_flat(key)):
                self._edge_manifold_id[key] = manifold_id

    def boundary_id(self, key: Tuple[int, int]) -> int:
        return self._edge_boundary_id.get(key, 0)

    def boundary_edges_with_id(self, boundary_id: int) -> List[Tuple[int, int]]:
        return [
            k for k in self.boundary_edge_keys if self.boundary_id(k) == boundary_id
        ]

    def all_boundary_ids(self) -> set:
        return {self.boundary_id(k) for k in self.boundary_edge_keys}

    def set_periodic(self, axis: int) -> None:
        raise NotImplementedError(
            "periodicity on unstructured meshes is not supported; use "
            "StructuredMesh for periodic directions"
        )

    # -- refinement -----------------------------------------------------------
    def refine_global(self, times: int = 1) -> None:
        for _ in range(times):
            self._refine_once()

    def _snapshot(self) -> "QuadMesh":
        snap = QuadMesh(self.vertices.copy(), self.cells.copy())
        snap.manifolds = self.manifolds  # shared (geometry objects)
        snap._edge_boundary_id = dict(self._edge_boundary_id)
        snap._edge_manifold_id = dict(self._edge_manifold_id)
        snap._rebuild_edges()
        return snap

    def _refine_once(self) -> None:
        self.history.append(self._snapshot())
        verts = list(self.vertices)
        new_of_edge: Dict[Tuple[int, int], int] = {}

        def edge_mid(a: int, b: int) -> int:
            key = self._edge_key(a, b)
            if key not in new_of_edge:
                man = self.edge_manifold(key)
                p = man.get_intermediate(self.vertices[key[0]], self.vertices[key[1]], 0.5)
                new_of_edge[key] = len(verts)
                verts.append(p)
            return new_of_edge[key]

        new_cells = []
        child_edge_ids: Dict[Tuple[int, int], Tuple[int, int]] = {}
        for cell in self.cells:
            v0, v1, v2, v3 = (int(c) for c in cell)
            mb = edge_mid(v0, v1)
            mt = edge_mid(v2, v3)
            ml = edge_mid(v0, v2)
            mr = edge_mid(v1, v3)
            # cell center: mean of the 4 vertices + 4 edge midpoints
            # (deal.II FlatManifold cell refinement; see module docstring)
            c = (
                self.vertices[v0]
                + self.vertices[v1]
                + self.vertices[v2]
                + self.vertices[v3]
                + verts[mb]
                + verts[mt]
                + verts[ml]
                + verts[mr]
            ) / 8.0
            vc = len(verts)
            verts.append(c)
            new_cells.append([v0, mb, ml, vc])
            new_cells.append([mb, v1, vc, mr])
            new_cells.append([ml, vc, v2, mt])
            new_cells.append([vc, mr, mt, v3])
            # child boundary/manifold ids: each parent edge splits into two
            for (a, b) in self._LOCAL_EDGES:
                pa, pb = int(cell[a]), int(cell[b])
                key = self._edge_key(pa, pb)
                m = new_of_edge[key]
                for child in ((pa, m), (m, pb)):
                    ck = self._edge_key(*child)
                    child_edge_ids[ck] = (
                        self._edge_boundary_id.get(key, None),
                        self._edge_manifold_id.get(key, None),
                    )

        self.vertices = np.asarray(verts)
        self.cells = np.asarray(new_cells, dtype=np.int64)
        old_b, old_m = self._edge_boundary_id, self._edge_manifold_id
        self._edge_boundary_id = {}
        self._edge_manifold_id = {}
        for ck, (bid, mid) in child_edge_ids.items():
            if bid is not None:
                self._edge_boundary_id[ck] = bid
            if mid is not None:
                self._edge_manifold_id[ck] = mid
        self._rebuild_edges()

    # -- generators ------------------------------------------------------------
    @classmethod
    def subdivided_hyper_rectangle(
        cls, subdivisions, bottom_left, top_right
    ) -> "QuadMesh":
        nx, ny = subdivisions
        x = np.linspace(bottom_left[0], top_right[0], nx + 1)
        y = np.linspace(bottom_left[1], top_right[1], ny + 1)
        X, Y = np.meshgrid(x, y, indexing="xy")  # (ny+1, nx+1)
        verts = np.stack([X.reshape(-1), Y.reshape(-1)], axis=1)

        def vid(i, j):
            return j * (nx + 1) + i

        cells = []
        for j in range(ny):
            for i in range(nx):
                cells.append([vid(i, j), vid(i + 1, j), vid(i, j + 1), vid(i + 1, j + 1)])
        return cls(verts, np.asarray(cells))

    @classmethod
    def hyper_shell(
        cls, center, inner_radius: float, outer_radius: float, n_cells: int
    ) -> "QuadMesh":
        """Annulus of n_cells quads, vertices at angles 2*pi*i/n on both
        circles (deal.II GridGenerator::hyper_shell<2>). No manifolds are
        attached (callers reset/attach them, mirroring the reference's
        reset_all_manifolds + per-face assignment)."""
        center = np.asarray(center, dtype=np.float64)
        ang = 2.0 * np.pi * np.arange(n_cells) / n_cells
        inner = center + inner_radius * np.stack([np.cos(ang), np.sin(ang)], axis=1)
        outer = center + outer_radius * np.stack([np.cos(ang), np.sin(ang)], axis=1)
        verts = np.concatenate([inner, outer], axis=0)
        cells = []
        for i in range(n_cells):
            j = (i + 1) % n_cells
            # lexicographic local order with x ~ radial, y ~ angular
            # (counter-clockwise), giving det J > 0
            cells.append([i, n_cells + i, j, n_cells + j])
        return cls(verts, np.asarray(cells))

    @classmethod
    def merge(cls, meshes: List["QuadMesh"], tol: float = 1e-10) -> "QuadMesh":
        """Merge triangulations, deduplicating coincident vertices
        (GridGenerator::merge_triangulations; ids are NOT transferred —
        callers re-assign geometrically, as the reference drivers do)."""
        verts = np.concatenate([m.vertices for m in meshes], axis=0)
        offs = np.cumsum([0] + [m.n_vertices for m in meshes])
        cells = np.concatenate(
            [m.cells + offs[i] for i, m in enumerate(meshes)], axis=0
        )
        # dedupe with a true distance test: bucket by floor(v/tol) and search
        # the 3^dim neighboring buckets, so coincident vertices straddling a
        # rounding boundary still merge (first-occurrence order preserved)
        dim = verts.shape[1]
        key = np.floor(verts / tol).astype(np.int64)
        offsets = np.stack(
            np.meshgrid(*([np.array([-1, 0, 1])] * dim), indexing="ij"), axis=-1
        ).reshape(-1, dim)
        buckets: dict = {}  # bucket key -> list of representative indices
        rep_of = np.empty(len(verts), dtype=np.int64)
        rep_ids: List[int] = []
        for i in range(len(verts)):
            k = key[i]
            found = -1
            for off in offsets:
                for j in buckets.get(tuple(k + off), ()):
                    if np.abs(verts[rep_ids[j]] - verts[i]).max() <= tol:
                        found = j
                        break
                if found >= 0:
                    break
            if found < 0:
                found = len(rep_ids)
                rep_ids.append(i)
                buckets.setdefault(tuple(k), []).append(found)
            rep_of[i] = found
        new_verts = verts[np.asarray(rep_ids)]
        new_cells = rep_of[cells]
        return cls(new_verts, new_cells)

    def removed_cells(self, predicate: Callable[[np.ndarray], bool]) -> "QuadMesh":
        """New mesh without the cells whose center satisfies the predicate
        (GridGenerator::create_triangulation_with_removed_cells)."""
        centers = self.cell_centers()
        keep = np.array([not predicate(c) for c in centers])
        cells = self.cells[keep]
        used, inverse = np.unique(cells.reshape(-1), return_inverse=True)
        return QuadMesh(self.vertices[used], inverse.reshape(cells.shape))

    def moved_vertices(
        self, moves: List[Tuple[Tuple[float, float], Tuple[float, float], float]]
    ) -> None:
        """Move vertices matching (old_position, new_position, tol) — the
        reference's post-hoc vertex adjustment idiom
        (flow_past_cylinder.cc:205-240)."""
        for old, new, tol in moves:
            old = np.asarray(old)
            d = np.abs(self.vertices - old[None, :]).max(axis=1)
            hit = d < tol
            self.vertices[hit] = np.asarray(new)

    def distort_random(self, factor: float, seed: int = 0) -> None:
        """Randomly perturb interior vertices by factor * local edge length
        (GridTools::distort_random counterpart, for testing mapped kernels)."""
        rng = np.random.RandomState(seed)
        boundary_verts = set()
        for (a, b) in self.boundary_edge_keys:
            boundary_verts.add(a)
            boundary_verts.add(b)
        # min incident edge length per vertex
        minlen = np.full(self.n_vertices, np.inf)
        for (a, b) in self.edge_keys:
            l = np.linalg.norm(self.vertices[a] - self.vertices[b])
            minlen[a] = min(minlen[a], l)
            minlen[b] = min(minlen[b], l)
        for v in range(self.n_vertices):
            if v in boundary_verts:
                continue
            self.vertices[v] += factor * minlen[v] * (rng.rand(2) - 0.5)
        self._rebuild_edges()


_FLAT = FlatManifold()


# ---------------------------------------------------------------------------
class HexMesh:
    """3D unstructured mesh of AXIS-ALIGNED hexahedra.

    Covers the reference's extruded configurations
    (GridGenerator::extrude_triangulation in flow_past_square_cylinder.cc:
    a 2D quad mesh with removed cells swept in z): cells are boxes, so
    per-cell geometry is diagonal (h_cells) and the forest-style
    VariableCellEvaluator path applies; only the connectivity is
    unstructured. Local vertex order is lexicographic
    (v0=(0,0,0), v1=(1,0,0), v2=(0,1,0), ..., v7=(1,1,1))."""

    def __init__(self, vertices: np.ndarray, cells: np.ndarray) -> None:
        self.dim = 3
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.cells = np.asarray(cells, dtype=np.int64)
        self.periodic = [False] * 3
        self._face_boundary_id: Dict[Tuple[int, ...], int] = {}
        self._rebuild_faces()

    # local faces as vertex quadruples (any order; identity by sorted set)
    _LOCAL_FACES = (
        (0, 2, 4, 6),  # x=0
        (1, 3, 5, 7),  # x=1
        (0, 1, 4, 5),  # y=0
        (2, 3, 6, 7),  # y=1
        (0, 1, 2, 3),  # z=0
        (4, 5, 6, 7),  # z=1
    )

    def _rebuild_faces(self) -> None:
        count: Dict[Tuple[int, ...], int] = {}
        for cell in self.cells:
            for f in self._LOCAL_FACES:
                key = tuple(sorted(int(cell[i]) for i in f))
                count[key] = count.get(key, 0) + 1
        self.boundary_face_keys = [k for k, c in count.items() if c == 1]

    @property
    def n_cells(self) -> int:
        return len(self.cells)

    @property
    def n_vertices(self) -> int:
        return len(self.vertices)

    def cell_geometry(self):
        """(centers (E, 3), extents (E, 3)) — cells are axis-aligned boxes
        (the ForestMesh protocol, shared with the VTU writer)."""
        v = self.vertices[self.cells]  # (E, 8, 3)
        lo = v.min(axis=1)
        hi = v.max(axis=1)
        return 0.5 * (lo + hi), hi - lo

    @property
    def h_cells(self) -> np.ndarray:
        return self.cell_geometry()[1]

    @property
    def cell_diameter(self) -> float:
        h = self.h_cells
        return float(np.linalg.norm(h, axis=1).min())

    @property
    def last_cell_diameter(self) -> float:
        return float(np.linalg.norm(self.h_cells[-1]))

    def face_center(self, key) -> np.ndarray:
        return self.vertices[list(key)].mean(axis=0)

    def set_boundary_id_by_center(
        self, predicate: Callable[[np.ndarray], bool], boundary_id: int
    ) -> None:
        for key in self.boundary_face_keys:
            if predicate(self.face_center(key)):
                self._face_boundary_id[key] = boundary_id

    def boundary_id(self, key) -> int:
        return self._face_boundary_id.get(key, 0)

    def boundary_faces_with_id(self, boundary_id: int):
        return [
            k for k in self.boundary_face_keys if self.boundary_id(k) == boundary_id
        ]

    def all_boundary_ids(self) -> set:
        return {self.boundary_id(k) for k in self.boundary_face_keys}

    def set_periodic(self, axis: int) -> None:
        raise NotImplementedError(
            "periodicity on unstructured hex meshes is not supported"
        )

    def refine_global(self, times: int = 1) -> None:
        for _ in range(times):
            self._refine_once()

    def _refine_once(self) -> None:
        verts = list(self.vertices)
        cache: Dict[Tuple[int, ...], int] = {}

        def point(ids):
            key = tuple(sorted(ids))
            if key not in cache:
                cache[key] = len(verts)
                verts.append(self.vertices[list(key)].mean(axis=0))
            return cache[key]

        new_cells = []
        child_face_ids: Dict[Tuple[int, ...], int] = {}
        for cell in self.cells:
            c = [int(v) for v in cell]
            # lattice of 27 points: corners, edge/face/cell midpoints of the box
            lat = {}
            for iz in range(3):
                for iy in range(3):
                    for ix in range(3):
                        sel = []
                        for dz in ([0] if iz == 0 else [1] if iz == 2 else [0, 1]):
                            for dy in ([0] if iy == 0 else [1] if iy == 2 else [0, 1]):
                                for dx in ([0] if ix == 0 else [1] if ix == 2 else [0, 1]):
                                    sel.append(c[dz * 4 + dy * 2 + dx])
                        lat[(ix, iy, iz)] = (
                            sel[0] if len(sel) == 1 else point(sel)
                        )
            for oz in range(2):
                for oy in range(2):
                    for ox in range(2):
                        new_cells.append(
                            [
                                lat[(ox + dx, oy + dy, oz + dz)]
                                for dz in (0, 1)
                                for dy in (0, 1)
                                for dx in (0, 1)
                            ]
                        )
            # child boundary faces inherit the parent face id
            for f in self._LOCAL_FACES:
                key = tuple(sorted(c[i] for i in f))
                bid = self._face_boundary_id.get(key)
                if bid is None:
                    continue
                corners = [c[i] for i in f]
                mids = {}
                # children faces: 4 quads from corner+edge-mid+center points
                pts = {v: v for v in corners}
                # face lattice via the cached midpoint helper
                e01 = point([corners[0], corners[1]])
                e23 = point([corners[2], corners[3]])
                e02 = point([corners[0], corners[2]])
                e13 = point([corners[1], corners[3]])
                ctr = point(corners)
                quads = [
                    (corners[0], e01, e02, ctr),
                    (e01, corners[1], ctr, e13),
                    (e02, ctr, corners[2], e23),
                    (ctr, e13, e23, corners[3]),
                ]
                for q in quads:
                    child_face_ids[tuple(sorted(q))] = bid
        self.vertices = np.asarray(verts)
        self.cells = np.asarray(new_cells, dtype=np.int64)
        self._face_boundary_id = dict(child_face_ids)
        self._rebuild_faces()

    @classmethod
    def extrude(cls, quad_mesh: "QuadMesh", n_slices: int, height: float) -> "HexMesh":
        """Sweep a 2D quad mesh in z over n_slices planes
        (GridGenerator::extrude_triangulation)."""
        n_layers = n_slices - 1
        V2 = quad_mesh.n_vertices
        z = np.linspace(0.0, height, n_slices)
        verts = np.concatenate(
            [
                np.concatenate(
                    [quad_mesh.vertices, np.full((V2, 1), zz)], axis=1
                )
                for zz in z
            ]
        )
        cells = []
        for l in range(n_layers):
            lo = l * V2
            hi = (l + 1) * V2
            for q in quad_mesh.cells:
                cells.append(
                    [lo + q[0], lo + q[1], lo + q[2], lo + q[3],
                     hi + q[0], hi + q[1], hi + q[2], hi + q[3]]
                )
        return cls(verts, np.asarray(cells, dtype=np.int64))


# ---------------------------------------------------------------------------
class TriMesh:
    """2D unstructured triangle mesh (deal.II simplex-mesh support,
    parameters.cc 'simplex mesh'). Cells are (E, 3) vertex triples with
    positive orientation; geometry is affine per cell. Boundary ids live on
    boundary edges, assigned by center predicates like the reference drivers
    do (simplex_channel.cc:195-208)."""

    def __init__(self, vertices: np.ndarray, cells: np.ndarray) -> None:
        self.dim = 2
        self.is_simplex = True
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.cells = np.asarray(cells, dtype=np.int64)
        self._fix_orientation()
        self.periodic = [False, False]
        self._edge_boundary_id: Dict[Tuple[int, int], int] = {}
        self._rebuild_edges()

    def _fix_orientation(self) -> None:
        v = self.vertices[self.cells]
        e1 = v[:, 1] - v[:, 0]
        e2 = v[:, 2] - v[:, 0]
        det = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        flip = det < 0
        if flip.any():
            self.cells[flip] = self.cells[flip][:, [0, 2, 1]]

    _LOCAL_EDGES = ((0, 1), (1, 2), (2, 0))

    def _rebuild_edges(self) -> None:
        count: Dict[Tuple[int, int], int] = {}
        for cell in self.cells:
            for (a, b) in self._LOCAL_EDGES:
                key = (min(cell[a], cell[b]), max(cell[a], cell[b]))
                count[key] = count.get(key, 0) + 1
        self.edge_keys = sorted(count.keys())
        self.edge_index = {k: i for i, k in enumerate(self.edge_keys)}
        self.boundary_edge_keys = [k for k in self.edge_keys if count[k] == 1]

    @property
    def n_cells(self) -> int:
        return len(self.cells)

    @property
    def n_vertices(self) -> int:
        return len(self.vertices)

    @property
    def n_edges(self) -> int:
        return len(self.edge_keys)

    @property
    def cell_diameter(self) -> float:
        v = self.vertices[self.cells]
        e = [np.linalg.norm(v[:, a] - v[:, b], axis=1) for a, b in self._LOCAL_EDGES]
        return float(np.max(np.stack(e), axis=0).min())

    @property
    def last_cell_diameter(self) -> float:
        v = self.vertices[self.cells[-1]]
        return float(
            max(np.linalg.norm(v[a] - v[b]) for a, b in self._LOCAL_EDGES)
        )

    def cell_centers(self) -> np.ndarray:
        return self.vertices[self.cells].mean(axis=1)

    def edge_midpoint_flat(self, key: Tuple[int, int]) -> np.ndarray:
        return 0.5 * (self.vertices[key[0]] + self.vertices[key[1]])

    def set_boundary_id_by_center(
        self, predicate: Callable[[np.ndarray], bool], boundary_id: int
    ) -> None:
        for key in self.boundary_edge_keys:
            if predicate(self.edge_midpoint_flat(key)):
                self._edge_boundary_id[key] = boundary_id

    def boundary_id(self, key: Tuple[int, int]) -> int:
        return self._edge_boundary_id.get(key, 0)

    def boundary_edges_with_id(self, boundary_id: int) -> List[Tuple[int, int]]:
        return [
            k for k in self.boundary_edge_keys if self.boundary_id(k) == boundary_id
        ]

    def all_boundary_ids(self) -> set:
        return {self.boundary_id(k) for k in self.boundary_edge_keys}

    def set_periodic(self, axis: int) -> None:
        raise NotImplementedError("periodicity on simplex meshes is not supported")

    def refine_global(self, times: int = 1) -> None:
        """Red refinement: each triangle splits into 4 via edge midpoints."""
        for _ in range(times):
            verts = list(self.vertices)
            mid: Dict[Tuple[int, int], int] = {}

            def midpoint(a, b):
                key = (min(a, b), max(a, b))
                if key not in mid:
                    mid[key] = len(verts)
                    verts.append(0.5 * (self.vertices[key[0]] + self.vertices[key[1]]))
                return mid[key]

            new_cells = []
            child_ids: Dict[Tuple[int, int], int] = {}
            for cell in self.cells:
                v0, v1, v2 = (int(c) for c in cell)
                m01 = midpoint(v0, v1)
                m12 = midpoint(v1, v2)
                m20 = midpoint(v2, v0)
                new_cells += [
                    [v0, m01, m20],
                    [m01, v1, m12],
                    [m20, m12, v2],
                    [m01, m12, m20],
                ]
                for (a, b) in self._LOCAL_EDGES:
                    pa, pb = int(cell[a]), int(cell[b])
                    key = (min(pa, pb), max(pa, pb))
                    bid = self._edge_boundary_id.get(key)
                    if bid is not None:
                        m = mid[key]
                        for child in ((pa, m), (m, pb)):
                            child_ids[(min(child), max(child))] = bid
            self.vertices = np.asarray(verts)
            self.cells = np.asarray(new_cells, dtype=np.int64)
            self._edge_boundary_id = dict(child_ids)
            self._rebuild_edges()

    @classmethod
    def subdivided_hyper_rectangle_with_simplices(
        cls, subdivisions, bottom_left, top_right
    ) -> "TriMesh":
        """Each rectangle cell split into two triangles (deal.II
        GridGenerator::subdivided_hyper_rectangle_with_simplices)."""
        nx, ny = subdivisions
        x = np.linspace(bottom_left[0], top_right[0], nx + 1)
        y = np.linspace(bottom_left[1], top_right[1], ny + 1)
        X, Y = np.meshgrid(x, y, indexing="xy")
        verts = np.stack([X.reshape(-1), Y.reshape(-1)], axis=1)

        def vid(i, j):
            return j * (nx + 1) + i

        cells = []
        for j in range(ny):
            for i in range(nx):
                a, b = vid(i, j), vid(i + 1, j)
                c, d = vid(i, j + 1), vid(i + 1, j + 1)
                cells.append([a, b, c])
                cells.append([b, d, c])
        return cls(verts, np.asarray(cells))


def read_msh(path: str):
    """Read a Gmsh ASCII .msh file, versions 2.2 and 4.1 (the formats of
    the reference's meshes: tests/simplex_channel_*.msh are 4.1,
    applications/microfluidic_2D.msh is 2.2). Returns a TriMesh (triangle
    elements) or QuadMesh (quadrilateral elements); 2D only."""
    with open(path) as f:
        lines = [l.strip() for l in f]
    i = 0

    def section(name):
        nonlocal i
        while i < len(lines) and lines[i] != f"${name}":
            i += 1
        if i == len(lines):
            raise ValueError(f"section {name} not found in {path}")
        i += 1

    section("MeshFormat")
    version = lines[i].split()[0]
    if version.startswith("2"):
        return _read_msh_v2(lines, i, path)
    if not version.startswith("4"):
        raise NotImplementedError(f"msh version {version}; only 2.x/4.x supported")

    section("Nodes")
    n_blocks, n_nodes = (int(v) for v in lines[i].split()[:2])
    i += 1
    coords = np.zeros((n_nodes + 1, 3))  # gmsh tags are 1-based
    for _ in range(n_blocks):
        _, _, _, n_in_block = (int(v) for v in lines[i].split())
        i += 1
        tags = [int(lines[i + k]) for k in range(n_in_block)]
        i += n_in_block
        for k in range(n_in_block):
            coords[tags[k]] = [float(v) for v in lines[i + k].split()]
        i += n_in_block

    section("Elements")
    n_blocks, _ = (int(v) for v in lines[i].split()[:2])
    i += 1
    tris, quads = [], []
    for _ in range(n_blocks):
        _, _, el_type, n_in_block = (int(v) for v in lines[i].split())
        i += 1
        for k in range(n_in_block):
            parts = [int(v) for v in lines[i + k].split()]
            if el_type == 2:  # 3-node triangle
                tris.append(parts[1:4])
            elif el_type == 3:  # 4-node quadrangle (gmsh: ccw corner order)
                a, b, c, d = parts[1:5]
                quads.append([a, b, d, c])  # to lexicographic local order
        i += n_in_block

    # compress node numbering to used nodes
    if tris:
        cells = np.asarray(tris, dtype=np.int64)
    elif quads:
        cells = np.asarray(quads, dtype=np.int64)
    else:
        raise ValueError(f"no triangle/quad elements in {path}")
    used, inverse = np.unique(cells.reshape(-1), return_inverse=True)
    verts = coords[used][:, :2]
    cells = inverse.reshape(cells.shape)
    return TriMesh(verts, cells) if tris else QuadMesh(verts, cells)


def _read_msh_v2(lines, i, path):
    """Gmsh 2.2 ASCII: $Nodes <n> / tag x y z; $Elements <n> /
    tag type n_tags <tags...> <nodes...>."""

    def section(name):
        nonlocal i
        while i < len(lines) and lines[i] != f"${name}":
            i += 1
        if i == len(lines):
            raise ValueError(f"section {name} not found in {path}")
        i += 1

    section("Nodes")
    n_nodes = int(lines[i])
    i += 1
    coords = np.zeros((n_nodes + 1, 3))
    for k in range(n_nodes):
        parts = lines[i + k].split()
        coords[int(parts[0])] = [float(v) for v in parts[1:4]]
    i += n_nodes

    section("Elements")
    n_el = int(lines[i])
    i += 1
    tris, quads = [], []
    for k in range(n_el):
        parts = [int(v) for v in lines[i + k].split()]
        el_type = parts[1]
        n_tags = parts[2]
        nodes = parts[3 + n_tags :]
        if el_type == 2:
            tris.append(nodes[:3])
        elif el_type == 3:
            a, b, c, d = nodes[:4]
            quads.append([a, b, d, c])  # ccw corner -> lexicographic order
    if tris:
        cells = np.asarray(tris, dtype=np.int64)
    elif quads:
        cells = np.asarray(quads, dtype=np.int64)
    else:
        raise ValueError(f"no triangle/quad elements in {path}")
    used, inverse = np.unique(cells.reshape(-1), return_inverse=True)
    verts = coords[used][:, :2]
    cells = inverse.reshape(cells.shape)
    return TriMesh(verts, cells) if tris else QuadMesh(verts, cells)
