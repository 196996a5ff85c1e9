"""P_k finite elements on triangles (deal.II FE_SimplexP + QGaussSimplex).

The reference supports simplex meshes throughout the NS solver
(parameters.cc 'simplex mesh'; navier_stokes.cc FE_SimplexP branch,
tests/simplex_channel.cc, simplex_bubble.cc). Here: barycentric Lagrange
bases of degree 1/2 on the unit triangle ((0,0),(1,0),(0,1)), symmetric
Gauss-like simplex quadrature rules matching deal.II's QGaussSimplex point
counts, and a continuous SimplexSpace with vertex + edge-midpoint dof
numbering feeding the same index-map operator path as the mapped quad
spaces (ops/mapped.py SimplexEvaluator).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from adaflo_tpu.fe.basis import gauss_quadrature
from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.mesh.unstructured import TriMesh


def simplex_quadrature(n_points_1d: int) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric quadrature on the unit triangle, by deal.II QGaussSimplex
    naming: n=1 -> centroid (order 1), n=2 -> 3 points (order 2), n=3 -> 7
    points (order 5), n=4 -> 15 points (order 7). Weights sum to 1/2."""
    if n_points_1d == 1:
        return np.array([[1 / 3, 1 / 3]]), np.array([0.5])
    if n_points_1d == 2:
        pts = np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]])
        return pts, np.full(3, 1 / 6)
    if n_points_1d == 3:
        s = np.sqrt(15.0)
        a = (6.0 - s) / 21.0
        b = (6.0 + s) / 21.0
        wa = (155.0 - s) / 2400.0
        wb = (155.0 + s) / 2400.0
        pts = np.array(
            [
                [1 / 3, 1 / 3],
                [a, a], [1 - 2 * a, a], [a, 1 - 2 * a],
                [b, b], [1 - 2 * b, b], [b, 1 - 2 * b],
            ]
        )
        w = np.array([9.0 / 80.0, wa, wa, wa, wb, wb, wb])
        return pts, w
    if n_points_1d >= 4:
        # conical-product rule: x = xi (1 - eta), y = eta with Gauss-Legendre
        # in xi (n points) and in eta (n+1 points, the (1 - eta) Jacobi
        # factor absorbed into the weight) — exact to total degree 2n-1
        n = n_points_1d
        xi, wx = gauss_quadrature(n)
        eta, we = gauss_quadrature(n + 1)
        X = np.outer(1.0 - eta, xi).reshape(-1)
        Y = np.repeat(eta, n)
        W = (np.outer(we * (1.0 - eta), wx)).reshape(-1)
        return np.stack([X, Y], axis=1), W
    raise ValueError(n_points_1d)


class SimplexElement:
    """Lagrange P_k basis on the unit triangle; tabulates dense (n_q, n_loc)
    value and (n_q, n_loc, 2) gradient matrices."""

    def __init__(self, degree: int) -> None:
        assert degree in (1, 2), "FE_SimplexP degrees 1 and 2 supported"
        self.degree = degree
        self.n_local = 3 if degree == 1 else 6
        # node positions: vertices, then edge midpoints of (0,1),(1,2),(2,0)
        verts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        if degree == 1:
            self.nodes = verts
        else:
            mids = np.array([[0.5, 0.0], [0.5, 0.5], [0.0, 0.5]])
            self.nodes = np.concatenate([verts, mids])

    def tabulate(self, pts: np.ndarray):
        x, y = pts[:, 0], pts[:, 1]
        l0, l1, l2 = 1.0 - x - y, x, y
        dl = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])  # grad lambda_i
        n = len(pts)
        if self.degree == 1:
            V = np.stack([l0, l1, l2], axis=1)
            D = np.broadcast_to(dl[None], (n, 3, 2)).copy()
            return V, D
        lam = [l0, l1, l2]
        V = np.empty((n, 6))
        D = np.empty((n, 6, 2))
        for i in range(3):
            V[:, i] = lam[i] * (2 * lam[i] - 1)
            D[:, i, :] = (4 * lam[i] - 1)[:, None] * dl[i][None, :]
        edges = ((0, 1), (1, 2), (2, 0))
        for k, (i, j) in enumerate(edges):
            V[:, 3 + k] = 4 * lam[i] * lam[j]
            D[:, 3 + k, :] = 4 * (
                lam[i][:, None] * dl[j][None, :] + lam[j][:, None] * dl[i][None, :]
            )
        return V, D


class SimplexSpace:
    """Continuous P_k space on a TriMesh; API-compatible with MappedSpace
    (index-map operator path, `is_mapped` routing)."""

    is_forest = False
    is_mapped = True
    is_simplex = True

    def __init__(self, mesh: TriMesh, degree: int) -> None:
        self.mesh = mesh
        self.dim = 2
        self.degree = degree
        self.element = SimplexElement(degree)
        self._n_dofs_padded: Optional[int] = None
        self.hanging_slave = np.empty(0, dtype=np.int64)
        self.hanging_master = np.empty(0, dtype=np.int64)
        self.hanging_weight = np.empty(0)
        self._build_dofs()
        self._build_edge_adjacency()

    def _build_dofs(self) -> None:
        mesh = self.mesh
        k = self.degree
        V = mesh.n_vertices
        if k == 1:
            self.n_dofs = V
            self.cell_dofs = mesh.cells.copy()
            self.node_coords = mesh.vertices.copy()
            return
        self.n_dofs = V + mesh.n_edges
        E = mesh.n_cells
        cd = np.empty((E, 6), dtype=np.int64)
        cd[:, :3] = mesh.cells
        for e, cell in enumerate(mesh.cells):
            for k_e, (a, b) in enumerate(TriMesh._LOCAL_EDGES):
                key = (min(cell[a], cell[b]), max(cell[a], cell[b]))
                cd[e, 3 + k_e] = V + mesh.edge_index[key]
        self.cell_dofs = cd
        coords = np.empty((self.n_dofs, 2))
        coords[:V] = mesh.vertices
        for key, idx in mesh.edge_index.items():
            coords[V + idx] = 0.5 * (mesh.vertices[key[0]] + mesh.vertices[key[1]])
        self.node_coords = coords

    def _build_edge_adjacency(self) -> None:
        adj: Dict[Tuple[int, int], Tuple[int, int]] = {}
        for e, cell in enumerate(self.mesh.cells):
            for lf, (a, b) in enumerate(TriMesh._LOCAL_EDGES):
                key = (min(cell[a], cell[b]), max(cell[a], cell[b]))
                adj.setdefault(key, (e, lf))
        self._edge_adj = adj

    @property
    def n_local(self) -> int:
        return self.element.n_local

    @property
    def n_cells(self) -> int:
        return self.mesh.n_cells

    @property
    def n_dofs_padded(self) -> int:
        return self._n_dofs_padded or self.n_dofs

    def set_padding(self, multiple: int) -> None:
        self._n_dofs_padded = -(-self.n_dofs // multiple) * multiple

    # -- boundary queries ----------------------------------------------------
    def _edge_dofs(self, key: Tuple[int, int]) -> np.ndarray:
        out = [key[0], key[1]]
        if self.degree == 2:
            out.append(self.mesh.n_vertices + self.mesh.edge_index[key])
        return np.asarray(out, dtype=np.int64)

    def boundary_dofs(self, bid: int) -> np.ndarray:
        keys = self.mesh.boundary_edges_with_id(bid)
        if not keys:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate([self._edge_dofs(k) for k in keys]))

    def all_boundary_dofs(self) -> np.ndarray:
        keys = self.mesh.boundary_edge_keys
        if not keys:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate([self._edge_dofs(k) for k in keys]))

    def boundary_face_quadrature_normals(self, bid: int, n_q_1d: int):
        """Straight-edge surface quadrature (MappedSpace-compatible):
        (face_dofs, qcoords, V_face, jxw, normals)."""
        keys = self.mesh.boundary_edges_with_id(bid)
        if not keys:
            return None
        q1, w1 = gauss_quadrature(n_q_1d)
        # 1D trace basis on the edge: nodes [0, 1] (+ midpoint for P2)
        if self.degree == 1:
            V_face = np.stack([1 - q1, q1], axis=1)
            n_fd = 2
        else:
            V_face = np.stack(
                [
                    (1 - q1) * (1 - 2 * q1),
                    q1 * (2 * q1 - 1),
                    4 * q1 * (1 - q1),
                ],
                axis=1,
            )
            n_fd = 3
        F = len(keys)
        face_dofs = np.empty((F, n_fd), dtype=np.int64)
        qcoords = np.empty((F, n_q_1d, 2))
        jxw = np.empty((F, n_q_1d))
        normals = np.empty((F, n_q_1d, 2))
        centers = self.mesh.cell_centers()
        for i, key in enumerate(keys):
            e, lf = self._edge_adj[key]
            cell = self.mesh.cells[e]
            a, b = TriMesh._LOCAL_EDGES[lf]
            va, vb = int(cell[a]), int(cell[b])
            dofs = [va, vb]
            if self.degree == 2:
                dofs.append(self.mesh.n_vertices + self.mesh.edge_index[key])
            face_dofs[i] = dofs
            pa, pb = self.mesh.vertices[va], self.mesh.vertices[vb]
            qcoords[i] = pa[None, :] + q1[:, None] * (pb - pa)[None, :]
            tang = pb - pa
            tlen = np.linalg.norm(tang)
            jxw[i] = w1 * tlen
            nrm = np.array([tang[1], -tang[0]]) / tlen
            if np.dot(nrm, qcoords[i].mean(axis=0) - centers[e]) < 0:
                nrm = -nrm
            normals[i] = nrm[None, :]
        return face_dofs, qcoords, V_face, jxw, normals

    def boundary_normal_axis_dofs(self, bid: int) -> List[Tuple[int, np.ndarray]]:
        """(normal axis, dofs) per axis-aligned boundary line with this id
        (symmetry / normal-flux constraints)."""
        by_axis: Dict[int, List[np.ndarray]] = {}
        for key in self.mesh.boundary_edges_with_id(bid):
            t = self.mesh.vertices[key[1]] - self.mesh.vertices[key[0]]
            if abs(t[0]) < 1e-12 * abs(t[1]):
                axis = 0
            elif abs(t[1]) < 1e-12 * abs(t[0]):
                axis = 1
            else:
                raise NotImplementedError(
                    "symmetry/normal-flux on non-axis-aligned boundary edges"
                )
            by_axis.setdefault(axis, []).append(self._edge_dofs(key))
        return [
            (axis, np.unique(np.concatenate(lst))) for axis, lst in by_axis.items()
        ]

    def make_constraints(self, dirichlet: Optional[np.ndarray] = None) -> Constraints:
        con = Constraints(self.n_dofs)
        if dirichlet is not None and len(dirichlet):
            con.add_dirichlet(dirichlet)
        con.close()
        return con


def simplex_cell_diameters(mesh: TriMesh):
    """(per-cell max |eigenvalue of the affine Jacobian|, global min, global
    max) — the simplex counterpart of compute_cell_diameters (util.h)."""
    v = mesh.vertices[mesh.cells]
    J = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]], axis=-1)  # (E,2,2)
    tr = J[:, 0, 0] + J[:, 1, 1]
    det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
    disc_sq = tr * tr / 4.0 - det
    s = np.sqrt(np.maximum(disc_sq, 0.0))
    real_max = np.maximum(np.abs(tr / 2.0 + s), np.abs(tr / 2.0 - s))
    real_min = np.minimum(np.abs(tr / 2.0 + s), np.abs(tr / 2.0 - s))
    # complex pair (disc_sq < 0): |lambda| = sqrt(det)
    cmod = np.sqrt(np.abs(det))
    lam_max = np.where(disc_sq >= 0, real_max, cmod)
    lam_min = np.where(disc_sq >= 0, real_min, cmod)
    return lam_max, float(lam_min.min()), float(lam_max.max())
