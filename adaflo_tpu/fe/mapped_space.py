"""Q_k spaces and MappingQ-style geometry on unstructured quad meshes.

The unstructured counterpart of fe/space.py (structured lattices) and
fe/forest_space.py (adaptive forests): dofs are numbered by entity (vertex /
edge-interior / cell-interior) with orientation-aware edge slots, exactly
deal.II's DoFHandler layout on a general Triangulation, and geometry is a
single polynomial mapping shared by every space on the mesh — the analog of
the reference's MappingQ(3) default (flow_base_algorithm.cc:44-46).

CellMapping builds per-cell mapping support points by transfinite
interpolation of the 4 edge curves (each edge evaluated through its
manifold, so cylinder-boundary cells are genuinely curved); Jacobians at
arbitrary reference points feed ops/mapped.py's MappedEvaluator.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from adaflo_tpu.fe.basis import LagrangeBasis1D, gauss_quadrature
from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.mesh.unstructured import QuadMesh

# local lattice: flat = iy * n1 + ix (x fastest). Cell-local edges with
# (param start vertex, end vertex) in cell-local vertex numbers:
# bottom v0->v1, top v2->v3, left v0->v2, right v1->v3.
_EDGE_DEFS = ((0, 1), (2, 3), (0, 2), (1, 3))  # matches QuadMesh._LOCAL_EDGES


class CellMapping:
    """Polynomial Q_m mapping of every cell, from transfinite interpolation
    of the (possibly curved) edges."""

    def __init__(
        self, mesh: QuadMesh, degree: int = 3, point_distribution: str = "gauss_lobatto"
    ) -> None:
        self.mesh = mesh
        self.degree = degree
        self.basis = LagrangeBasis1D(degree, point_distribution)
        self._build_support_points()

    def _edge_points(self, va: int, vb: int, fracs: np.ndarray) -> np.ndarray:
        """Points on the edge curve (va -> vb) at parameter fractions."""
        mesh = self.mesh
        key = (min(va, vb), max(va, vb))
        man = mesh.edge_manifold(key)
        pa, pb = mesh.vertices[va], mesh.vertices[vb]
        return np.stack([man.get_intermediate(pa, pb, float(t)) for t in fracs])

    def _build_support_points(self) -> None:
        mesh = self.mesh
        m = self.degree
        n1 = m + 1
        f = self.basis.nodes  # (n1,)
        E = mesh.n_cells
        S = np.empty((E, n1 * n1, 2))
        for e, cell in enumerate(mesh.cells):
            v = mesh.vertices[cell]  # (4, 2) local order
            B = self._edge_points(cell[0], cell[1], f)  # bottom: t = fx
            T = self._edge_points(cell[2], cell[3], f)
            L = self._edge_points(cell[0], cell[2], f)  # left: t = fy
            R = self._edge_points(cell[1], cell[3], f)
            fx = f[None, :, None]  # (1, n1, 1)
            fy = f[:, None, None]  # (n1, 1, 1)
            X = (
                (1 - fy) * B[None, :, :]
                + fy * T[None, :, :]
                + (1 - fx) * L[:, None, :]
                + fx * R[:, None, :]
                - (
                    (1 - fx) * (1 - fy) * v[0]
                    + fx * (1 - fy) * v[1]
                    + (1 - fx) * fy * v[2]
                    + fx * fy * v[3]
                )
            )  # (n1(y), n1(x), 2)
            S[e] = X.reshape(n1 * n1, 2)
        self.support_points = S

    # ------------------------------------------------------------------
    def tabulate(self, ref_pts: np.ndarray):
        """Mapping shape values/gradients at reference points (n_p, 2):
        (Vm (n_p, n_map), Dm (n_p, n_map, 2))."""
        V1x, D1x = self.basis.tabulate(ref_pts[:, 0])
        V1y, D1y = self.basis.tabulate(ref_pts[:, 1])
        # phi_{jy,jx}(p) = V1y[p,jy] * V1x[p,jx]
        Vm = np.einsum("pj,pi->pji", V1y, V1x).reshape(len(ref_pts), -1)
        Dx = np.einsum("pj,pi->pji", V1y, D1x).reshape(len(ref_pts), -1)
        Dy = np.einsum("pj,pi->pji", D1y, V1x).reshape(len(ref_pts), -1)
        return Vm, np.stack([Dx, Dy], axis=-1)

    def jacobians(self, ref_pts: np.ndarray):
        """(J (E, n_p, 2, 2), X (E, n_p, 2)) at reference points; J[.,.,a,b]
        = d x_a / d xi_b."""
        Vm, Dm = self.tabulate(ref_pts)
        S = self.support_points  # (E, n_map, 2)
        X = np.einsum("pi,eia->epa", Vm, S)
        J = np.einsum("pib,eia->epab", Dm, S)
        return J, X

    def map_points(self, ref_pts: np.ndarray) -> np.ndarray:
        """(E, n_p, 2) physical coordinates of reference points."""
        Vm, _ = self.tabulate(ref_pts)
        return np.einsum("pi,eia->epa", Vm, self.support_points)

    def cell_diameters(self):
        """(per-cell max |eigenvalue of J|, global min, global max) probed at
        the 4 face centers + cell center — compute_cell_diameters
        (util.h:47-120)."""
        probes = np.array(
            [[0.0, 0.5], [1.0, 0.5], [0.5, 0.0], [0.5, 1.0], [0.5, 0.5]]
        )
        J, _ = self.jacobians(probes)  # (E, 5, 2, 2)
        tr = J[..., 0, 0] + J[..., 1, 1]
        det = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
        disc2 = tr * tr / 4.0 - det
        disc = np.sqrt(np.maximum(disc2, 0.0))
        lam1 = np.abs(tr / 2.0 + disc)
        lam2 = np.abs(tr / 2.0 - disc)
        # complex eigenvalue pair (strongly sheared cell): |lambda| = sqrt(det)
        # for both — mirror simplex_cell_diameters' handling
        cplx = disc2 < 0.0
        lam_c = np.sqrt(np.abs(det))
        lam1 = np.where(cplx, lam_c, lam1)
        lam2 = np.where(cplx, lam_c, lam2)
        per_cell_max = np.maximum(lam1, lam2).max(axis=1)  # (E,)
        gmin = float(np.minimum(lam1, lam2).min())
        gmax = float(per_cell_max.max())
        return per_cell_max, gmin, gmax

    def face_support_points(self, cell: int, local_face: int) -> np.ndarray:
        """Mapping support points on a local face, in face-parameter order
        (the cell-local edge direction): (m+1, 2)."""
        m = self.degree
        n1 = m + 1
        sl = {
            0: np.arange(n1),  # bottom: iy=0, ix=0..m
            1: m * n1 + np.arange(n1),  # top
            2: np.arange(n1) * n1,  # left: ix=0, iy=0..m
            3: np.arange(n1) * n1 + m,  # right
        }[local_face]
        return self.support_points[cell][sl]


class MappedSpace:
    """Continuous Q_k space on an unstructured QuadMesh.

    API-compatible with ScalarSpace/ForestSpace where the operators and the
    NS solver need it; `is_mapped` routes the index-map + MappedEvaluator
    path."""

    is_forest = False
    is_mapped = True

    def __init__(
        self,
        mesh: QuadMesh,
        degree: int,
        mapping: CellMapping,
        point_distribution: str = "gauss_lobatto",
    ) -> None:
        self.mesh = mesh
        self.dim = 2
        self.degree = degree
        self.mapping = mapping
        self.basis = LagrangeBasis1D(degree, point_distribution)
        self._build_edge_adjacency()
        self._build_dofs()
        self._n_dofs_padded: Optional[int] = None
        # no hanging nodes on conforming unstructured meshes
        self.hanging_slave = np.empty(0, dtype=np.int64)
        self.hanging_master = np.empty(0, dtype=np.int64)
        self.hanging_weight = np.empty(0)

    # -- adjacency -------------------------------------------------------
    def _build_edge_adjacency(self) -> None:
        """First (cell, local_face) adjacent to each edge (for boundary
        edges this is THE adjacent cell)."""
        adj: Dict[Tuple[int, int], Tuple[int, int]] = {}
        for e, cell in enumerate(self.mesh.cells):
            for lf, (a, b) in enumerate(_EDGE_DEFS):
                key = (min(cell[a], cell[b]), max(cell[a], cell[b]))
                adj.setdefault(key, (e, lf))
        self._edge_adj = adj

    # -- numbering ---------------------------------------------------------
    def _build_dofs(self) -> None:
        mesh = self.mesh
        k = self.degree
        n1 = k + 1
        V = mesh.n_vertices
        n_edge_int = k - 1
        edge_base = V
        cell_base = V + mesh.n_edges * n_edge_int
        self.n_dofs = cell_base + mesh.n_cells * n_edge_int**2
        E = mesh.n_cells
        cd = np.empty((E, n1 * n1), dtype=np.int64)
        for e, cell in enumerate(mesh.cells):
            lat = np.empty((n1, n1), dtype=np.int64)
            # corners
            lat[0, 0] = cell[0]
            lat[0, k] = cell[1]
            lat[k, 0] = cell[2]
            lat[k, k] = cell[3]
            if k > 1:
                # edges: local index along the edge param 1..k-1
                for lf, (a, b) in enumerate(_EDGE_DEFS):
                    va, vb = int(cell[a]), int(cell[b])
                    key = (min(va, vb), max(va, vb))
                    eidx = mesh.edge_index[key]
                    base = edge_base + eidx * n_edge_int
                    loc = np.arange(1, k)
                    slot = (loc - 1) if va == key[0] else (k - 1 - loc)
                    g = base + slot
                    if lf == 0:
                        lat[0, 1:k] = g
                    elif lf == 1:
                        lat[k, 1:k] = g
                    elif lf == 2:
                        lat[1:k, 0] = g
                    else:
                        lat[1:k, k] = g
                # interior
                base = cell_base + e * n_edge_int**2
                lat[1:k, 1:k] = base + np.arange(n_edge_int**2).reshape(
                    n_edge_int, n_edge_int
                )
            cd[e] = lat.reshape(-1)
        self.cell_dofs = cd
        # node coordinates: mapping evaluated at the FE lattice fractions,
        # first-occurrence representative per dof
        f = self.basis.nodes
        fx, fy = np.meshgrid(f, f, indexing="xy")
        ref = np.stack([fx.reshape(-1), fy.reshape(-1)], axis=1)
        pts = self.mapping.map_points(ref)  # (E, n_loc, 2)
        coords = np.zeros((self.n_dofs, 2))
        flat_dofs = cd.reshape(-1)
        flat_pts = pts.reshape(-1, 2)
        # reversed so earlier occurrences win
        coords[flat_dofs[::-1]] = flat_pts[::-1]
        self.node_coords = coords

    @property
    def n_local(self) -> int:
        return (self.degree + 1) ** self.dim

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
        k = self.degree
        out = [key[0], key[1]]
        if k > 1:
            base = self.mesh.n_vertices + self.mesh.edge_index[key] * (k - 1)
            out.extend(range(base, base + k - 1))
        return np.asarray(out, dtype=np.int64)

    def boundary_dofs(self, bid: int) -> np.ndarray:
        keys = self.mesh.boundary_edges_with_id(bid)
        if not keys:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate([self._edge_dofs(key) for key in keys]))

    def all_boundary_dofs(self) -> np.ndarray:
        keys = self.mesh.boundary_edge_keys
        if not keys:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate([self._edge_dofs(key) for key in keys]))

    def _face_local_flat(self, local_face: int) -> np.ndarray:
        """FE local lattice flat indices on a face, in face-param order."""
        k = self.degree
        n1 = k + 1
        return {
            0: np.arange(n1),
            1: k * n1 + np.arange(n1),
            2: np.arange(n1) * n1,
            3: np.arange(n1) * n1 + k,
        }[local_face]

    def boundary_face_quadrature_normals(self, bid: int, n_q_1d: int):
        """Surface-integral data on the boundary faces with the given id:
        (face_dofs (F, n1), qcoords (F, n_q, 2), V_face (n_q, n1),
        jxw (F, n_q), normals (F, n_q, 2)) — normals outward, jxw includes
        the curved-edge arc-length factor."""
        keys = self.mesh.boundary_edges_with_id(bid)
        if not keys:
            return None
        q1, w1 = gauss_quadrature(n_q_1d)
        V_face, _ = self.basis.tabulate(q1)  # (n_q, n1)
        Vm1, Dm1 = self.mapping.basis.tabulate(q1)  # (n_q, m+1)
        F = len(keys)
        n1 = self.degree + 1
        face_dofs = np.empty((F, n1), dtype=np.int64)
        qcoords = np.empty((F, n_q_1d, 2))
        jxw = np.empty((F, n_q_1d))
        normals = np.empty((F, n_q_1d, 2))
        cell_centers = self.mesh.cell_centers()
        for i, key in enumerate(keys):
            e, lf = self._edge_adj[key]
            face_dofs[i] = self.cell_dofs[e, self._face_local_flat(lf)]
            S = self.mapping.face_support_points(e, lf)  # (m+1, 2)
            qcoords[i] = Vm1 @ S
            tang = Dm1 @ S  # (n_q, 2)
            tlen = np.linalg.norm(tang, axis=1)
            jxw[i] = w1 * tlen
            nrm = np.stack([tang[:, 1], -tang[:, 0]], axis=1) / tlen[:, None]
            # orient outward (away from the adjacent cell center)
            mid = qcoords[i].mean(axis=0)
            if np.dot(nrm.mean(axis=0), mid - cell_centers[e]) < 0:
                nrm = -nrm
            normals[i] = nrm
        return face_dofs, qcoords, V_face, jxw, normals

    def boundary_normal_axis_dofs(self, bid: int) -> List[Tuple[int, np.ndarray]]:
        """(normal axis, dofs) per axis-aligned boundary plane with this id
        (symmetry / normal-flux constraints). Curved edges with such
        conditions are rejected."""
        by_axis: Dict[int, List[np.ndarray]] = {}
        for key in self.mesh.boundary_edges_with_id(bid):
            t = self.mesh.vertices[key[1]] - self.mesh.vertices[key[0]]
            if abs(t[0]) < 1e-12 * abs(t[1]):
                axis = 0  # vertical edge -> x-normal
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

    # -- constraints helper (test convenience) --------------------------------
    def make_constraints(self, dirichlet: Optional[np.ndarray] = None) -> Constraints:
        con = Constraints(self.n_dofs)
        if dirichlet is not None and len(dirichlet):
            con.add_dirichlet(dirichlet)
        con.close()
        return con
