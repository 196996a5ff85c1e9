"""Q_k spaces on unstructured axis-aligned hexahedral meshes.

The 3D counterpart of fe/mapped_space.py for the reference's extruded
configurations (flow_past_square_cylinder.cc, micro_particle.cc): cells are
boxes, so geometry rides the per-cell-Cartesian VariableCellEvaluator path
(like the forest), while dof numbering is entity-based on the general
connectivity (vertices / edges / faces / cell interiors — deal.II DoFHandler
layout). Degrees 1 and 2 (single interior dof per entity, no orientation
bookkeeping needed).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from adaflo_tpu.fe.basis import LagrangeBasis1D, gauss_quadrature
from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.mesh.unstructured import HexMesh


class Hex3DSpace:
    """Continuous Q_k (k <= 2) space on a HexMesh; rides the index-map
    operator path with per-cell Cartesian geometry (`h_cells`)."""

    is_forest = False
    is_mapped = True

    def __init__(
        self, mesh: HexMesh, degree: int, point_distribution: str = "gauss_lobatto"
    ) -> None:
        assert degree in (1, 2), "Hex3DSpace supports degrees 1 and 2"
        self.mesh = mesh
        self.dim = 3
        self.degree = degree
        self.basis = LagrangeBasis1D(degree, point_distribution)
        self._n_dofs_padded: Optional[int] = None
        self.hanging_slave = np.empty(0, dtype=np.int64)
        self.hanging_master = np.empty(0, dtype=np.int64)
        self.hanging_weight = np.empty(0)
        self._build_dofs()
        self._build_face_adjacency()

    # ------------------------------------------------------------------
    def _build_dofs(self) -> None:
        mesh = self.mesh
        k = self.degree
        n1 = k + 1
        E = mesh.n_cells
        if k == 1:
            self.n_dofs = mesh.n_vertices
            self.cell_dofs = mesh.cells.copy()
        else:
            # entity keys per local lattice node; number edges/faces on the
            # fly via dictionaries
            edge_ids: Dict[Tuple[int, int], int] = {}
            face_ids: Dict[Tuple[int, ...], int] = {}
            nv = mesh.n_vertices

            def edge_id(a, b):
                key = (min(a, b), max(a, b))
                if key not in edge_ids:
                    edge_ids[key] = len(edge_ids)
                return edge_ids[key]

            def face_id(ids):
                key = tuple(sorted(ids))
                if key not in face_ids:
                    face_ids[key] = len(face_ids)
                return face_ids[key]

            # first pass: enumerate entities in deterministic cell order
            edge_slots = np.empty((E, 27), dtype=np.int64)
            kinds = np.empty((E, 27), dtype=np.int8)  # 0 v, 1 e, 2 f, 3 c
            for e, cell in enumerate(mesh.cells):
                c = [int(v) for v in cell]
                flat = 0
                for iz in range(3):
                    for iy in range(3):
                        for ix in range(3):
                            ends = [ix in (0, 2), iy in (0, 2), iz in (0, 2)]
                            sel = []
                            for dz in ([iz // 2] if ends[2] else [0, 1]):
                                for dy in ([iy // 2] if ends[1] else [0, 1]):
                                    for dx in ([ix // 2] if ends[0] else [0, 1]):
                                        sel.append(c[dz * 4 + dy * 2 + dx])
                            if len(sel) == 1:
                                kinds[e, flat] = 0
                                edge_slots[e, flat] = sel[0]
                            elif len(sel) == 2:
                                kinds[e, flat] = 1
                                edge_slots[e, flat] = edge_id(*sel)
                            elif len(sel) == 4:
                                kinds[e, flat] = 2
                                edge_slots[e, flat] = face_id(sel)
                            else:
                                kinds[e, flat] = 3
                                edge_slots[e, flat] = e
                            flat += 1
            n_e = len(edge_ids)
            n_f = len(face_ids)
            base_e = nv
            base_f = nv + n_e
            base_c = nv + n_e + n_f
            cd = np.where(
                kinds == 0,
                edge_slots,
                np.where(
                    kinds == 1,
                    base_e + edge_slots,
                    np.where(kinds == 2, base_f + edge_slots, base_c + edge_slots),
                ),
            )
            self.cell_dofs = cd
            self.n_dofs = base_c + E
        # node coordinates from per-cell box geometry (representative cell)
        centers, h = mesh.cell_geometry()
        self.cell_origin = centers - 0.5 * h
        origins = self.cell_origin
        self.h_cells = h
        frac = self.basis.nodes
        n_loc = n1**3
        loc = np.arange(n_loc)
        fr = np.stack(
            [frac[loc % n1], frac[(loc // n1) % n1], frac[loc // (n1 * n1)]],
            axis=1,
        )  # (n_loc, 3)
        coords = np.zeros((self.n_dofs, 3))
        pts = origins[:, None, :] + fr[None, :, :] * h[:, None, :]
        flat_dofs = self.cell_dofs.reshape(-1)
        coords[flat_dofs[::-1]] = pts.reshape(-1, 3)[::-1]
        self.node_coords = coords

    def _build_face_adjacency(self) -> None:
        adj: Dict[Tuple[int, ...], Tuple[int, int]] = {}
        for e, cell in enumerate(self.mesh.cells):
            for lf, f in enumerate(HexMesh._LOCAL_FACES):
                key = tuple(sorted(int(cell[i]) for i in f))
                adj.setdefault(key, (e, lf))
        self._face_adj = adj

    # ------------------------------------------------------------------
    @property
    def n_local(self) -> int:
        return (self.degree + 1) ** 3

    @property
    def n_cells(self) -> int:
        return self.mesh.n_cells

    @property
    def n_dofs_padded(self) -> int:
        return self._n_dofs_padded or self.n_dofs

    def set_padding(self, multiple: int) -> None:
        self._n_dofs_padded = -(-self.n_dofs // multiple) * multiple

    # -- boundary queries ----------------------------------------------------
    def _face_local_flat(self, local_face: int) -> np.ndarray:
        """FE local lattice indices on a local face."""
        n1 = self.degree + 1
        k = self.degree
        idx = np.arange(n1**3).reshape(n1, n1, n1)  # (z, y, x)
        axis, side = local_face // 2, local_face % 2
        sl = [slice(None)] * 3
        sl[2 - axis] = 0 if side == 0 else k
        return idx[tuple(sl)].reshape(-1)

    def _face_dofs(self, key) -> np.ndarray:
        e, lf = self._face_adj[key]
        return self.cell_dofs[e, self._face_local_flat(lf)]

    def boundary_dofs(self, bid: int) -> np.ndarray:
        keys = self.mesh.boundary_faces_with_id(bid)
        if not keys:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate([self._face_dofs(k) for k in keys]))

    def all_boundary_dofs(self) -> np.ndarray:
        keys = self.mesh.boundary_face_keys
        if not keys:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate([self._face_dofs(k) for k in keys]))

    def boundary_normal_axis_dofs(self, bid: int) -> List[Tuple[int, np.ndarray]]:
        """(normal axis, dofs) per boundary plane with this id — cells are
        axis-aligned so every boundary face has a coordinate normal (used
        for symmetry / normal-flux constraints)."""
        by_axis: Dict[int, List[np.ndarray]] = {}
        for key in self.mesh.boundary_faces_with_id(bid):
            e, lf = self._face_adj[key]
            by_axis.setdefault(lf // 2, []).append(self._face_dofs(key))
        return [
            (axis, np.unique(np.concatenate(lst))) for axis, lst in by_axis.items()
        ]

    def boundary_face_quadrature_normals(self, bid: int, n_q_1d: int):
        """(face_dofs, qcoords, V_face, jxw, normals) on the axis-aligned
        boundary faces with this id (MappedSpace-compatible)."""
        keys = self.mesh.boundary_faces_with_id(bid)
        if not keys:
            return None
        q1, w1 = gauss_quadrature(n_q_1d)
        V1, _ = self.basis.tabulate(q1)
        n1 = self.degree + 1
        n_fd = n1 * n1
        n_qf = n_q_1d * n_q_1d
        # tensor face basis, fast axis first: V[qhi qlo, ihi ilo]
        V_face = np.kron(V1, V1)
        F = len(keys)
        face_dofs = np.empty((F, n_fd), dtype=np.int64)
        qcoords = np.empty((F, n_qf, 3))
        jxw = np.empty((F, n_qf))
        normals = np.empty((F, n_qf, 3))
        for i, key in enumerate(keys):
            e, lf = self._face_adj[key]
            axis, side = lf // 2, lf % 2
            face_dofs[i] = self.cell_dofs[e, self._face_local_flat(lf)]
            t_axes = [a for a in range(3) if a != axis]  # ascending
            o = self.cell_origin[e]
            h = self.h_cells[e]
            # face lattice: lower tangent axis fastest (matches
            # _face_local_flat's reshape of the (z,y,x) lattice)
            lo, hi = t_axes
            Qlo = np.tile(q1, n_q_1d)
            Qhi = np.repeat(q1, n_q_1d)
            qcoords[i, :, axis] = o[axis] + (h[axis] if side else 0.0)
            qcoords[i, :, lo] = o[lo] + h[lo] * Qlo
            qcoords[i, :, hi] = o[hi] + h[hi] * Qhi
            jxw[i] = np.kron(w1 * h[hi], w1 * h[lo])
            nrm = np.zeros(3)
            nrm[axis] = 1.0 if side else -1.0
            normals[i] = nrm[None, :]
        return face_dofs, qcoords, V_face, jxw, normals

    def make_constraints(self, dirichlet: Optional[np.ndarray] = None) -> Constraints:
        con = Constraints(self.n_dofs)
        if dirichlet is not None and len(dirichlet):
            con.add_dirichlet(dirichlet)
        con.close()
        return con
