"""Q_k spaces on extruded (prismatic-hex) meshes.

Tensor product of a MappedSpace on the curved 2D base with a uniform 1D
z-lattice: dof (iz, i2) -> iz * n_dofs_2d + i2, cell (kz, e2) -> slice-major
cell index, local dofs lexicographic x-fastest then y then z (matching every
other space in the framework). This is the discretization behind the
reference's extruded 3D configurations (micro_particle.cc:326 + FE_Q on the
extruded triangulation) — here the tensor structure is kept explicit so all
3D evaluation contracts as (base mapping) x (1D z tables) on the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from adaflo_tpu.fe.basis import LagrangeBasis1D
from adaflo_tpu.fe.mapped_space import CellMapping, MappedSpace
from adaflo_tpu.mesh.extruded import ExtrudedMesh


class ExtrudedSpace:
    """Continuous Q_k space on an ExtrudedMesh (curved base x z-lattice)."""

    is_forest = False
    is_mapped = True
    is_extruded = True

    def __init__(
        self,
        mesh: ExtrudedMesh,
        degree: int,
        mapping: Optional[CellMapping] = None,
        point_distribution: str = "gauss_lobatto",
    ) -> None:
        self.mesh = mesh
        self.dim = 3
        self.degree = degree
        self.basis = LagrangeBasis1D(degree, point_distribution)
        self.mapping = mapping if mapping is not None else CellMapping(
            mesh.base, degree=3
        )
        self.base_space = MappedSpace(
            mesh.base, degree, self.mapping, point_distribution
        )
        self._n_dofs_padded: Optional[int] = None
        self.hanging_slave = np.empty(0, dtype=np.int64)
        self.hanging_master = np.empty(0, dtype=np.int64)
        self.hanging_weight = np.empty(0)
        self._build()

    def _build(self) -> None:
        k = self.degree
        n1 = k + 1
        bsp = self.base_space
        mesh = self.mesh
        Nz = mesh.n_slices
        n2 = bsp.n_dofs
        nz_nodes = k * Nz + 1
        self.n_z_nodes = nz_nodes
        self.n_dofs = n2 * nz_nodes

        E2 = mesh.base.n_cells
        cd2 = bsp.cell_dofs  # (E2, n1*n1)
        # cell (kz, e2): local (lz, l2) -> (kz*k + lz) * n2 + cd2[e2, l2]
        lz = np.arange(n1)
        cd = (
            (np.arange(Nz)[:, None, None, None] * k + lz[None, None, :, None])
            * n2
            + cd2[None, :, None, :]
        )  # (Nz, E2, n1, n1*n1)
        self.cell_dofs = cd.reshape(Nz * E2, n1 * n1 * n1)

        # node coords: z levels at the basis-node fractions of every slice
        f = self.basis.nodes
        z = np.empty(nz_nodes)
        for kz in range(Nz):
            z[kz * k : kz * k + n1] = mesh.z0 + mesh.h_z * (kz + f)
        self.z_nodes = z
        xy = bsp.node_coords  # (n2, 2)
        coords = np.empty((self.n_dofs, 3))
        coords[:, :2] = np.tile(xy, (nz_nodes, 1))
        coords[:, 2] = np.repeat(z, n2)
        self.node_coords = coords

    # -- sizes ---------------------------------------------------------------
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

    # -- boundary queries -----------------------------------------------------
    def boundary_dofs(self, bid: int) -> np.ndarray:
        """Lateral faces from the base's edges with this id x all z levels;
        the z-faces (iz = 0 / last) contribute when bid is the mesh's
        z_boundary_id."""
        n2 = self.base_space.n_dofs
        parts = []
        d2 = self.base_space.boundary_dofs(bid)
        if len(d2):
            iz = np.arange(self.n_z_nodes)
            parts.append((iz[:, None] * n2 + d2[None, :]).reshape(-1))
        if bid == self.mesh.z_boundary_id:
            all2 = np.arange(n2)
            parts.append(all2)  # z = z0 plane (iz = 0)
            parts.append((self.n_z_nodes - 1) * n2 + all2)
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def all_boundary_dofs(self) -> np.ndarray:
        n2 = self.base_space.n_dofs
        d2 = self.base_space.all_boundary_dofs()
        iz = np.arange(self.n_z_nodes)
        lateral = (iz[:, None] * n2 + d2[None, :]).reshape(-1)
        all2 = np.arange(n2)
        caps = np.concatenate([all2, (self.n_z_nodes - 1) * n2 + all2])
        return np.unique(np.concatenate([lateral, caps]))

    def boundary_face_quadrature_normals(self, bid: int, n_q_1d: int):
        """Surface-integral data on the LATERAL faces with this id: the base
        edge quadrature x a z Gauss rule; normals are in-plane (z-invariant).
        Returns (face_dofs (F, n1*n1), qcoords (F, n_q, 3), V_face
        (n_q, n1*n1), jxw (F, n_q), normals (F, n_q, 3)). The z-caps are
        no-slip in every reference configuration and are not supported
        here."""
        if bid == self.mesh.z_boundary_id and not len(
            self.base_space.boundary_dofs(bid)
        ):
            raise NotImplementedError(
                "surface integrals on the z-cap faces are not supported"
            )
        data2 = self.base_space.boundary_face_quadrature_normals(bid, n_q_1d)
        if data2 is None:
            return None
        fd2, qc2, V2, jxw2, nrm2 = data2
        from adaflo_tpu.fe.basis import gauss_quadrature

        qz, wz = gauss_quadrature(n_q_1d)
        Vz, _ = self.basis.tabulate(qz)  # (qz, n1)
        k = self.degree
        n1 = k + 1
        n2 = self.base_space.n_dofs
        Nz = self.mesh.n_slices
        F2, nq2 = jxw2.shape
        nqz = len(qz)

        # faces: every base edge-face repeated per slice (slice-major)
        fd = (
            (np.arange(Nz)[:, None, None, None] * k + np.arange(n1)[None, None, :, None])
            * n2
            + np.asarray(fd2)[None, :, None, :]
        ).reshape(Nz * F2, n1 * np.asarray(fd2).shape[1])
        zq = self.mesh.z0 + self.mesh.h_z * (
            np.arange(Nz)[:, None] + qz[None, :]
        )  # (Nz, nqz)
        # flat face-q index = z-point outer, edge-point inner
        qc = np.empty((Nz * F2, nqz * nq2, 3))
        qc2 = np.asarray(qc2)
        for kz in range(Nz):
            blk = qc[kz * F2 : (kz + 1) * F2]
            blk[:, :, :2] = np.tile(qc2, (1, nqz, 1))
            blk[:, :, 2] = np.repeat(zq[kz], nq2)[None, :]
        # V on the face: tensor (z outer, edge-param inner)
        V = np.einsum("zk,qi->zqki", Vz, np.asarray(V2)).reshape(
            nqz * nq2, -1
        )
        jxw = np.tile(np.asarray(jxw2), (Nz, nqz)) * (
            self.mesh.h_z * np.repeat(wz, nq2)[None, :]
        )
        nrm = np.zeros((Nz * F2, nqz * nq2, 3))
        nrm[:, :, :2] = np.tile(np.asarray(nrm2), (Nz, nqz, 1))
        return fd, qc, V, jxw, nrm

    def boundary_normal_axis_dofs(self, bid: int):
        """(normal axis, dofs) for symmetry/normal-flux planes: lateral
        axis-aligned planes of the base extended over all z-levels. The
        z-caps are no-slip in every reference extruded configuration and
        are not supported here."""
        n2 = self.base_space.n_dofs
        out = []
        for axis, d2 in self.base_space.boundary_normal_axis_dofs(bid):
            iz = np.arange(self.n_z_nodes)
            out.append(
                (axis, np.unique((iz[:, None] * n2 + d2[None, :]).ravel()))
            )
        return out
