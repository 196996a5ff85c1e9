"""Extruded 3D meshes: an unstructured curved 2D base swept along z.

TPU-native counterpart of deal.II GridGenerator::extrude_triangulation as
used by the reference's 3D micro_particle configuration
(/root/reference/applications/micro_particle.cc:326: the 2D Gmsh channel
extruded into 9 slices over height 1, with CylindricalManifold(z-axis)
replacing the 2D PolarManifold on the rounded corners).

The extrusion is an exact tensor product — every z-slice carries the SAME
curved 2D geometry — so the 3D cell Jacobian is block-diagonal
(J3 = diag(J2(x, y), h_z)) and all 3D evaluation tensorizes over the base
mapping × a uniform 1D z-lattice (ops/mapped.py Extruded3DEvaluator). A
cylindrical manifold about a z-parallel axis IS the base's polar manifold
acting in-plane, so refinement of the base reproduces deal.II's curved
refinement of the 3D mesh exactly.

Cell ordering is slice-major: cell e = kz * n_cells_2d + e2.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np

from adaflo_tpu.mesh.unstructured import QuadMesh


class ExtrudedMesh:
    """3D prismatic-hex mesh: `base` (QuadMesh, possibly curved) x uniform
    z-slices. Lateral boundary ids come from the base's edge ids; the
    bottom/top z-faces carry `z_boundary_id` (the reference sets both to 0,
    micro_particle.cc:279-289)."""

    dim = 3
    is_extruded = True

    def __init__(
        self,
        base: QuadMesh,
        n_slices: int,
        height: float,
        z_boundary_id: int = 0,
        z0: float = 0.0,
    ) -> None:
        self.base = base
        self.n_slices = int(n_slices)
        self.height = float(height)
        self.z0 = float(z0)
        self.z_boundary_id = z_boundary_id
        self.periodic = [False, False, False]

    # -- sizes --------------------------------------------------------------
    @property
    def n_cells(self) -> int:
        return self.base.n_cells * self.n_slices

    @property
    def vertices(self) -> np.ndarray:
        """(V2 * (n_slices+1), 3) vertex array (base verts per z level)."""
        v2 = self.base.vertices
        z = self.z0 + self.h_z * np.arange(self.n_slices + 1)
        out = np.empty((len(v2) * len(z), 3))
        out[:, :2] = np.tile(v2, (len(z), 1))
        out[:, 2] = np.repeat(z, len(v2))
        return out

    @property
    def h_z(self) -> float:
        return self.height / self.n_slices

    def all_boundary_ids(self) -> set:
        return self.base.all_boundary_ids() | {self.z_boundary_id}

    # -- refinement ----------------------------------------------------------
    def refine_global(self, times: int = 1) -> None:
        """deal.II refine_global on the extruded mesh: the base refines with
        its manifolds (in-plane cylindrical geometry) and each slice splits
        in two."""
        for _ in range(int(times)):
            self.base.refine_global(1)
            self.n_slices *= 2

    @property
    def last_cell_diameter(self) -> float:
        """Diameter of the last cell (slice-major: last base cell, top
        slice): 3D diagonal of the base cell's diagonal x h_z."""
        return float(np.hypot(self.base.last_cell_diameter, self.h_z))

    # -- diameters (compute_cell_diameters analog, util.h:47-120) ------------
    @property
    def cell_diameter(self) -> float:
        """Smallest 3D cell diagonal (base diagonal x h_z)."""
        return float(np.hypot(self.base.cell_diameter, self.h_z))

    def diameters(self):
        """(per-cell max |J eigenvalue|, global min, global max) of the 3D
        block-diagonal Jacobian: the in-plane pair from the base mapping and
        h_z on the z axis."""
        from adaflo_tpu.fe.mapped_space import CellMapping

        mp = CellMapping(self.base, degree=3)
        per2, gmin2, gmax2 = mp.cell_diameters()
        per_cell = np.tile(np.maximum(per2, self.h_z), self.n_slices)
        return per_cell, min(gmin2, self.h_z), max(gmax2, self.h_z)
