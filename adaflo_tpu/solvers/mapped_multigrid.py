"""Geometric multigrid on unstructured curved-quad (mapped) meshes.

The mapped-mesh counterpart of solvers/forest_multigrid.py, replacing the
reference's ML-AMG for its unstructured configurations
(navier_stokes_preconditioner.cc:465-562 'amg'/'amg linear' on merged/
refined triangulations, e.g. flow_past_cylinder, micro_particle): the
QuadMesh records a pre-refinement snapshot on every refine_global pass
(mesh/unstructured.py QuadMesh.history), so the coarse levels are the
actual coarser curved meshes — each carrying the same manifold geometry —
and parent-child structure is by construction (children of coarse cell e
are the fine cells 4e..4e+3 in fixed quadrant order).

Transfers are exact nodal interpolation through the reference-coordinate
embedding: a fine node with local lattice fraction xi in child c of parent
P sits at (offset_c + xi)/2 in the parent's reference square, so its
interpolation weights are the coarse tensor basis tabulated there — no
point location, no geometry evaluation.

Smoothing/V-cycle/compute are inherited from ForestGMG (meshes are
conforming, so the per-level constraints carry Dirichlet rows only).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.mapped_space import CellMapping, MappedSpace
from adaflo_tpu.mesh.unstructured import QuadMesh
from adaflo_tpu.ops.mapped import MappedEvaluator
from adaflo_tpu.solvers.forest_multigrid import ForestGMG, _FLevel

# child c of a refined quad covers (offset_c + [0,1]^2)/2 of the parent's
# reference square (QuadMesh._refine_once children order)
_CHILD_OFFSET = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])


def _mapped_transfer_maps(coarse: MappedSpace, fine: MappedSpace):
    """(masters, weights): nodal interpolation of fine dofs from coarse
    cells through the parent-child reference embedding."""
    k = fine.degree
    n1 = k + 1
    # owner (cell, local) of each fine dof: first occurrence
    E_f = fine.n_cells
    flat_cells = np.repeat(np.arange(E_f), n1 * n1)
    flat_local = np.tile(np.arange(n1 * n1), E_f)
    flat_dofs = fine.cell_dofs.reshape(-1)
    owner_cell = np.zeros(fine.n_dofs, dtype=np.int64)
    owner_local = np.zeros(fine.n_dofs, dtype=np.int64)
    owner_cell[flat_dofs[::-1]] = flat_cells[::-1]
    owner_local[flat_dofs[::-1]] = flat_local[::-1]

    f = fine.basis.nodes  # lattice fractions
    ix = owner_local % n1
    iy = owner_local // n1
    xi = np.stack([f[ix], f[iy]], axis=1)  # (n_dofs, 2) in the child
    parent = owner_cell // 4
    child = owner_cell % 4
    xi_p = (_CHILD_OFFSET[child] + xi) / 2.0  # in the parent

    Wx = coarse.basis.tabulate(xi_p[:, 0])[0]  # (n, n1_c)
    Wy = coarse.basis.tabulate(xi_p[:, 1])[0]
    wloc = np.einsum("nj,ni->nji", Wy, Wx).reshape(fine.n_dofs, -1)
    masters = coarse.cell_dofs[parent]  # (n, n_loc_c)
    return jnp.asarray(masters), jnp.asarray(wloc)


class MappedGMG(ForestGMG):
    """V-cycle preconditioner for alpha M + beta K on a mapped Q_k space.

    dirichlet_bids: boundary ids whose dofs act as identity rows (the
    fully-constrained sides of the component being preconditioned)."""

    def __init__(
        self,
        space: MappedSpace,
        dirichlet_bids: Sequence[int],
        n_dofs_padded: int,
        pin_position: Optional[np.ndarray] = None,
        smoother_degree: int = 3,
        min_coarse_nodes: int = 700,
        max_coarse_dense: int = 4096,
        mapping_degree: int = 3,
    ) -> None:
        self.dim = space.dim
        self.n_dofs_padded = n_dofs_padded
        self.smoother_degree = smoother_degree

        def level_mask(sp: MappedSpace) -> np.ndarray:
            dofs = [np.empty(0, dtype=np.int64)]
            for bid in dirichlet_bids:
                dofs.append(sp.boundary_dofs(bid))
            if pin_position is not None:
                d = np.linalg.norm(sp.node_coords - pin_position, axis=1)
                dofs.append(np.array([int(np.argmin(d))], dtype=np.int64))
            return np.unique(np.concatenate(dofs))

        def make_level(sp: MappedSpace) -> _FLevel:
            mask = level_mask(sp)
            con = Constraints(sp.n_dofs)
            con.add_dirichlet(mask)
            con.close()
            ev = MappedEvaluator(sp.dim, sp.basis, sp.degree + 1, sp.mapping)
            return _FLevel(sp, con, ev, jnp.asarray(sp.cell_dofs), mask)

        levels: List[_FLevel] = [make_level(space)]
        meshes: List[QuadMesh] = list(reversed(space.mesh.history))
        sp = space
        for cmesh in meshes:
            if sp.n_dofs <= min_coarse_nodes:
                break
            cmap = CellMapping(cmesh, degree=mapping_degree)
            csp = MappedSpace(cmesh, space.degree, cmap)
            lev = levels[-1]
            lev.t_masters, lev.t_weights = _mapped_transfer_maps(csp, sp)
            lev.cell_parent = jnp.asarray(
                np.arange(sp.n_cells, dtype=np.int64) // 4
            )
            levels.append(make_level(csp))
            sp = csp
        self.levels = levels
        self.coarse_n = levels[-1].space.n_dofs
        self.direct_coarse = self.coarse_n <= max_coarse_dense


def _extruded_transfer_maps(coarse, fine):
    """(masters, weights) for extruded spaces: the tensor product of the
    in-plane mapped transfer with exact 1D nodal interpolation on the
    (uniformly refined) z-lattice. When both levels share the base mesh
    (z-only semi-coarsening), the in-plane part is the identity."""
    if coarse.base_space.mesh is fine.base_space.mesh:
        n2 = fine.base_space.n_dofs
        m2 = np.arange(n2, dtype=np.int64)[:, None]
        w2 = np.ones((n2, 1))
    else:
        m2, w2 = _mapped_transfer_maps(coarse.base_space, fine.base_space)
        m2 = np.asarray(m2)
        w2 = np.asarray(w2)
    k = fine.degree
    n1 = k + 1
    n2f = fine.base_space.n_dofs
    n2c = coarse.base_space.n_dofs
    nzf = fine.n_z_nodes

    iz = np.arange(nzf)
    kzf = np.minimum(iz // k, fine.mesh.n_slices - 1)
    frac = fine.basis.nodes[iz - kzf * k]
    kzc = kzf // 2
    xi_z = ((kzf % 2) + frac) / 2.0
    W1 = coarse.basis.tabulate(xi_z)[0]  # (nzf, n1)
    mz = kzc[:, None] * k + np.arange(n1)[None, :]  # (nzf, n1) coarse z node

    d = np.arange(fine.n_dofs)
    di = d // n2f
    d2 = d % n2f
    masters = (
        mz[di][:, :, None] * n2c + m2[d2][:, None, :]
    ).reshape(fine.n_dofs, -1)
    weights = (W1[di][:, :, None] * w2[d2][:, None, :]).reshape(
        fine.n_dofs, -1
    )
    return jnp.asarray(masters), jnp.asarray(weights)


class ExtrudedGMG(ForestGMG):
    """V-cycle preconditioner on extruded prismatic-hex spaces: coarse
    levels pair the base QuadMesh's refinement snapshots with halved
    z-slices (refine_global on ExtrudedMesh does exactly the inverse), so
    every level is itself an extruded mesh with the same curved base
    manifold. The counterpart of the reference's ML-AMG on the extruded 3D
    micro_particle triangulation (ns_prec.cc:465-562)."""

    def __init__(
        self,
        space,
        dirichlet_bids: Sequence[int],
        n_dofs_padded: int,
        pin_position: Optional[np.ndarray] = None,
        smoother_degree: int = 3,
        min_coarse_nodes: int = 700,
        # z-semi-coarsening stops early (anisotropy guard), so history-less
        # meshes land larger coarse problems; the dense-CG bottom solve is
        # still far cheaper than the iterations a weak coarse level costs
        max_coarse_dense: int = 8192,
        mapping_degree: int = 3,
    ) -> None:
        from adaflo_tpu.fe.extruded_space import ExtrudedSpace
        from adaflo_tpu.mesh.extruded import ExtrudedMesh
        from adaflo_tpu.ops.mapped import Extruded3DEvaluator

        self.dim = space.dim
        self.n_dofs_padded = n_dofs_padded
        self.smoother_degree = smoother_degree

        def level_mask(sp) -> np.ndarray:
            dofs = [np.empty(0, dtype=np.int64)]
            for bid in dirichlet_bids:
                dofs.append(sp.boundary_dofs(bid))
            if pin_position is not None:
                d = np.linalg.norm(sp.node_coords - pin_position, axis=1)
                dofs.append(np.array([int(np.argmin(d))], dtype=np.int64))
            return np.unique(np.concatenate(dofs))

        def make_level(sp) -> _FLevel:
            mask = level_mask(sp)
            con = Constraints(sp.n_dofs)
            con.add_dirichlet(mask)
            con.close()
            ev = Extruded3DEvaluator(sp, sp.degree + 1)
            return _FLevel(sp, con, ev, jnp.asarray(sp.cell_dofs), mask)

        mesh = space.mesh
        levels: List[_FLevel] = [make_level(space)]
        base_history: List[QuadMesh] = list(reversed(mesh.base.history or []))
        sp = space
        n_slices = mesh.n_slices
        hi = 0
        # the z-anisotropy guard for z-only levels: stop semi-coarsening
        # once the z cell height outgrows the in-plane resolution too far
        # (a point smoother then no longer damps z-oscillatory modes)
        h_plane = float(mesh.base.cell_diameter)
        stop_after = False
        while sp.n_dofs > min_coarse_nodes and n_slices % 2 == 0:
            if hi < len(base_history):
                # base snapshot + halved z (full 3D coarsening)
                cmesh2 = base_history[hi]
                hi += 1
                cmap = CellMapping(cmesh2, degree=mapping_degree)
                base_coarsened = True
            else:
                # base history exhausted: z-only semi-coarsening keeps the
                # full in-plane resolution on every level, so the (dense)
                # coarse solve resolves all in-plane modes exactly — the
                # ML-AMG role on extruded meshes built without refinement
                # (micro_particle's 'global refinements = 0' configuration,
                # ns_prec.cc:465-562). Anisotropy guard: once h_z outgrows
                # the in-plane resolution, the level operator is
                # plane-dominated and a point smoother no longer damps its
                # z-oscillatory modes (measured: 145 CG its at 4x vs ~10
                # within the guard) — such a level is only admitted as the
                # DIRECT-SOLVE bottom (it is never smoothed, so the guard
                # does not apply to it; without this, micro_particle's
                # 8-slice mesh got ZERO coarse levels and the "V-cycle"
                # degenerated to its smoother: p-Poisson CG took 37 its,
                # within noise of plain Chebyshev's 32)
                if mesh.height / (n_slices // 2) > 1.5 * h_plane:
                    # admission uses the EXACT coarse dof count: an extruded
                    # space has n_base_nodes * (deg*n_slices + 1) dofs, so a
                    # z-halving keeps (deg*n_slices/2 + 1)/(deg*n_slices + 1)
                    # of them — more than half (e.g. 2->1 slices at deg 1 is
                    # 2/3). The old `n_dofs // 2` estimate could admit a
                    # level that then failed the direct_coarse cap, leaving
                    # the guard-violating level Chebyshev-smoothed as the
                    # bottom — exactly what the guard exists to prevent.
                    deg = space.degree
                    n_base_nodes = sp.n_dofs // (deg * n_slices + 1)
                    coarse_dofs = n_base_nodes * (deg * (n_slices // 2) + 1)
                    if coarse_dofs > max_coarse_dense:
                        break
                    stop_after = True
                cmesh2 = sp.mesh.base
                cmap = sp.mapping
                base_coarsened = False
            n_slices //= 2
            cmesh = ExtrudedMesh(
                cmesh2,
                n_slices,
                mesh.height,
                z_boundary_id=mesh.z_boundary_id,
                z0=mesh.z0,
            )
            csp = ExtrudedSpace(cmesh, space.degree, cmap)
            lev = levels[-1]
            lev.t_masters, lev.t_weights = _extruded_transfer_maps(csp, sp)
            E2f = sp.mesh.base.n_cells
            E2c = cmesh2.n_cells
            e = np.arange(sp.n_cells, dtype=np.int64)
            base_parent = (e % E2f) // 4 if base_coarsened else e % E2f
            lev.cell_parent = jnp.asarray(
                (e // E2f // 2) * E2c + base_parent
            )
            levels.append(make_level(csp))
            sp = csp
            if stop_after:
                break
        self.levels = levels
        self.coarse_n = levels[-1].space.n_dofs
        self.direct_coarse = self.coarse_n <= max_coarse_dense
