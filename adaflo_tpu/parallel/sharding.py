"""Multi-chip distribution of the solver state over a device mesh.

TPU-native replacement for the reference's MPI domain decomposition
(p4est partitioning + ghosted vectors + MPI collectives, SURVEY.md section
2.2): dof vectors and cell index maps are sharded over a 1D `cells` device
mesh with `jax.sharding.NamedSharding`; XLA GSPMD then partitions every
jitted kernel, inserting the halo gathers/scatter-reductions and `psum`-style
reductions that the reference performs with update_ghost_values()/compress()
and MPI_Allreduce. Krylov dot products become on-ICI collectives inside the
same XLA program as the mat-vecs.

The structured lattice is sharded by contiguous dof/cell blocks (a 1D slab
decomposition of the lexicographic ordering — the Morton-ordered analog
arrives with the AMR forest). One code path serves 1..N chips; no
communication code exists in the solver itself.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def solver_mesh(devices=None, axis_name: str = "cells") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _put(x, sharding):
    return jax.device_put(x, sharding)


def shard_solver_state(
    ns, mesh: Mesh, axis_name: str = "cells", explicit_halo: bool = True
) -> None:
    """Shard a NavierStokes solver's state and operator index maps over the
    device mesh in place. Dof vectors shard on their last axis; cell-local
    index maps shard on the cell axis, which makes XLA partition all cell
    kernels by cells.

    With explicit_halo (default), the cell-loop gather/scatter is replaced
    by the precomputed shard_map halo pipeline (parallel/halo.py HaloOps):
    ghost values move in static ppermute ring shifts and ghost contributions
    compress back to their owners — the deliberate ICI analog of the
    reference's update_ghost_values()/compress() pairs
    (navier_stokes.cc:1255-1317) — instead of whatever collectives GSPMD
    infers. Any cell count shards on any device count (pad cells enter as
    zero rows)."""
    vec_p = NamedSharding(mesh, P(axis_name))
    vec_u = NamedSharding(mesh, P(None, axis_name))
    cells = NamedSharding(mesh, P(axis_name, None))
    repl = NamedSharding(mesh, P())

    for name in (
        "solution",
        "solution_old",
        "solution_old_old",
        "solution_update",
        "const_rhs",
        "user_rhs",
    ):
        blocks = getattr(ns, name)
        blocks[0] = _put(blocks[0], vec_u)
        blocks[1] = _put(blocks[1], vec_p)

    op = ns.operator
    n_dev = mesh.devices.size
    if op.cd_u.shape[0] % n_dev == 0:
        op.cd_u = _put(op.cd_u, cells)
        op.cd_p = _put(op.cd_p, cells)
    # else: leave the per-cell geometry to GSPMD's uneven auto-partition
    if op.pressure_fix_mode is not None:
        mode, weights, inv = op.pressure_fix_mode
        op.pressure_fix_mode = (_put(mode, vec_p), _put(weights, vec_p), inv)

    from adaflo_tpu.ops.lattice import IndexMapOps

    if explicit_halo:
        # explicit shard_map halo pipeline for the cell loops of both spaces
        # (the LatticeOps fast path and the forest index maps alike).
        # Periodic meshes need no special casing: the wrap is baked into
        # space.cell_dofs (periodic dofs are identified in the numbering),
        # so the wrap edge is just one more ring offset in the generic
        # ghost layout — e.g. device 0 referencing dofs owned by device
        # D-1 appears as offset D-1 and rides the same ppermute ring.
        from adaflo_tpu.parallel.halo import HaloOps

        for name, space in (("lat_u", ns.u_space), ("lat_p", ns.p_space)):
            lat = getattr(op, name)
            cd = (
                np.asarray(lat.cd)
                if isinstance(lat, IndexMapOps)
                else np.asarray(space.cell_dofs)
            )
            setattr(
                op, name, HaloOps(cd, lat.n_dofs_padded, mesh, axis_name)
            )
    elif isinstance(op.lat_u, IndexMapOps):
        op.lat_u.cd = _put(op.lat_u.cd, cells)
        op.lat_p.cd = _put(op.lat_p.cd, cells)


def shard_two_phase_state(
    tp, mesh: Mesh, axis_name: str = "cells", explicit_halo: bool = True
) -> None:
    """Shard a two-phase (level-set) solver over the device mesh: the inner
    NavierStokes state plus the concentration/curvature vectors, normal
    field, heaviside, projection diagonals and the level-set operators'
    gather/scatter maps. The fused per-step dispatches (advect+reinit,
    force+residual, Newton solve) then partition over the same `cells` axis
    — the TPU analog of the reference's fully distributed two-phase step
    (every concentration cell_loop crosses the MPI boundary,
    level_set_okz_advance_concentration.cc:288-397)."""
    shard_solver_state(tp.navier_stokes, mesh, axis_name, explicit_halo)
    vec = NamedSharding(mesh, P(axis_name))
    vec_d = NamedSharding(mesh, P(None, axis_name))

    for name in ("solution", "solution_old", "solution_old_old"):
        blocks = getattr(tp, name)
        for i in range(len(blocks)):
            blocks[i] = _put(blocks[i], vec)
    tp.heaviside = _put(tp.heaviside, vec)
    tp.normal_vector_field = _put(tp.normal_vector_field, vec_d)
    for name in ("mass_diag", "inv_mass_diag", "proj_diag"):
        if hasattr(tp, name):
            setattr(tp, name, _put(getattr(tp, name), vec))
    n_dev = mesh.devices.size
    enq = getattr(tp, "evaluated_normal_q", None)
    if enq is not None and enq.shape[0] % n_dev == 0:
        tp.evaluated_normal_q = _put(
            enq, NamedSharding(mesh, P(axis_name, None, None))
        )

    ops = tp.ops
    periodic = any(getattr(tp.mesh, "periodic", [False]))
    if explicit_halo and not periodic:
        from adaflo_tpu.ops.lattice import IndexMapOps
        from adaflo_tpu.parallel.halo import HaloOps

        for name, space in (
            ("lat_ls", tp.ls_space),
            ("lat_u", tp.navier_stokes.u_space),
        ):
            lat = getattr(ops, name)
            cd = (
                np.asarray(lat.cd)
                if isinstance(lat, IndexMapOps)
                else np.asarray(space.cell_dofs)
            )
            setattr(
                ops, name, HaloOps(cd, lat.n_dofs_padded, mesh, axis_name)
            )
