"""Explicit shard_map halo pipeline (parallel/halo.py).

The deliberate ICI analog of the reference's ghosted-vector exchange
(update_ghost_values()/compress() around every cell_loop,
navier_stokes.cc:1255-1317): precomputed pack/unpack maps + ppermute ring
shifts. Correctness bar: sharded results match the single-device path at
f64 tolerance, for any cell count on the 8-device CPU mesh.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh


def _mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    return Mesh(np.array(jax.devices()[:8]), ("cells",))


def test_halo_matches_index_map_random():
    """gather/scatter equal the plain index-map path on a random map whose
    ghosts span many ring offsets; E not divisible by the device count."""
    from adaflo_tpu.ops.lattice import IndexMapOps
    from adaflo_tpu.parallel.halo import HaloOps

    mesh = _mesh8()
    rng = np.random.default_rng(0)
    E, n_loc, n_dofs = 123, 27, 901
    n_pad = -(-n_dofs // 8) * 8
    cd = rng.integers(0, n_dofs, size=(E, n_loc))
    ref = IndexMapOps(cd, n_pad)
    halo = HaloOps(cd, n_pad, mesh)
    u = jnp.asarray(rng.standard_normal(n_pad))
    assert np.abs(np.asarray(ref.gather(u)) - np.asarray(halo.gather(u))).max() == 0.0
    r = jnp.asarray(rng.standard_normal((E, n_loc)))
    err = np.abs(
        np.asarray(ref.scatter_add(r)) - np.asarray(halo.scatter_add(r))
    ).max()
    assert err < 1e-12


def test_halo_local_ghosts_structured():
    """On a contiguous (lexicographic slab) partition of a structured Q2
    space the ghost layer is small and only nearest-ring: the halo totals
    must be a tiny fraction of the dof count (this is the property that
    makes the exchange ride neighbor ICI links)."""
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.parallel.halo import HaloOps

    mesh = _mesh8()
    m = StructuredMesh.subdivided_hyper_rectangle((8, 8), (0.0, 0.0), (1.0, 1.0))
    sp = ScalarSpace(m, 2)
    sp.set_padding(8)
    halo = HaloOps(np.asarray(sp.cell_dofs), sp.n_dofs_padded, mesh)
    assert set(halo.offsets) <= {1, 7}  # ring neighbors only (+1 and -1)
    # the halo is O(surface): at most ~2 dof-rows of the 17-node lattice,
    # versus ~36 owned dofs per device
    assert halo.n_ghost <= 2 * 17 + 4


def _small_ns(pad):
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.parameters import FlowParameters
    from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

    par = FlowParameters.from_string(
        """
subsection Time stepping
  set end time = 0.05
  set step size = 0.05
end
subsection Navier-Stokes
  set dimension = 2
  set global refinements = 0
  set velocity degree = 2
  subsection Solver
    set NL max iterations = 4
    set NL tolerance = 1.e-9
    set lin max iterations = 60
    set lin tolerance = 1.e-6
  end
end
subsection Output options
  set output verbosity = 0
end
"""
    )
    m = StructuredMesh.subdivided_hyper_rectangle((6, 6), (0.0, 0.0), (1.0, 1.0))
    ns = NavierStokes(par, m, pad_dofs_to=pad)
    ns.set_velocity_dirichlet_boundary(
        0, lambda x, t: np.stack([x[:, 1] * (1 - x[:, 1]), 0 * x[:, 0]])
    )
    ns.fix_pressure_constant(0)
    ns.setup_problem()
    return ns


def test_halo_sharded_ns_step_matches_single_device():
    """One full NS time step with the explicit halo pipeline over 8 devices
    equals the single-device step at f64 tolerance."""
    from adaflo_tpu.parallel.sharding import shard_solver_state, solver_mesh

    mesh = _mesh8()
    ns_ref = _small_ns(pad=1)
    ns_ref.advance_time_step()
    u_ref = np.asarray(ns_ref.solution[0])
    p_ref = np.asarray(ns_ref.solution[1])

    ns = _small_ns(pad=8)
    shard_solver_state(ns, solver_mesh(jax.devices()[:8]), explicit_halo=True)
    from adaflo_tpu.parallel.halo import HaloOps

    assert isinstance(ns.operator.lat_u, HaloOps)
    ns.advance_time_step()
    u = np.asarray(ns.solution[0])[:, : u_ref.shape[1]]
    p = np.asarray(ns.solution[1])[: p_ref.shape[0]]
    assert np.abs(u - u_ref).max() < 1e-9
    # pressure is defined up to the pressure-fix shift applied identically
    assert np.abs(p - p_ref).max() < 1e-8


def test_halo_forest_indivisible_cell_count():
    """Adaptive forest with a cell count NOT divisible by 8 shards and runs
    a full hanging-node step (pad cells enter as zero rows)."""
    from adaflo_tpu.mesh.forest import ForestMesh
    from adaflo_tpu.parameters import FlowParameters
    from adaflo_tpu.parallel.sharding import shard_solver_state, solver_mesh
    from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

    mesh = _mesh8()
    par = FlowParameters.from_string(
        """
subsection Time stepping
  set end time = 0.05
  set step size = 0.05
end
subsection Navier-Stokes
  set dimension = 2
  set global refinements = 1
  set velocity degree = 2
  subsection Solver
    set NL max iterations = 3
    set NL tolerance = 1.e-8
  end
end
subsection Output options
  set output verbosity = 0
end
"""
    )
    fm = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    ns = NavierStokes(par, fm, pad_dofs_to=8)
    ns.set_velocity_dirichlet_boundary(
        0, lambda x, t: np.stack([x[:, 1], 0 * x[:, 0]])
    )
    ns.fix_pressure_constant(0)
    ns.setup_problem()
    centers, _ = fm.cell_geometry()
    # refine ONE cell: 16 - 1 + 4 = 19 cells, not divisible by 8
    flags = np.zeros(fm.n_cells, dtype=np.int8)
    flags[0] = 1
    assert ns.adapt_mesh(flags)
    assert ns.mesh.n_cells % 8 != 0
    shard_solver_state(ns, solver_mesh(jax.devices()[:8]), explicit_halo=True)
    ns.advance_time_step()
    u = np.asarray(ns.solution[0])
    assert np.isfinite(u).all() and np.abs(u).max() > 1e-3


def test_halo_reshard_after_adapt_matches_single_device():
    """The full distributed AMR cycle — sharded step, adapt (host remesh +
    solution transfer), RE-shard over the same device mesh, next step —
    equals the single-device sequence: the reference's p4est
    repartitioning-after-refinement bar (SURVEY §2.2; the Morton order is
    the partition order, so re-balancing = re-sharding the new arrays)."""
    from adaflo_tpu.mesh.forest import ForestMesh
    from adaflo_tpu.parameters import FlowParameters
    from adaflo_tpu.parallel.sharding import shard_solver_state, solver_mesh
    from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

    mesh8 = _mesh8()
    par = FlowParameters.from_string(
        """
subsection Time stepping
  set end time = 0.1
  set step size = 0.05
end
subsection Navier-Stokes
  set dimension = 2
  set global refinements = 1
  set velocity degree = 2
  subsection Solver
    set NL max iterations = 3
    set NL tolerance = 1.e-10
    set lin tolerance = 1.e-9
  end
end
subsection Output options
  set output verbosity = 0
end
"""
    )

    def run(pad, shard):
        fm = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
        ns = NavierStokes(par, fm, pad_dofs_to=pad)
        ns.set_velocity_dirichlet_boundary(
            0, lambda x, t: np.stack([x[:, 1], 0 * x[:, 0]])
        )
        ns.fix_pressure_constant(0)
        ns.setup_problem()
        if shard:
            shard_solver_state(ns, solver_mesh(jax.devices()[:8]))
        ns.advance_time_step()
        flags = np.zeros(ns.mesh.n_cells, dtype=np.int8)
        flags[0] = flags[3] = 1  # 16 -> 22 cells, not divisible by 8
        assert ns.adapt_mesh(flags)
        if shard:
            shard_solver_state(ns, solver_mesh(jax.devices()[:8]))
        ns.advance_time_step()
        return np.asarray(ns.solution[0])[:, : ns.u_space.n_dofs]

    u_ref = run(1, False)
    u_sh = run(8, True)
    assert np.abs(u_sh - u_ref).max() < 1e-9


def _small_two_phase(pad):
    """A one-step rising-bubble level-set problem (the rising_bubble_ls
    physics on a coarser mesh)."""
    import io

    from adaflo_tpu.drivers.rising_bubble import (
        TwoPhaseParameters,
        initial_distance,
    )
    from adaflo_tpu.functions import ZeroFunction
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.twophase.level_set_okz import LevelSetOKZSolver
    from pathlib import Path

    prm = Path(__file__).parent / "prms" / "rising_bubble_ls_short.prm"
    par = TwoPhaseParameters.from_file(str(prm))
    par.output_verbosity = 0
    par.global_refinements = 1
    par.end_time = 0.02
    m = StructuredMesh.subdivided_hyper_rectangle(
        (5, 10), (0.0, 0.0), (1.0, 2.0)
    )
    m.set_boundary_id(
        lambda c: (np.abs(c[:, 0] - 1) < 1e-14) | (np.abs(c[:, 0]) < 1e-14), 2
    )
    tp = LevelSetOKZSolver(par, m, out=io.StringIO(), pad_dofs_to=pad)
    tp.set_no_slip_boundary(0)
    tp.fix_pressure_constant(0)
    tp.set_symmetry_boundary(2)
    tp.setup_problem(ZeroFunction(2), initial_distance)
    return tp


def test_halo_sharded_two_phase_step_matches_single_device():
    """One full two-phase level-set time step (advect + reinit + force +
    coupled NS Newton solve) sharded over 8 devices with the explicit halo
    pipeline equals the single-device step at f64 tolerance — the
    reference's distributed two-phase bar (every concentration and NS
    cell_loop crosses the MPI boundary, level_set_base.cc:188-291)."""
    from adaflo_tpu.parallel.halo import HaloOps
    from adaflo_tpu.parallel.sharding import (
        shard_two_phase_state,
        solver_mesh,
    )

    _mesh8()
    ref = _small_two_phase(pad=1)
    ref.advance_time_step()
    c_ref = np.asarray(ref.solution[0])
    u_ref = np.asarray(ref.navier_stokes.solution[0])

    tp = _small_two_phase(pad=8)
    shard_two_phase_state(tp, solver_mesh(jax.devices()[:8]))
    assert isinstance(tp.ops.lat_ls, HaloOps)
    tp.advance_time_step()
    c = np.asarray(tp.solution[0])[: c_ref.shape[0]]
    u = np.asarray(tp.navier_stokes.solution[0])[:, : u_ref.shape[1]]
    assert np.abs(c - c_ref).max() < 1e-9
    assert np.abs(u - u_ref).max() < 1e-9

    # cross-device diagnostics on the sharded state: the interface-point
    # collection / range / max-velocity reductions gather the distributed
    # data exactly like the single-device path (the reference's MPI
    # interface-point gather + reductions, two_phase_base.cc:479-545,
    # 904-965)
    stats_ref = np.asarray(ref.compute_bubble_statistics())
    stats = np.asarray(tp.compute_bubble_statistics())
    np.testing.assert_allclose(stats, stats_ref, rtol=0, atol=1e-9)
    assert (
        abs(tp.get_maximal_velocity() - ref.get_maximal_velocity()) < 1e-9
    )
    np.testing.assert_allclose(
        np.asarray(tp.get_concentration_range()),
        np.asarray(ref.get_concentration_range()),
        rtol=0,
        atol=1e-9,
    )


def test_halo_compiles_to_collective_permute_only():
    """The ICI-efficiency evidence: the compiled halo exchange contains
    ring collective-permutes and NO all-gather/all-to-all — the ghost
    traffic is O(halo), not O(volume), so it rides neighbor ICI links
    (the reference's ghost exchange crosses MPI the same way,
    navier_stokes.cc:1255-1317)."""
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.parallel.halo import HaloOps

    mesh = _mesh8()
    m = StructuredMesh.subdivided_hyper_rectangle((8, 8), (0.0, 0.0), (1.0, 1.0))
    sp = ScalarSpace(m, 2)
    sp.set_padding(8)
    halo = HaloOps(np.asarray(sp.cell_dofs), sp.n_dofs_padded, mesh)

    def roundtrip(u):
        return halo.scatter_add(halo.gather(u))

    u = jnp.zeros(sp.n_dofs_padded)
    hlo = jax.jit(roundtrip).lower(u).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo
    assert "all-to-all" not in hlo


def _small_periodic_ns(pad):
    """Periodic-in-x channel: lid-driven by a body force, wall Dirichlet in
    y — the periodic_channel pattern on a tiny mesh. The periodic wrap is
    baked into the lattice dof numbering (fe/space.py cell_dofs wraps on
    periodic axes), so the halo sees it as one more ring offset."""
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.parameters import FlowParameters
    from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

    par = FlowParameters.from_string(
        """
subsection Time stepping
  set end time = 0.05
  set step size = 0.05
end
subsection Navier-Stokes
  set dimension = 2
  set global refinements = 0
  set velocity degree = 2
  subsection Solver
    set NL max iterations = 4
    set NL tolerance = 1.e-9
    set lin max iterations = 60
    set lin tolerance = 1.e-6
  end
end
subsection Output options
  set output verbosity = 0
end
"""
    )
    m = StructuredMesh.subdivided_hyper_rectangle((6, 6), (0.0, 0.0), (1.0, 1.0))
    ns = NavierStokes(par, m, pad_dofs_to=pad)
    ns.set_periodic_direction(0)
    ns.set_no_slip_boundary(2)
    ns.set_velocity_dirichlet_boundary(
        3, lambda x, t: np.stack([np.ones_like(x[:, 0]), 0 * x[:, 0]])
    )
    ns.fix_pressure_constant(0)
    ns.setup_problem()
    return ns


def test_halo_sharded_periodic_ns_step_matches_single_device():
    """One full NS step on a PERIODIC mesh with the explicit halo pipeline
    over 8 devices equals the single-device step — the wrap edge rides the
    same ppermute ring (closes the round-2 'periodic stays on GSPMD' gap)."""
    from adaflo_tpu.parallel.halo import HaloOps
    from adaflo_tpu.parallel.sharding import shard_solver_state, solver_mesh

    mesh = _mesh8()
    ns_ref = _small_periodic_ns(pad=1)
    ns_ref.advance_time_step()
    u_ref = np.asarray(ns_ref.solution[0])
    p_ref = np.asarray(ns_ref.solution[1])

    ns = _small_periodic_ns(pad=8)
    shard_solver_state(ns, solver_mesh(jax.devices()[:8]), explicit_halo=True)
    assert isinstance(ns.operator.lat_u, HaloOps)
    ns.advance_time_step()
    u = np.asarray(ns.solution[0])[:, : u_ref.shape[1]]
    p = np.asarray(ns.solution[1])[: p_ref.shape[0]]
    assert np.abs(u - u_ref).max() < 1e-9
    assert np.abs(p - p_ref).max() < 1e-8


def test_halo_two_phase_step_collectives_are_permute_only():
    """Compile-level ICI-efficiency assertion on the FULL fused two-phase
    dispatches (round-2 asserted only the bare gather/scatter roundtrip):
    the sharded advect+reinit, force+residual and Newton-solve programs
    contain ring collective-permutes (the halo) and all-reduce (Krylov dot
    products) but NO all-gather / all-to-all — ghost traffic stays
    O(halo)."""
    from adaflo_tpu.parallel.sharding import (
        shard_two_phase_state,
        solver_mesh,
    )

    _mesh8()
    tp = _small_two_phase(pad=8)
    shard_two_phase_state(tp, solver_mesh(jax.devices()[:8]))

    captured = {}
    # the Newton stage dispatches the fused on-device loop (_newton_loop_fn,
    # round-3 default), not the legacy per-solve _solve_res_fn
    targets = [
        (tp, "_advect_reinit_fn"),
        (tp, "_force_residual_fn"),
        (tp.navier_stokes, "_newton_loop_fn"),
    ]
    for obj, name in targets:
        real = getattr(obj, name)

        def make(real=real, name=name):
            def wrapper(*a, **kw):
                captured.setdefault(name, (real, a, kw))
                return real(*a, **kw)

            return wrapper

        setattr(obj, name, make())
    tp.advance_time_step()
    import re

    for obj, name in targets:
        assert name in captured, f"{name} not dispatched in the step"
        real, a, kw = captured[name]
        hlo = real.lower(*a, **kw).compile().as_text()
        assert "collective-permute" in hlo, name
        # no field-sized all-gather/all-to-all in the Krylov iteration:
        # ghost traffic stays O(halo). Two documented exceptions:
        # (1) sub-4KB collectives — the SPMD partitioner may choose a tiny
        #     gather/reshard over a partial reduction for scalar-class
        #     leaves (e.g. the 232-dof pressure vector in a GMRES basis
        #     dot); that is a cost-model choice, not ghost traffic.
        # (2) exactly ONE field-sized gather in the Newton program: the
        #     block preconditioner's apply boundary (its GMG/Chebyshev
        #     internals reshape dof vectors onto the cell lattice, which
        #     GSPMD reshards at field size). Making the V-cycle halo-native
        #     is the remaining sharding work; the Krylov iteration itself
        #     (basis dots/updates, operator applies, axpys) must be
        #     permute-only, which this count pins — any new field-sized
        #     collective fails the test.
        large = []
        for line in hlo.splitlines():
            m = re.search(
                r"= \(?(\w+)\[([\d,]*)\][^=]*(?:all-gather|all-to-all)", line
            )
            if not m:
                continue
            dims = [int(d) for d in m.group(2).split(",") if d]
            # byte width from the HLO dtype token (f32 collectives were
            # previously overestimated 2x by a hardcoded 8)
            widths = {
                "f64": 8, "u64": 8, "s64": 8, "c64": 8,
                "f32": 4, "u32": 4, "s32": 4, "pred": 1,
                "bf16": 2, "f16": 2, "u16": 2, "s16": 2,
                "u8": 1, "s8": 1,
            }
            width = widths.get(m.group(1), 8)
            nbytes = width * int(np.prod(dims)) if dims else width
            if nbytes > 4096:
                large.append((line.strip()[:160], nbytes))
        budget = 1 if name == "_newton_loop_fn" else 0
        assert len(large) <= budget, (name, large)
