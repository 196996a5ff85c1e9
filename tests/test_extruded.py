"""Extruded 3D meshes/spaces/evaluators (the reference's 3D micro_particle
discretization: GridGenerator::extrude_triangulation, micro_particle.cc:326).

Correctness bar: on an axis-aligned base the extruded path reproduces the
structured 3D path at machine precision; on a curved base, in-plane
gradients match the 2D mapped evaluator and the stiffness form stays
symmetric.
"""

import io
import os
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

MICRO_MSH = Path("/root/reference/applications/microfluidic_2D.msh")
SLOW = not os.environ.get("ADAFLO_RUN_SLOW")


def _structured_pair():
    from adaflo_tpu.fe.extruded_space import ExtrudedSpace
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.extruded import ExtrudedMesh
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.mesh.unstructured import QuadMesh
    from adaflo_tpu.ops.mapped import Extruded3DEvaluator
    from adaflo_tpu.ops.tensor import CellEvaluator

    base = QuadMesh.subdivided_hyper_rectangle((3, 2), (0.0, 0.0), (1.5, 1.0))
    em = ExtrudedMesh(base, 4, 2.0)
    sp = ExtrudedSpace(em, 2)
    ev = Extruded3DEvaluator(sp, 4)
    sm = StructuredMesh((3, 2, 4), (0.0, 0.0, 0.0), (1.5, 1.0, 2.0))
    ssp = ScalarSpace(sm, 2)
    ce = CellEvaluator(3, ssp.basis, 4, sm.h)
    return sp, ev, ssp, ce, sm


def test_extruded_matches_structured_3d():
    sp, ev, ssp, ce, sm = _structured_pair()
    assert sp.n_dofs == ssp.n_dofs
    f = lambda p: np.sin(p[:, 0]) * np.cos(2 * p[:, 1]) + p[:, 2] ** 2
    u_e = jnp.asarray(f(sp.node_coords))
    u_s = jnp.asarray(f(ssp.node_coords))
    qce = ev.quad_coords()
    qcs = ce.quad_coords(sm)

    def order(qc):
        return np.lexsort(
            (qc[:, :, 0].mean(1), qc[:, :, 1].mean(1), qc[:, :, 2].mean(1))
        )

    oe, os_ = order(qce), order(qcs)
    assert np.abs(qce[oe] - qcs[os_]).max() < 1e-12
    ve = np.asarray(ev.values(u_e[sp.cell_dofs]))
    vs = np.asarray(ce.values(u_s[ssp.cell_dofs]))
    assert np.abs(ve[oe] - vs[os_]).max() < 1e-12
    ge = np.asarray(ev.gradients(u_e[sp.cell_dofs]))
    gs = np.asarray(ce.gradients(u_s[ssp.cell_dofs]))
    assert np.abs(ge[oe] - gs[os_]).max() < 1e-12
    # volume through jxw
    assert abs(float(np.asarray(ev.jxw_cells).sum()) - 3.0) < 1e-12


def test_extruded_curved_base():
    from adaflo_tpu.fe.extruded_space import ExtrudedSpace
    from adaflo_tpu.mesh.extruded import ExtrudedMesh
    from adaflo_tpu.mesh.unstructured import PolarManifold, QuadMesh
    from adaflo_tpu.ops.mapped import Extruded3DEvaluator, MappedEvaluator

    rng = np.random.default_rng(0)
    shell = QuadMesh.hyper_shell((0.0, 0.0), 0.5, 1.0, 8)
    shell.set_manifold(0, PolarManifold(np.array([0.0, 0.0])))
    shell.set_manifold_id_by_center(lambda c: True, 0)
    shell.refine_global(1)
    em = ExtrudedMesh(shell, 3, 1.0)
    sp = ExtrudedSpace(em, 2)
    ev = Extruded3DEvaluator(sp, 3)
    # curved volume (Q3 mapping: near-exact annulus)
    vol = float(np.asarray(ev.jxw_cells).sum())
    assert abs(vol - np.pi * (1.0 - 0.25)) < 1e-6
    # z-independent field: in-plane gradients equal the 2D mapped evaluator
    bsp = sp.base_space
    ev2d = MappedEvaluator(2, bsp.basis, 3, sp.mapping)
    u2d = jnp.asarray(rng.standard_normal(bsp.n_dofs))
    u3d = jnp.asarray(np.tile(np.asarray(u2d), sp.n_z_nodes))
    g3 = np.asarray(ev.gradients(u3d[sp.cell_dofs]))
    g2 = np.asarray(ev2d.gradients(u2d[bsp.cell_dofs]))
    E2 = em.base.n_cells
    assert np.abs(g3[:E2, :2, : ev.nq2] - g2).max() < 1e-12
    assert np.abs(g3[:E2, 2]).max() < 1e-12
    # stiffness symmetry through integrate_gradients
    u_r = jnp.asarray(rng.standard_normal((sp.n_cells, sp.n_local)))
    v_r = jnp.asarray(rng.standard_normal((sp.n_cells, sp.n_local)))
    Ku = np.asarray(ev.integrate_gradients(ev.gradients(u_r)))
    Kv = np.asarray(ev.integrate_gradients(ev.gradients(v_r)))
    assert abs((np.asarray(v_r) * Ku).sum() - (np.asarray(u_r) * Kv).sum()) < 1e-10


@pytest.mark.medium
def test_extruded_ns_step():
    """Full NS time step on a small curved extruded mesh (Dirichlet lid)."""
    from adaflo_tpu.fe.extruded_space import ExtrudedSpace
    from adaflo_tpu.mesh.extruded import ExtrudedMesh
    from adaflo_tpu.mesh.unstructured import PolarManifold, QuadMesh
    from adaflo_tpu.parameters import FlowParameters
    from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

    par = FlowParameters.from_string(
        """
subsection Time stepping
  set end time = 0.05
  set step size = 0.05
end
subsection Navier-Stokes
  set dimension = 3
  set velocity degree = 2
  subsection Solver
    set NL max iterations = 4
    set NL tolerance = 1.e-8
    set lin max iterations = 80
    set lin tolerance = 1.e-6
  end
end
subsection Output options
  set output verbosity = 0
end
"""
    )
    shell = QuadMesh.hyper_shell((0.0, 0.0), 0.5, 1.0, 6)
    shell.set_manifold(0, PolarManifold(np.array([0.0, 0.0])))
    shell.set_manifold_id_by_center(lambda c: True, 0)
    mesh = ExtrudedMesh(shell, 2, 0.5)
    ns = NavierStokes(par, mesh)
    # rotate about the z axis on all boundaries
    ns.set_velocity_dirichlet_boundary(
        0, lambda x, t: np.stack([-x[:, 1], x[:, 0], 0 * x[:, 2]])
    )
    ns.fix_pressure_constant(0)
    ns.setup_problem()
    ns.advance_time_step()
    u = np.asarray(ns.solution[0])
    assert np.isfinite(u).all() and np.abs(u).max() > 0.5
    # the rotation is divergence-free: divergence residual small
    assert np.abs(np.asarray(ns.solution[1])).max() < 10.0


@pytest.mark.skipif(not MICRO_MSH.exists(), reason="reference mesh unavailable")
def test_micro_particle_3d_setup_header():
    """The reference's 3D extrusion (9 vertex levels over height 1,
    micro_particle.cc:326): cell count = 8 x base, z-caps no-slip."""
    from adaflo_tpu.applications.micro_particle import (
        MicroFluidicProblem,
        TwoPhaseParameters,
    )

    par = TwoPhaseParameters()
    par.dimension = 3
    par.global_refinements = 0
    prob = MicroFluidicProblem(
        par, out=io.StringIO(), mesh_dir=str(MICRO_MSH.parent)
    )
    mesh = prob.mesh
    assert mesh.is_extruded and mesh.n_slices == 8
    assert mesh.n_cells == mesh.base.n_cells * 8
    assert mesh.all_boundary_ids() >= {0, 1, 2, 3, 4}


@pytest.mark.skipif(
    SLOW or not MICRO_MSH.exists(), reason="slow tier (ADAFLO_RUN_SLOW)"
)
def test_micro_particle_3d_short_golden():
    """One time step of the reference's 3D micro_particle configuration
    (extruded curved channel, two-phase transport, 3D bubble statistics)
    against the stored golden."""
    import os

    from adaflo_tpu.applications import micro_particle as mp
    from adaflo_tpu.testing import compare_with_golden, run_driver_capture

    os.environ.setdefault("ADAFLO_MESH_DIR", str(MICRO_MSH.parent))
    text = run_driver_capture(
        mp.main, str(Path(__file__).parent / "prms/micro_particle_3d_short.prm")
    )
    compare_with_golden(
        text, Path(__file__).parent / "golden/micro_particle_3d_short.output"
    )


@pytest.mark.medium
def test_extruded_gmg_vcycle():
    """ExtrudedGMG (solvers/mapped_multigrid.py) on a distorted curved base:
    transfers are a partition of unity, and a V-cycle-preconditioned CG on
    alpha M + beta K converges in few iterations where diagonal-CG needs
    many (the reference's ML-AMG bar on extruded 3D meshes,
    navier_stokes_preconditioner.cc:465-562)."""
    import jax.numpy as jnp

    from adaflo_tpu.fe.constraints import Constraints
    from adaflo_tpu.fe.extruded_space import ExtrudedSpace
    from adaflo_tpu.fe.mapped_space import CellMapping
    from adaflo_tpu.mesh.extruded import ExtrudedMesh
    from adaflo_tpu.mesh.unstructured import QuadMesh
    from adaflo_tpu.ops.forest_ops import ForestHelmholtzOperator
    from adaflo_tpu.solvers.krylov import cg
    from adaflo_tpu.solvers.mapped_multigrid import ExtrudedGMG

    base = QuadMesh.subdivided_hyper_rectangle((2, 2), (0.0, 0.0), (1.0, 1.0))
    base.distort_random(0.15, seed=7)
    base.refine_global(2)
    mesh = ExtrudedMesh(base, 8, 1.0, z_boundary_id=1)
    mp = CellMapping(base, 3)
    sp = ExtrudedSpace(mesh, 2, mp)
    bids = sorted(mesh.all_boundary_ids())

    gmg = ExtrudedGMG(sp, bids, sp.n_dofs_padded)
    assert len(gmg.levels) >= 3, [l.space.n_dofs for l in gmg.levels]
    for lev in gmg.levels[:-1]:
        w = np.asarray(lev.t_weights)
        assert np.abs(w.sum(axis=1) - 1.0).max() < 1e-12

    con = Constraints(sp.n_dofs)
    con.add_dirichlet(np.unique(np.concatenate(
        [sp.boundary_dofs(b) for b in bids])))
    con.close()
    op = ForestHelmholtzOperator(sp, con)
    rng = np.random.RandomState(3)
    b = jnp.asarray(con.condense(jnp.asarray(rng.rand(sp.n_dofs_padded))))
    A = lambda x: op.vmult(x, alpha=1.0, beta=1.0)

    state = gmg.compute(1.0, 1.0)
    res_g = cg(A, b, jnp.zeros_like(b), jnp.float64(1e-10), 200,
               M=lambda r: gmg.vmult(state, r))
    dinv = jnp.where(
        op.diagonal(alpha=1.0, beta=1.0) != 0,
        1.0 / op.diagonal(alpha=1.0, beta=1.0), 0.0)
    res_d = cg(A, b, jnp.zeros_like(b), jnp.float64(1e-10), 2000,
               M=lambda r: dinv * r)
    it_g, it_d = int(res_g.iterations), int(res_d.iterations)
    assert bool(res_g.converged) and it_g <= 25, (it_g, it_d)
    assert it_g * 3 < it_d, (it_g, it_d)
    err = float(jnp.max(jnp.abs(res_g.x - res_d.x)))
    assert err < 1e-7, err


@pytest.mark.medium
def test_extruded_gmg_z_semicoarsening():
    """A base mesh built WITHOUT refinement (micro_particle's
    'global refinements = 0', so QuadMesh.history is empty) still gets a
    real hierarchy: z-only semi-coarsening levels with identity in-plane
    transfer and a dense coarse solve that resolves every in-plane mode —
    the ML-AMG role for extruded meshes that were never refined
    (navier_stokes_preconditioner.cc:465-562)."""
    from adaflo_tpu.fe.constraints import Constraints
    from adaflo_tpu.fe.extruded_space import ExtrudedSpace
    from adaflo_tpu.fe.mapped_space import CellMapping
    from adaflo_tpu.mesh.extruded import ExtrudedMesh
    from adaflo_tpu.mesh.unstructured import QuadMesh
    from adaflo_tpu.ops.forest_ops import ForestHelmholtzOperator
    from adaflo_tpu.solvers.krylov import cg
    from adaflo_tpu.solvers.mapped_multigrid import ExtrudedGMG

    base = QuadMesh.subdivided_hyper_rectangle((12, 12), (0.0, 0.0), (1.0, 1.0))
    base.distort_random(0.1, seed=11)
    assert not base.history  # never refined: no snapshot hierarchy
    mesh = ExtrudedMesh(base, 8, 0.5, z_boundary_id=1)
    sp = ExtrudedSpace(mesh, 1, CellMapping(base, 3))
    bids = sorted(mesh.all_boundary_ids())

    gmg = ExtrudedGMG(sp, bids, sp.n_dofs_padded)
    sizes = [l.space.n_dofs for l in gmg.levels]
    assert len(gmg.levels) >= 2, sizes
    assert gmg.direct_coarse, sizes
    # z-only levels keep the base resolution
    for lev in gmg.levels:
        assert lev.space.base_space.n_dofs == sp.base_space.n_dofs
    # transfers are a partition of unity
    for lev in gmg.levels[:-1]:
        w = np.asarray(lev.t_weights)
        assert np.abs(w.sum(axis=1) - 1.0).max() < 1e-12

    con = Constraints(sp.n_dofs)
    con.add_dirichlet(
        np.unique(np.concatenate([sp.boundary_dofs(b) for b in bids]))
    )
    con.close()
    op = ForestHelmholtzOperator(sp, con)
    rng = np.random.RandomState(5)
    b = jnp.asarray(con.condense(jnp.asarray(rng.rand(sp.n_dofs_padded))))
    # pure-stiffness (Poisson) — the Schur-complement operator whose
    # Chebyshev-only treatment capped micro_particle_3d's first solve
    A = lambda x: op.vmult(x, alpha=0.0, beta=1.0)
    state = gmg.compute(0.0, 1.0)
    res_g = cg(
        A, b, jnp.zeros_like(b), jnp.float64(1e-10), 200,
        M=lambda r: gmg.vmult(state, r),
    )
    it_g = int(res_g.iterations)
    assert bool(res_g.converged) and it_g <= 25, it_g
