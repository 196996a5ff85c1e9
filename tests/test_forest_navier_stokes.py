"""Navier-Stokes on adaptive forest meshes (hanging nodes).

Two-pronged validation mirroring the reference's adaptive runs
(/root/reference/tests/beltrami.cc on adaptively refined grids,
navier_stokes.cc AMR paths):
1. a uniform forest must reproduce the structured-mesh solver exactly
   (same discrete problem, different dof numbering);
2. a manufactured polynomial Stokes solution (quadratic velocity, linear
   pressure) is IN the Q2/Q1 Taylor-Hood space even with hanging nodes, so
   the discrete solution matches it to solver tolerance.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from adaflo_tpu.mesh.forest import ForestMesh
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes


def _stokes_parameters():
    return FlowParameters.from_string(
        """
subsection Time stepping
  set end time  = 1
  set step size = 1
end
subsection Navier-Stokes
  set physical type      = stokes
  set dimension          = 2
  set global refinements = 0
  set velocity degree    = 2
  set viscosity          = 1.0
  subsection Solver
    set NL max iterations  = 12
    set NL tolerance       = 1.e-12
    set lin max iterations = 300
    set lin tolerance      = 1.e-7
  end
end
subsection Output options
  set output verbosity = 0
end
"""
    )


def _transient_parameters():
    return FlowParameters.from_string(
        """
subsection Time stepping
  set scheme    = bdf_2
  set end time  = 0.15
  set step size = 0.05
end
subsection Navier-Stokes
  set physical type      = incompressible
  set dimension          = 2
  set global refinements = 0
  set velocity degree    = 2
  set viscosity          = 0.05
  set density            = 1.0
  subsection Solver
    set NL max iterations  = 12
    set NL tolerance       = 1.e-9
    set lin max iterations = 300
    set lin tolerance      = 1.e-6
  end
end
subsection Output options
  set output verbosity = 0
end
"""
    )


def _u_exact(p):
    # divergence-free quadratic: u = (y^2, x^2)
    return np.stack([p[:, 1] ** 2, p[:, 0] ** 2])


def _p_exact(p):
    # zero-mean linear pressure on the unit square
    return p[:, 0] + p[:, 1] - 1.0


def _body_force(ns):
    """f = -mu lap u + grad p = (-2, -2) + (1, 1) = (-1, -1)."""
    op = ns.operator
    E = ns.mesh.n_cells
    ones = jnp.ones((E, op.ev_u.n_q))
    rows = []
    for c in range(2):
        f = op.ev_u.integrate_values(-1.0 * ones)
        r = op.lat_u.scatter_add(f)
        rows.append(ns.constraints_u[c].condense(r))
    return jnp.stack(rows)


def _solve_stokes(mesh, refine_center=None):
    par = _stokes_parameters()
    ns = NavierStokes(par, mesh)
    ns.set_velocity_dirichlet_boundary(
        0, lambda x, t: _u_exact(x)
    )
    ns.fix_pressure_constant(0)
    ns.setup_problem()
    if refine_center is not None:
        centers, _ = mesh.cell_geometry()
        d = np.linalg.norm(centers - refine_center, axis=1)
        assert ns.adapt_mesh((d < 0.3).astype(np.int8))
        assert len(ns.u_space.hanging_slave) > 0
    ns.user_rhs[0] = _body_force(ns)
    ns.advance_time_step()
    return ns


def _errors(ns):
    u = np.asarray(ns.solution[0])
    p = np.asarray(ns.solution[1])
    eu = np.abs(u[:, : ns.u_space.n_dofs] - _u_exact(ns.u_space.node_coords)).max()
    # pressure fixed up to a constant: compare shifted to zero mean of exact
    pv = p[: ns.p_space.n_dofs]
    pe = _p_exact(ns.p_space.node_coords)
    ep = np.abs((pv - pv.mean()) - (pe - pe.mean())).max()
    return eu, ep


def test_stokes_uniform_forest_matches_structured():
    par_refines = 2
    sm = StructuredMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    sm.refine_global(par_refines)
    ns_s = _solve_stokes(sm)
    fm = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    fm.refine_global(par_refines)
    ns_f = _solve_stokes(fm)
    assert ns_f.u_space.n_dofs == ns_s.u_space.n_dofs
    eu_s, ep_s = _errors(ns_s)
    eu_f, ep_f = _errors(ns_f)
    # both exact to solver tolerance; and they agree with each other
    assert eu_s < 1e-8 and eu_f < 1e-8, (eu_s, eu_f)
    assert ep_s < 1e-6 and ep_f < 1e-6, (ep_s, ep_f)


def test_stokes_hanging_node_mesh_exact():
    fm = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    fm.refine_global(1)
    ns = _solve_stokes(fm, refine_center=np.array([0.35, 0.45]))
    eu, ep = _errors(ns)
    assert eu < 1e-8, eu
    assert ep < 1e-6, ep


def test_navier_stokes_hanging_node_time_stepping():
    """Transient NS with convection on a hanging-node mesh: the quadratic
    steady Stokes pair is NOT a NS solution, so just verify the nonlinear
    solver converges and stays stable over a few steps with nonzero
    velocity."""
    par = _transient_parameters()
    fm = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    fm.refine_global(1)
    ns = NavierStokes(par, fm)
    # lid-driven cavity with a smooth lid profile
    def lid(x, t):
        u = np.zeros((2, len(x)))
        on_lid = np.abs(x[:, 1] - 1.0) < 1e-12
        u[0] = np.where(on_lid, np.sin(np.pi * x[:, 0]) ** 2, 0.0)
        return u

    ns.set_velocity_dirichlet_boundary(0, lid)
    ns.fix_pressure_constant(0)
    ns.setup_problem()
    centers, _ = fm.cell_geometry()
    flags = (centers[:, 1] > 0.6).astype(np.int8)
    assert ns.adapt_mesh(flags)
    while not ns.time_stepping.at_end():
        ns.advance_time_step()
    u = np.asarray(ns.solution[0])
    assert np.isfinite(u).all()
    assert np.abs(u).max() > 0.1  # the flow actually moves
    # hanging-node consistency of the final solution (value table keeps
    # Dirichlet masters, matching the inhomogeneous boundary data)
    for c in range(2):
        v = jnp.asarray(u[c])
        assert (
            np.abs(
                np.asarray(ns.constraints_u[c].distribute_values(v)) - u[c]
            ).max()
            < 1e-10
        )


def test_adapt_mesh_transfer_preserves_solution():
    """adapt_mesh must nodal-transfer the current state: a quadratic field
    survives refinement bit-for-bit (it is in both spaces)."""
    fm = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    fm.refine_global(1)
    par = _stokes_parameters()
    ns = NavierStokes(par, fm)
    ns.set_velocity_dirichlet_boundary(0, lambda x, t: _u_exact(x))
    ns.fix_pressure_constant(0)
    ns.setup_problem()
    u0 = _u_exact(ns.u_space.node_coords)
    ns.solution[0] = ns.solution[0].at[:, : ns.u_space.n_dofs].set(
        jnp.asarray(u0)
    )
    flags = np.zeros(fm.n_cells, dtype=np.int8)
    flags[:3] = 1
    assert ns.adapt_mesh(flags)
    u1 = np.asarray(ns.solution[0])[:, : ns.u_space.n_dofs]
    assert np.abs(u1 - _u_exact(ns.u_space.node_coords)).max() < 1e-12


def test_drivencavity_amr_loop():
    """The reference's drivencavity AMR loop (drivencavity.cc:384-412) on
    the forest: stationary solve -> Kelly pressure indicators ->
    refine_and_coarsen_fixed_number -> adapt + transfer -> re-solve. The
    mesh must refine near the lid corners (largest pressure gradients) and
    every solve must converge."""
    import io

    from adaflo_tpu.applications.drivencavity import DrivenCavityProblem

    par = FlowParameters.from_string(
        """
subsection Time stepping
  set end time = 1
  set step size = 1
end
subsection Navier-Stokes
  set physical type      = incompressible stationary
  set dimension          = 2
  set global refinements = 8
  set adaptive refinements = 1
  set velocity degree    = 2
  set viscosity          = 0.05
  subsection Solver
    set NL max iterations  = 15
    set NL tolerance       = 1.e-8
    set lin max iterations = 150
    set lin tolerance      = 1.e-4
  end
end
subsection Output options
  set output verbosity = 1
end
"""
    )
    par.output_filename = ""
    buf = io.StringIO()
    prob = DrivenCavityProblem(par, out=buf)
    prob.run()
    text = buf.getvalue()
    assert text.count("conv.]") == 2
    cells = [
        int(l.split(":")[1].strip(" ."))
        for l in text.splitlines()
        if "active cells" in l
    ]
    assert len(cells) == 2 and cells[1] > cells[0]
    ns = prob.navier_stokes
    assert len(ns.u_space.hanging_slave) > 0
    # the refined cells concentrate near the lid (y close to 1): the
    # pressure singularities sit at the two upper corners
    fine = ns.mesh.cell_geometry()[0][
        prob.navier_stokes.u_space.levels == ns.u_space.levels.max()
    ]
    assert np.median(fine[:, 1]) > 0.5
    u = np.asarray(ns.solution[0])
    assert np.isfinite(u).all()


def test_forest_sharded_step_multichip():
    """The adaptive (hanging-node) NS step sharded over the 8-device CPU
    mesh: GSPMD partitions the index-map gather/scatter kernels; one full
    time step must run and remain hanging-consistent."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    from adaflo_tpu.parallel.sharding import shard_solver_state, solver_mesh

    par = _transient_parameters()
    fm = ForestMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    fm.refine_global(1)
    ns = NavierStokes(par, fm, pad_dofs_to=8)
    ns.set_velocity_dirichlet_boundary(0, lambda x, t: _u_exact(x))
    ns.fix_pressure_constant(0)
    ns.setup_problem()
    centers, _ = fm.cell_geometry()
    # refine the left half: 16 + 8*3 = 40 cells, divisible by the 8-device
    # mesh (cell index maps shard on the cell axis)
    assert ns.adapt_mesh((centers[:, 0] < 0.5).astype(np.int8))
    assert ns.mesh.n_cells % 8 == 0 and len(ns.u_space.hanging_slave) > 0
    mesh = solver_mesh(jax.devices()[:8])
    shard_solver_state(ns, mesh)
    ns.user_rhs[0] = _body_force(ns)
    ns.advance_time_step()
    u = np.asarray(ns.solution[0])
    assert np.isfinite(u).all() and np.abs(u).max() > 0.1
