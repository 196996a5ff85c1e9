"""Aux subsystems: checkpoint/resume, timers, vtu output, sharding."""

import io
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaflo_tpu.parameters import FlowParameters


def _small_channel(end_time=2.0):
    from adaflo_tpu.drivers.poiseuille import ChannelProblem

    par = FlowParameters.from_string(
        f"""
subsection Time stepping
  set end time = {end_time}
  set step size = 0.5
end
subsection Navier-Stokes
  set dimension = 2
  set global refinements = 2
  set velocity degree = 2
  set viscosity = 0.5
  subsection Solver
    set NL tolerance = 1.e-12
    set lin max iterations = 120
    set lin tolerance = 1.e-6
  end
end
subsection Output options
  set output verbosity = 0
end
"""
    )
    prob = ChannelProblem(par, out=io.StringIO())
    return prob


@pytest.mark.medium
def test_checkpoint_resume_exact(tmp_path):
    """Resuming from a checkpoint reproduces the uninterrupted trajectory
    exactly (the BDF-2 history is part of the state)."""
    from adaflo_tpu.utils.checkpoint import load_navier_stokes, save_navier_stokes

    # continuous run to t=2
    prob = _small_channel()
    prob.run()
    ref = np.asarray(prob.navier_stokes.solution[0])

    # run to t=1, checkpoint, new solver, resume to t=2
    prob1 = _small_channel()
    ns = prob1.navier_stokes
    ns.set_no_slip_boundary(0)
    ns.set_symmetry_boundary(3)
    from adaflo_tpu.drivers.poiseuille import exact_p

    ns.set_open_boundary_with_normal_flux(1, lambda x, t: exact_p(x))
    ns.set_open_boundary_with_normal_flux(2, lambda x, t: exact_p(x))
    from adaflo_tpu.functions import ZeroFunction

    ns.setup_problem(ZeroFunction(2))
    while ns.time_stepping.now() < 1.0 - 1e-12:
        ns.advance_time_step()
    ck = tmp_path / "state.npz"
    save_navier_stokes(ns, str(ck))

    prob2 = _small_channel()
    ns2 = prob2.navier_stokes
    ns2.set_no_slip_boundary(0)
    ns2.set_symmetry_boundary(3)
    ns2.set_open_boundary_with_normal_flux(1, lambda x, t: exact_p(x))
    ns2.set_open_boundary_with_normal_flux(2, lambda x, t: exact_p(x))
    ns2.setup_problem(ZeroFunction(2))
    load_navier_stokes(ns2, str(ck))
    assert abs(ns2.time_stepping.now() - 1.0) < 1e-12
    while not ns2.time_stepping.at_end():
        ns2.advance_time_step()
    resumed = np.asarray(ns2.solution[0])
    assert np.allclose(resumed, ref, atol=1e-11)


def test_timer_output():
    from adaflo_tpu.utils.timer import Statistics, TimerOutput

    t = TimerOutput()
    with t.section("NS solve system."):
        sum(range(1000))
    with t.section("NS solve system."):
        pass
    text = t.summary()
    assert "NS solve system." in text
    assert t.sections["NS solve system."][0] == 2
    s = Statistics()
    s.add("mat-vec", 0.5, 10)
    buf = io.StringIO()
    s.print_block(buf)
    assert "mat-vec" in buf.getvalue()


def test_vtu_output_timeseries(tmp_path):
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.utils.output import TimeSeriesWriter

    mesh = StructuredMesh((2, 2), (0, 0), (1, 1))
    sp = ScalarSpace(mesh, 2)
    u = np.stack([sp.node_coords[:, 0], sp.node_coords[:, 1]])
    w = TimeSeriesWriter(str(tmp_path / "data"))
    for t in (0.0, 0.5):
        w.write(mesh, {"velocity": (sp, u, 2)}, t, 2)
    assert (tmp_path / "data-0000.vtu").exists()
    assert (tmp_path / "data-0001.vtu").exists()
    pvd = (tmp_path / "data.pvd").read_text()
    assert 'timestep="0.5"' in pvd


@pytest.mark.medium
def test_driver_vtk_output(tmp_path):
    """output vtk files = 1 produces a vtu series from the driver loop."""
    import contextlib

    from adaflo_tpu.drivers.poiseuille import ChannelProblem

    par = FlowParameters.from_string(
        f"""
subsection Time stepping
  set end time = 1
  set step size = 0.5
end
subsection Navier-Stokes
  set dimension = 2
  set global refinements = 1
  set velocity degree = 2
  set viscosity = 0.5
end
subsection Output options
  set output verbosity = 0
  set output vtk files = 1
  set output frequency = 0.5
  set output filename = {tmp_path}/chan
end
"""
    )
    prob = ChannelProblem(par, out=io.StringIO())
    prob.navier_stokes.output_solution = prob.navier_stokes.output_solution
    ns = prob.navier_stokes

    def run_with_output():
        prob.run()
        ns.output_solution(par.output_filename)

    run_with_output()
    ns.output_solution(par.output_filename)
    assert any(tmp_path.glob("chan-*.vtu"))


@pytest.mark.medium
def test_sharp_interface_solvers_smoke():
    """All four sharp-interface method selections run a step and produce
    finite, rising flow."""
    import io
    import tempfile

    from adaflo_tpu.drivers.rising_bubble import TwoPhaseParameters
    from adaflo_tpu.drivers.sim_rising_bubble import MicroFluidicProblem

    base = """
subsection Problem-specific
  set two-phase method = METHOD
end
subsection Two phase
  set density = 1.
  set density difference = -0.9
  set viscosity = 0.01
  set viscosity difference = -0.009
  set surface tension = 0.0245
  set epsilon = 1.5
  set gravity = 0.98
  set concentration subdivisions = 2
end
subsection Time stepping
  set scheme = bdf_2
  set end time = 0.02
  set step size = 0.02
end
subsection Navier-Stokes
  set dimension = 2
  set global refinements = 1
  set velocity degree = 2
  subsection Solver
    set NL max iterations = 6
    set NL tolerance = 1.e-8
    set lin max iterations = 50
    set lin tolerance = 1.e-4
  end
end
subsection Output options
  set output verbosity = 0
end
"""
    for method in ("sharp level set", "front tracking", "level set"):
        with tempfile.NamedTemporaryFile("w", suffix=".prm", delete=False) as f:
            f.write(base.replace("METHOD", method))
            path = f.name
        par = TwoPhaseParameters.from_file(path)
        prob = MicroFluidicProblem(par, out=io.StringIO())
        prob.run()
        u = np.asarray(prob.navier_stokes.solution[0])
        assert np.isfinite(u).all(), method
        assert 1e-4 < np.abs(u).max() < 10.0, (method, np.abs(u).max())


def test_marching_squares_circle():
    """Contour length of a tanh circle profile approximates 2 pi r."""
    import jax.numpy as jnp

    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.twophase.sharp_interface import marching_squares

    mesh = StructuredMesh((40, 40), (0, 0), (2, 2))
    sp = ScalarSpace(mesh, 2, "iso_q1")
    x = sp.node_coords
    r = np.linalg.norm(x - 1.0, axis=1)
    c = jnp.asarray(-np.tanh((r - 0.5) / 0.05))
    segs = marching_squares(sp, c)
    length = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1).sum()
    assert abs(length - 2 * np.pi * 0.5) < 0.01, length


def test_point_evaluation_roundtrip():
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.utils.point_eval import evaluate_at_points, winding_number_inside

    mesh = StructuredMesh((4, 4), (0, 0), (1, 1))
    sp = ScalarSpace(mesh, 2)
    vals = sp.node_coords[:, 0] ** 2 + 2 * sp.node_coords[:, 1]
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, (50, 2))
    got = evaluate_at_points(sp, vals, pts)
    assert np.allclose(got, pts[:, 0] ** 2 + 2 * pts[:, 1], atol=1e-12)
    # winding number: unit circle polygon
    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    poly = 0.5 + 0.3 * np.stack([np.cos(t), np.sin(t)], axis=1)
    inside = winding_number_inside(poly, pts)
    expect = np.linalg.norm(pts - 0.5, axis=1) < 0.3
    # boundary-grazing points may disagree; demand 98% match
    assert (inside == expect).mean() > 0.98


