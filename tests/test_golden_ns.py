"""Golden-output integration tests for the single-phase NS drivers.

Mirrors the reference test strategy (SURVEY.md section 4): driver x prm x
stored normalized output, numdiff-tolerant comparison, plus hard assertions
on physics anchors taken from the *reference's* golden outputs where the
discretization matches exactly.
"""

import os
from pathlib import Path

import numpy as np
import pytest

from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.testing import compare_with_golden, run_driver_capture

HERE = Path(__file__).parent
PRMS = HERE / "prms"
GOLDEN = HERE / "golden"

SLOW = os.environ.get("ADAFLO_RUN_SLOW") is None


def test_poiseuille_small_golden():
    from adaflo_tpu.drivers.poiseuille import main

    text = run_driver_capture(main, str(PRMS / "poiseuille_ns_small.prm"))
    # sanity anchors before golden comparison: steady state reached
    assert "converged." in text
    lines = [l for l in text.splitlines() if "L2-Errors" in l]
    last_eu = float(lines[-1].split("=")[-1])
    assert last_eu < 1e-5, f"channel did not reach steady profile: {lines[-1]}"
    compare_with_golden(text, GOLDEN / "poiseuille_ns_small.output")


def test_beltrami_2d_small_golden():
    from adaflo_tpu.drivers.beltrami import main

    text = run_driver_capture(main, str(PRMS / "beltrami_2d_small.prm"))
    lines = [l for l in text.splitlines() if "absolute" in l]
    # initial interpolation errors must be tiny for Q3 on the Taylor vortex
    first_ep = float(lines[0].split("=")[1].split(",")[0])
    first_eu = float(lines[0].split("=")[-1])
    assert first_eu < 1e-6 and first_ep < 1e-4
    compare_with_golden(text, GOLDEN / "beltrami_2d_small.output")


def test_poiseuille_reference_anchor():
    """Run the reference poiseuille_ns configuration to t=2 and compare the
    L2 velocity error against the value in the reference's golden output
    (tests/poiseuille_ns.output: ||e_u||_L2 = 0.1321 after step 4).
    Discretization-determined, so it must reproduce across codebases."""
    from adaflo_tpu.drivers.poiseuille import ChannelProblem
    from adaflo_tpu.utils.errors import l2_error
    from adaflo_tpu.drivers.poiseuille import exact_p, exact_u

    par = FlowParameters.from_file(str(PRMS / "poiseuille_ns.prm"))
    par.end_time = 2.0
    par.output_verbosity = 0
    import io

    prob = ChannelProblem(par, out=io.StringIO())
    prob.run()
    ns = prob.navier_stokes
    eu = l2_error(
        ns.u_space, ns.solution[0], exact_u(0.5, 2), n_components=2
    )
    ep = l2_error(ns.p_space, ns.solution[1], exact_p)
    assert abs(eu - 0.1321) < 2e-4, eu
    assert ep < 1e-8, ep


def test_beltrami_3d_interpolation_anchor():
    """t=0 interpolation errors on the reference beltrami_3d mesh must match
    the reference golden output (beltrami_3d.output:5-7): dof counts
    107811 + 4913, ||e_p|| = 0.02383, ||e_u|| = 0.0001993, divergence ~ 0."""
    import io
    import jax.numpy as jnp

    from adaflo_tpu.drivers.beltrami import (
        BeltramiProblem,
        exact_p,
        exact_u,
    )
    from adaflo_tpu.utils.errors import (
        cell_divergence_norm,
        interpolate,
        l2_error,
    )

    par = FlowParameters.from_string(
        """
subsection Navier-Stokes
  set dimension = 3
  set global refinements = 3
  set velocity degree = 2
end
subsection Output options
  set output verbosity = 0
end
"""
    )
    prob = BeltramiProblem(par, out=io.StringIO())
    ns = prob.navier_stokes
    ns.set_velocity_dirichlet_boundary(0, lambda x, t: exact_u(1.0, 3)(x, t))
    ns.fix_pressure_constant(0, lambda x, t: exact_p(1.0, 3)(x, t))
    ns.setup_problem()
    assert prob.mesh.n_cells == 4096
    nu, npp = ns.n_dofs
    assert (nu, npp) == (107811, 4913)
    ns.solution[0] = jnp.asarray(interpolate(ns.u_space, exact_u(1.0, 3)))
    ns.solution[1] = jnp.asarray(interpolate(ns.p_space, exact_p(1.0, 3)))
    ep = l2_error(ns.p_space, ns.solution[1], exact_p(1.0, 3), 0.0, 4)
    eu = l2_error(ns.u_space, ns.solution[0], exact_u(1.0, 3), 0.0, 4, n_components=3)
    div = cell_divergence_norm(ns.u_space, ns.solution[0])
    assert abs(ep - 0.02383) < 1e-5, ep
    assert abs(eu - 0.0001993) < 1e-7, eu
    assert div < 1e-10, div


def test_poiseuille_stokes_golden():
    from adaflo_tpu.drivers.poiseuille import main

    text = run_driver_capture(main, str(PRMS / "poiseuille_stokes.prm"))
    # steady Stokes: quadratic/linear exact solution resolved to roundoff
    lines = [l for l in text.splitlines() if "L2-Errors" in l]
    eu = float(lines[-1].split("=")[-1])
    ep = float(lines[-1].split("=")[1].split(",")[0])
    assert eu < 1e-9 and ep < 1e-8, lines[-1]
    compare_with_golden(text, GOLDEN / "poiseuille_stokes.output")


def test_poiseuille_projection_golden():
    from adaflo_tpu.drivers.poiseuille import main

    text = run_driver_capture(main, str(PRMS / "poiseuille_ns_proj_small.prm"))
    lines = [l for l in text.splitlines() if "L2-Errors" in l]
    eu = float(lines[-1].split("=")[-1])
    assert eu < 5e-3, lines[-1]
    compare_with_golden(text, GOLDEN / "poiseuille_ns_proj_small.output")


def test_poiseuille_stationary_golden():
    from adaflo_tpu.drivers.poiseuille import main

    text = run_driver_capture(main, str(PRMS / "poiseuille_stationary.prm"))
    lines = [l for l in text.splitlines() if "L2-Errors" in l]
    eu = float(lines[-1].split("=")[-1])
    assert eu < 1e-9, lines[-1]
    compare_with_golden(text, GOLDEN / "poiseuille_stationary.output")


def test_rising_bubble_short_golden():
    from adaflo_tpu.drivers.rising_bubble import TwoPhaseParameters, MicroFluidicProblem
    import contextlib
    import io

    par = TwoPhaseParameters.from_file(str(PRMS / "rising_bubble_ls_short.prm"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        prob = MicroFluidicProblem(par)
        prob.run()
    text = buf.getvalue()
    # physics sanity: bubble rising, circularity close to 1
    lines = [l for l in text.splitlines() if "velocity:" in l]
    vy = float(lines[-1].split()[-1])
    assert 0.02 < vy < 0.05, lines[-1]
    circ = [l for l in text.splitlines() if "circularity" in l]
    assert float(circ[-1].split()[-1]) > 0.999
    compare_with_golden(text, GOLDEN / "rising_bubble_ls_short.output")


@pytest.mark.skipif(
    os.environ.get("ADAFLO_RUN_SLOW") is None,
    reason="full-mesh two-phase anchor; run with ADAFLO_RUN_SLOW=1",
)
def test_rising_bubble_reference_anchor():
    """Step-1 bubble velocity on the full reference mesh must match the
    reference golden value 0.010293956 (rising_bubble_ls.output:13).
    (Validated end-to-end to t=1.0: circularity 0.9709903 and
    v_y 0.24195432 identical to the reference in all printed digits;
    see tests/golden/rising_bubble_ls.output.)"""
    from adaflo_tpu.drivers.rising_bubble import TwoPhaseParameters, MicroFluidicProblem
    import io

    par = TwoPhaseParameters.from_file(str(PRMS / "rising_bubble_ls.prm"))
    par.end_time = 0.02
    par.output_verbosity = 0
    prob = MicroFluidicProblem(par, out=io.StringIO())
    prob.run()
    data = prob.solution_data[-1]
    vy = data[5]
    circ = data[3]
    assert abs(vy - 0.010293956) < 2e-8, vy
    assert abs(circ - 0.99997938) < 1e-7, circ


def test_beltrami_augmented_taylor_hood_golden():
    """Augmented TH: element-wise divergence-free solutions (the cell
    divergence must sit at solver-tolerance level, not discretization
    level)."""
    from adaflo_tpu.drivers.beltrami import main

    text = run_driver_capture(main, str(PRMS / "beltrami_2d_augp_small.prm"))
    divs = [
        float(l.split("=")[-1])
        for l in text.splitlines()
        if "Cell divergence" in l
    ]
    assert all(d < 1e-9 for d in divs[1:]), divs
    compare_with_golden(text, GOLDEN / "beltrami_2d_augp_small.output")


@pytest.mark.skipif(
    os.environ.get("ADAFLO_RUN_SLOW") is None,
    reason="full 3D Beltrami run (~20 min); run with ADAFLO_RUN_SLOW=1",
)
def test_beltrami_3d_full_golden():
    """Full beltrami_3d run; the stored golden's u-error trajectory matches
    the reference's golden output to all 4 printed digits at every output
    time (0.0007541 / 0.0005213 / 0.0003242 / 0.0001974 / 0.0001208)."""
    from adaflo_tpu.drivers.beltrami import main

    text = run_driver_capture(main, str(PRMS / "beltrami_3d.prm"))
    compare_with_golden(text, GOLDEN / "beltrami_3d.output")


def test_beltrami_2d_amr_interpolation_anchor():
    """t=0 anchors on the reference's EXACT 2D AMR mesh with hanging nodes
    (beltrami_2d.output:2-7): 1048 cells, 34158 + 9663 dofs, all four error
    digits identical. Exercises the adaptive forest path (entity-tagged dofs
    + hanging constraints) against real reference numbers."""
    import io
    import jax.numpy as jnp

    from adaflo_tpu.drivers.beltrami import BeltramiProblem, exact_p, exact_u
    from adaflo_tpu.utils.errors import (
        cell_divergence_norm,
        interpolate,
        l2_error,
        l2_norm,
    )

    par = FlowParameters.from_string(
        """
subsection Navier-Stokes
  set dimension = 2
  set global refinements = 4
  set velocity degree = 4
end
subsection Output options
  set output verbosity = 0
end
"""
    )
    prob = BeltramiProblem(par, out=io.StringIO())
    ns = prob.navier_stokes
    ns.set_velocity_dirichlet_boundary(0, lambda x, t: exact_u(1.0, 2)(x, t))
    ns.fix_pressure_constant(0, lambda x, t: exact_p(1.0, 2)(x, t))
    ns.setup_problem()
    assert prob.mesh.n_cells == 1048
    nu, npp = ns.n_dofs
    assert (nu, npp) == (34158, 9663)
    ns.solution[0] = jnp.asarray(interpolate(ns.u_space, exact_u(1.0, 2)))
    p0 = interpolate(ns.p_space, exact_p(1.0, 2))
    ns.solution[1] = ns.solution[1].at[: len(p0)].set(jnp.asarray(p0))
    ep = l2_error(ns.p_space, ns.solution[1], exact_p(1.0, 2), 0.0, 6)
    eu = l2_error(
        ns.u_space, ns.solution[0], exact_u(1.0, 2), 0.0, 6, n_components=2
    )
    div = cell_divergence_norm(ns.u_space, ns.solution[0])
    # reference: 9.507e-09 / 8.461e-12 / 2.746e-16
    assert abs(ep - 9.507e-09) < 5e-13, ep
    assert abs(eu - 8.461e-12) < 5e-15, eu
    assert div < 1e-14
    # relative errors: 2.291e-08 / 9.877e-12
    assert abs(ep / l2_norm(ns.p_space, ns.solution[1], 4) - 2.291e-08) < 1e-11
    assert (
        abs(
            eu / l2_norm(ns.u_space, ns.solution[0], 4, n_components=2)
            - 9.877e-12
        )
        < 5e-15
    )


@pytest.mark.skipif(
    os.environ.get("ADAFLO_RUN_SLOW") is None,
    reason="full 2D AMR Beltrami run (~30 min); run with ADAFLO_RUN_SLOW=1",
)
def test_beltrami_2d_amr_full_anchors():
    """Full 40-step beltrami_2d on the reference's hanging-node mesh: the
    first Newton residual of step 1 is assembly-determined and must match
    the reference exactly; L2 errors at the output ticks must match to the
    printed precision (beltrami_2d.output)."""
    import io

    from adaflo_tpu.drivers.beltrami import BeltramiProblem

    par = FlowParameters.from_file(
        "/root/reference/tests/beltrami_2d.prm"
        if os.path.exists("/root/reference/tests/beltrami_2d.prm")
        else str(PRMS / "beltrami_2d_small.prm")
    )
    par.output_filename = ""
    buf = io.StringIO()
    prob = BeltramiProblem(par, out=buf)
    prob.run()
    out = buf.getvalue()
    assert "4.149e-01   1.021e-03" in out  # step-1 assembly anchor
    # error anchors at t = 0.04 ... 0.4 (reference lines 88, 171, ...)
    for anchor in (
        "||e_u||_L2 = 4.449e-05",
        "||e_u||_L2 = 2.515e-05",
        "||e_u||_L2 = 1.378e-05",
    ):
        assert anchor in out, anchor


def test_phasefield_poiseuille_golden():
    """Moving-contact-line channel (Cahn-Hilliard with wetting), 3 steps on
    the reference configuration (phasefield_poiseuille.cc). Reference
    anchors reproduced exactly: header dof counts, every t=0 diagnostic
    (circularity 4.6894721), the capillary time-step sequence
    (0.156/0.154/0.152) and the per-step interface positions/angles/contact
    velocity to all printed digits; CH Newton residual trajectories match to
    3 digits with our GMG helper converging in fewer iterations."""
    from adaflo_tpu.drivers.phasefield_poiseuille import ChannelProblem
    from adaflo_tpu.drivers.rising_bubble import TwoPhaseParameters
    import io

    par = TwoPhaseParameters.from_file(str(PRMS / "phasefield_poiseuille.prm"))
    par.output_filename = ""
    buf = io.StringIO()
    prob = ChannelProblem(par, out=buf)
    prob.run(n_steps=3)
    text = buf.getvalue()
    # hard reference anchors (phasefield_poiseuille.output)
    assert "Number of Navier-Stokes degrees of freedom: 28291 (25090 + 3201)." in text
    assert "Number of phase field degrees of freedom: 6402 (3201 + 3201)." in text
    assert "Degree of circularity: 4.6894721" in text
    assert "(dt = 0.156)" in text and "(dt = 0.154)" in text and "(dt = 0.152)" in text
    assert "Interface location lower wall/angle:  2.561 / 122.8" in text
    assert "Interface location upper wall/angle:  2.561 / 57.17" in text
    assert "Interface velocity:                   0.3898" in text
    compare_with_golden(text, GOLDEN / "phasefield_poiseuille.output")
