"""Adaptive (forest) two-phase level set: the rising_bubble_ls_adap
configuration of the reference.

Reference anchors from tests/rising_bubble_ls_adap.output: the AMR warm-up
mesh sequence (200 -> 536 -> 1316 -> 836 cells with exact dof counts), the
initial reinit counts (13 + 12), and the per-step bubble diagnostics
(velocity/circularity/center to the printed 8 digits).
"""

import io
import os
from pathlib import Path

import numpy as np
import pytest

from adaflo_tpu.drivers.rising_bubble import (
    MicroFluidicProblem,
    TwoPhaseParameters,
    initial_distance,
)

SLOW = os.environ.get("ADAFLO_RUN_SLOW") is None
ADAP_PRM = Path("/root/reference/tests/rising_bubble_ls_adap.prm")


def _load_params():
    if ADAP_PRM.exists():
        return TwoPhaseParameters.from_file(str(ADAP_PRM))
    par = TwoPhaseParameters()
    par.dimension = 2
    par.global_refinements = 1
    par.adaptive_refinements = 2
    return par


def test_rising_bubble_adap_warmup_parity():
    """The AMR warm-up reproduces the reference's mesh/dof sequence exactly
    (rising_bubble_ls_adap.output:1-20) including the full corner-balanced
    2:1 closure."""
    par = _load_params()
    par.end_time = 0.0  # setup only
    buf = io.StringIO()
    prob = MicroFluidicProblem(par, out=buf)
    from adaflo_tpu.functions import ZeroFunction

    s = prob.solver
    s.set_no_slip_boundary(0)
    s.fix_pressure_constant(0)
    s.set_symmetry_boundary(2)
    s.setup_problem(ZeroFunction(2), initial_distance)
    text = buf.getvalue()
    for anchor in (
        "Number of active cells: 200.",
        "Number of Navier-Stokes degrees of freedom: 1953 (1722 + 231).",
        "Number of level set degrees of freedom: 3321.",
        "Number of active cells: 536.",
        "Number of Navier-Stokes degrees of freedom: 5115 (4526 + 589).",
        "Number of level set degrees of freedom: 8827.",
        "Number of active cells: 1316.",
        "Number of Navier-Stokes degrees of freedom: 12453 (11050 + 1403).",
        "Number of active cells: 836.",
        "Number of Navier-Stokes degrees of freedom: 8193 (7266 + 927).",
        "Number of level set degrees of freedom: 14061.",
        "Mesh size (largest/smallest element length at finest level): 0.025 / 0.025",
        "reinitialize (13 + 12)",
    ):
        assert anchor in text, f"missing: {anchor}\n{text}"


@pytest.mark.skipif(SLOW, reason="slow tier (ADAFLO_RUN_SLOW)")
def test_rising_bubble_adap_step_parity():
    """Three adaptive time steps match the reference's bubble diagnostics
    to the printed digits (rising_bubble_ls_adap.output steps 1-3)."""
    par = _load_params()
    par.end_time = 0.06
    buf = io.StringIO()
    prob = MicroFluidicProblem(par, out=buf)
    prob.run()
    data = np.asarray(prob.solution_data)
    # rows: (t, area, perimeter, circularity, vx, vy, comx, comy)
    assert abs(data[1][3] - 0.99997938) < 2e-8  # circularity step 1
    assert abs(data[1][5] - 0.010292377) < 2e-8  # vy step 1
    assert abs(data[2][5] - 0.020372543) < 2e-8
    assert abs(data[2][7] - 0.50013459) < 2e-8
    assert abs(data[3][5] - 0.030215555) < 2e-8
    assert abs(data[3][7] - 0.5005818) < 2e-7
