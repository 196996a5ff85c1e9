"""Augmented Taylor-Hood on the adaptive forest: the reference's own
rising_bubble_ls_augp configuration (global 1 + adaptive 2, FE_Q_DG0
pressure — /root/reference/tests/rising_bubble_ls_augp.prm).

Anchors from rising_bubble_ls_augp.output: the AMR warm-up mesh/dof
sequence (pressure counts include the per-cell DG0 constants: 431 =
231 + 200 etc.) and the per-step bubble diagnostics.
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
AUGP_PRM = Path("/root/reference/tests/rising_bubble_ls_augp.prm")


def _load_params():
    if AUGP_PRM.exists():
        return TwoPhaseParameters.from_file(str(AUGP_PRM))
    par = TwoPhaseParameters()
    par.dimension = 2
    par.global_refinements = 1
    par.adaptive_refinements = 2
    par.augmented_taylor_hood = True
    return par


def test_rising_bubble_augp_adap_warmup_parity():
    """AMR warm-up reproduces the reference's mesh/dof sequence with the
    augmented pressure counts (rising_bubble_ls_augp.output:1-20)."""
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
        "Number of Navier-Stokes degrees of freedom: 2153 (1722 + 431).",
        "Number of active cells: 536.",
        "Number of Navier-Stokes degrees of freedom: 5651 (4526 + 1125).",
        "Number of active cells: 1316.",
        "Number of Navier-Stokes degrees of freedom: 13769 (11050 + 2719).",
        "Number of active cells: 836.",
        "Number of Navier-Stokes degrees of freedom: 9029 (7266 + 1763).",
        "Number of level set degrees of freedom: 14061.",
        "reinitialize (13 + 12)",
    ):
        assert anchor in text, f"missing: {anchor}\n{text}"


@pytest.mark.skipif(SLOW, reason="slow tier (ADAFLO_RUN_SLOW)")
def test_rising_bubble_augp_adap_step_parity():
    """Three adaptive augp steps track the reference's bubble diagnostics
    (rising_bubble_ls_augp.output steps 1-3)."""
    par = _load_params()
    par.end_time = 0.06
    buf = io.StringIO()
    prob = MicroFluidicProblem(par, out=buf)
    prob.run()
    data = np.asarray(prob.solution_data)
    # rows: (t, area, perimeter, circularity, vx, vy, comx, comy)
    assert abs(data[1][3] - 0.99997938) < 2e-8  # circularity step 1
    assert abs(data[1][5] - 0.010277763) < 5e-7  # vy step 1
    assert abs(data[2][5] - 0.020354897) < 1e-6
    assert abs(data[2][7] - 0.50013661) < 1e-6
    assert abs(data[3][5] - 0.030196751) < 2e-6
    assert abs(data[3][7] - 0.50058682) < 2e-6
