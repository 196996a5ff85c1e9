"""TimeStepping parity tests (reference: source/time_stepping.cc)."""

import numpy as np

from adaflo_tpu.parameters import FlowParameters, Scheme, TimeSteppingParameters
from adaflo_tpu.time_stepping import TimeStepping


def make(scheme="bdf_2", start=0.0, end=1.0, step=0.1, mx=1.0, mn=0.1):
    return TimeStepping(
        TimeSteppingParameters(
            time_step_scheme=Scheme(scheme),
            start_time=start,
            end_time=end,
            time_step_size_start=step,
            time_step_size_max=mx,
            time_step_size_min=mn,
        )
    )


def test_bdf2_uniform_weights():
    ts = make(step=0.5, end=20.0)
    ts.next()
    # first step: backward Euler weights (time_stepping.cc:169-173)
    assert np.isclose(ts.weight(), 2.0)
    assert np.isclose(ts.weight_old(), -2.0)
    assert ts.weight_old_old() == 0.0
    ts.next()
    # uniform BDF-2: 3/(2 dt), -2/dt, 1/(2 dt) (cc:160-168)
    assert np.isclose(ts.weight(), 1.5 / 0.5)
    assert np.isclose(ts.weight_old(), -2.0 / 0.5)
    assert np.isclose(ts.weight_old_old(), 0.5 / 0.5)


def test_bdf2_variable_weights():
    # variable steps arise when the last step is stretched to the end time
    # (cc:150-156): 0.4, 0.4, then 0.2 to land on 1.0
    ts = make(step=0.4, end=1.0, mx=0.4)
    ts.next()
    ts.next()
    ts.next()
    assert ts.at_end() and np.isclose(ts.now(), 1.0)
    k, k_old = 0.2, 0.4
    assert np.isclose(ts.weight(), (2 * k + k_old) / (k * (k + k_old)))
    assert np.isclose(ts.weight_old(), -(k + k_old) / (k * k_old))
    assert np.isclose(ts.weight_old_old(), k / (k_old * (k + k_old)))
    # extrapolation factors for the variable step (cc:184-193)
    f1, f2 = ts.extrapolation_factors
    assert np.isclose(f1, (k + k_old) / k_old) and np.isclose(f2, -k / k_old)


def test_extrapolation_factors():
    ts = make(step=0.1, end=10.0)
    ts.next()
    assert ts.extrapolation_factors == (1.0, 0.0)
    ts.next()
    # step 2 does not extrapolate (cc:184-193)
    assert ts.extrapolation_factors == (1.0, 0.0)
    ts.next()
    f1, f2 = ts.extrapolation_factors
    assert np.isclose(f1, 2.0) and np.isclose(f2, -1.0)
    assert np.isclose(ts.extrapolate(3.0, 1.0), 5.0)


def test_hits_end_exactly():
    ts = make(step=0.3, end=1.0, mx=0.3)
    times = []
    while not ts.at_end():
        times.append(ts.next())
    assert np.isclose(times[-1], 1.0)
    # 0.3, 0.6, 0.9 -> last step stretched to 1.0 (cc:150-156)
    assert len(times) == 4
    assert ts.at_end()


def test_near_miss_stretches_last_step():
    # after 2 steps of 0.333, the third lands at 0.999 > 1 - 0.01*0.333,
    # so it is stretched to hit 1.0 exactly (3 steps, not 4)
    ts = make(step=0.333, end=1.0, mx=0.333)
    times = []
    while not ts.at_end():
        times.append(ts.next())
    assert len(times) == 3
    assert np.isclose(times[-1], 1.0)


def test_set_desired_time_step_clamping():
    ts = make(step=0.1, end=10.0, mx=0.5, mn=0.01)
    ts.next()
    ts.set_desired_time_step(1.0)  # clamps to 2x prev = 0.2
    assert np.isclose(ts.step_size(), 0.2)
    ts.next()
    ts.set_desired_time_step(0.001)  # clamps to max(0.5*0.2, min)=0.1
    assert np.isclose(ts.step_size(), 0.1)


def test_max_weight_uniform():
    ts = make(step=0.5, end=10.0)
    ts.next()
    assert np.isclose(ts.max_weight_uniform(), 1.5 / 0.5)


def test_at_tick():
    ts = make(step=0.5, end=20.0, mx=1.0)
    ts.next()  # t=0.5
    assert not ts.at_tick(2.0)
    ts.next()
    ts.next()
    ts.next()  # t=2.0
    assert ts.at_tick(2.0)


def test_from_flow_parameters():
    p = FlowParameters.from_string(
        "subsection Time stepping\n set end time = 2\n set step size = 0.25\nend"
    )
    ts = TimeStepping(p)
    assert ts.final() == 2.0
    ts.next()
    assert ts.now() == 0.25
    assert ts.name() == "BDF-2"
