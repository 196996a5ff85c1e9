"""Probe: per-dispatch wall-time anatomy of one rising_bubble_ls time step.

The BASELINE wall-time/timestep metric is dispatch-bound through this
host's TPU tunnel (~40 ms fixed overhead per jitted call + readback). This
probe wraps every compiled-function call and device_get with timers during
timed steps and prints the call log — the data for deciding what else to
fuse (VERDICT r2 item 2).

Usage: python scripts/probe_step_dispatch.py [prm] (defaults to the short
config; runs on the default JAX platform — the real TPU under axon).
"""

import io
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

CALLS = []
_real_device_get = jax.device_get


def _timed_device_get(x):
    t0 = time.perf_counter()
    out = _real_device_get(x)
    CALLS.append(("device_get", time.perf_counter() - t0))
    return out


class TimedFn:
    def __init__(self, name, fn):
        self.name, self.fn = name, fn

    def __call__(self, *a, **kw):
        t0 = time.perf_counter()
        out = self.fn(*a, **kw)
        CALLS.append((self.name, time.perf_counter() - t0))
        return out


def main():
    from adaflo_tpu.drivers.rising_bubble import (
        MicroFluidicProblem,
        TwoPhaseParameters,
        initial_distance,
    )
    from adaflo_tpu.functions import ZeroFunction

    here = Path(__file__).resolve().parent.parent
    prm = sys.argv[1] if len(sys.argv) > 1 else str(
        here / "tests/prms/rising_bubble_ls_short.prm"
    )
    par = TwoPhaseParameters.from_file(prm)
    par.output_verbosity = 0
    par.end_time = 1.0
    par.tol_nl_iteration = max(par.tol_nl_iteration, 5e-6)
    par.tol_lin_iteration = max(par.tol_lin_iteration, 1e-4)
    prob = MicroFluidicProblem(par, out=io.StringIO())
    solver = prob.solver
    solver.set_no_slip_boundary(0)
    solver.fix_pressure_constant(0)
    solver.set_symmetry_boundary(2)
    solver.setup_problem(ZeroFunction(par.dimension), initial_distance)
    solver.advance_time_step()  # warmup/compile

    # wrap the jitted entry points on both solvers
    jax.device_get = _timed_device_get
    ns = solver.navier_stokes
    for obj in (solver, ns):
        for name in dir(obj):
            if name.startswith("_") and name.endswith("_fn"):
                fn = getattr(obj, name)
                if callable(fn):
                    setattr(obj, name, TimedFn(name, fn))

    for rep in range(2):
        CALLS.clear()
        t0 = time.perf_counter()
        solver.advance_time_step()
        dt = time.perf_counter() - t0
        print(f"step {rep}: {dt*1e3:.1f} ms total, {len(CALLS)} tracked calls")
        for name, t in CALLS:
            print(f"  {name:<28s} {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
