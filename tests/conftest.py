"""Test configuration: run on local CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-runs the real multi-chip path); correctness tests want determinism + fast
compilation, so everything runs on CPU in float64.

Note: in this environment the axon TPU plugin force-overrides JAX_PLATFORMS,
so the platform must be pinned through jax.config before backend init.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# initialize the backend NOW: the axon plugin re-overrides jax_platforms at
# its (lazy) registration, so without this an unluckily-ordered first jax op
# lands tests on the TPU in f64 emulation (~330x slower, and Mosaic f64
# kernels fail to lower)
jax.devices()


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r2 #8): the default suite is hour-class on this host,
# so a marker-based split provides a sub-10-minute inner loop:
#
#   fast tier:    pytest -m "not medium and not slow"    (< 10 min)
#   medium tier:  pytest -m medium                       (golden/halo suites)
#   slow tier:    ADAFLO_RUN_SLOW=1 pytest -m slow       (full-run goldens)
#
# A plain `pytest tests/` still runs fast+medium (slow stays env-gated),
# matching the driver's round-end invocation.
# ---------------------------------------------------------------------------

# modules whose end-to-end golden/solver runs dominate suite wall time
# (measured: test_golden_ns ~8 min, test_halo ~6.5 min serially)
_MEDIUM_MODULES = {
    "test_golden_ns",
    "test_golden_sweep",
    "test_halo",
    "test_augp_adaptive",
    "test_augp_forest",
    "test_two_phase_amr",
    "test_two_phase_unstructured",
    "test_forest_navier_stokes",
    "test_sharp_interface_3d",
    "test_graded_mesh",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "fast: sub-second unit tests")
    config.addinivalue_line(
        "markers", "medium: end-to-end solver/golden tests (minutes each)"
    )
    config.addinivalue_line(
        "markers",
        "slow: full-run goldens, env-gated behind ADAFLO_RUN_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        # the env-gated full-run goldens carry skipif(..., "ADAFLO_RUN_SLOW")
        # — tag them `slow` so `-m slow` selects exactly that tier
        if any(
            "ADAFLO_RUN_SLOW" in str(m.kwargs.get("reason", ""))
            for m in item.iter_markers("skipif")
        ):
            item.add_marker(pytest.mark.slow)
        elif item.module.__name__ in _MEDIUM_MODULES and not any(
            m.name in ("medium", "slow") for m in item.iter_markers()
        ):
            item.add_marker(pytest.mark.medium)
