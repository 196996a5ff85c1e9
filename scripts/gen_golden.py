"""Generate (or regenerate) a golden output file by running a driver.

Usage: python scripts/gen_golden.py <driver_module> <prm_name> <golden_name>
e.g.   python scripts/gen_golden.py adaflo_tpu.drivers.spurious_currents \
           spurious_currents_ls_3d_short.prm spurious_currents_ls_3d_short.output

Runs the driver exactly as tests/test_golden_sweep.py does and writes the
captured, UNnormalized output to tests/golden/<golden_name>.
"""

import importlib
import os
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

# goldens are generated in the exact test environment: f64 on the CPU
# backend (tests/conftest.py) — the axon TPU plugin force-overrides
# JAX_PLATFORMS, so pin through jax.config and initialize NOW
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.devices()


def main():
    module_name, prm, golden = sys.argv[1:4]
    if module_name.endswith("simplex_bubble"):
        os.environ.setdefault("ADAFLO_MESH_DIR", "/root/reference/tests")
    from adaflo_tpu.testing import run_driver_capture

    mod = importlib.import_module(module_name)
    text = run_driver_capture(mod.main, str(HERE / "tests" / "prms" / prm))
    out = HERE / "tests" / "golden" / golden
    out.write_text(text)
    print(f"wrote {out} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
