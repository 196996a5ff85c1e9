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
