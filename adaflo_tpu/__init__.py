"""adaflo-tpu: a TPU-native adaptive finite-element incompressible flow solver.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the adaflo
library (matrix-free incompressible Navier-Stokes + two-phase flow via
conservative level set and Cahn-Hilliard phase field), built for TPU:

- structure-of-arrays cell-batched data model (cells are the vector lanes,
  replacing the reference's ``VectorizedArray`` SIMD cell batching),
- sum-factorized cell integrals as batched tensor contractions that XLA maps
  onto the MXU/VPU,
- all Krylov solvers as jitted ``lax.while_loop`` iterations with fused
  reductions,
- distribution via ``jax.sharding``/``shard_map`` over a chip mesh instead of
  MPI ghost exchange.

Reference for capability parity: kronbichler/adaflo (C++/deal.II/Trilinos),
see SURVEY.md at the repo root.
"""

import os as _os

import jax as _jax

# The solver targets double precision (golden-output parity with the
# reference); opt out with ADAFLO_TPU_NO_X64=1 for bf16/f32 benchmarking.
if not _os.environ.get("ADAFLO_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

# Full-f32 matmul accuracy for the einsum compute path: the v5e MXU runs
# f32 contractions as ONE bf16 pass by default (~4e-3 relative error per
# product), which floors Newton residual evaluation ~5 decades above the
# f32 floor — the beltrami_3d f32 step spun 10 non-contracting Newton
# iterations at ||r|| ~ 0.26 (quadratic contraction to 4e-6 in 2-3
# iterations with `highest`). f64/CPU runs are unaffected; the Pallas
# resident kernel pins Precision.DEFAULT internally (its accuracy class
# is bf16 by design via the streamed linearization — see
# ops/pallas_matvec._block_core). Opt out with ADAFLO_TPU_FAST_MATMUL=1.
# A host application that already chose its own default precision (config
# or JAX_DEFAULT_MATMUL_PRECISION) keeps its choice — we only fill in the
# unset default, so importing this package does not silently change the
# numerics of unrelated JAX code.
if not _os.environ.get("ADAFLO_TPU_FAST_MATMUL"):
    try:
        if (
            _jax.config.jax_default_matmul_precision is None
            and not _os.environ.get("JAX_DEFAULT_MATMUL_PRECISION")
        ):
            _jax.config.update("jax_default_matmul_precision", "highest")
    except Exception:
        pass

# Persistent compilation cache: the solver pipelines are large jitted
# programs (full two-phase steps), and re-runs of the same driver/test
# configuration pay the full XLA compile each process otherwise. Opt out
# with ADAFLO_TPU_NO_COMPILE_CACHE=1; relocate with ADAFLO_JAX_CACHE_DIR.
if not _os.environ.get("ADAFLO_TPU_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "ADAFLO_JAX_CACHE_DIR", "/tmp/adaflo_jax_cache"
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # cache everything, however quick the compile: this host pays a
        # fixed per-compile tunnel/CPU cost that dwarfs the disk read
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these knobs

# Honor JAX_PLATFORMS even where a TPU plugin force-overrides the env var
# (pinning through jax.config before backend init always wins); CLI users
# select e.g. JAX_PLATFORMS=cpu for f64 runs on hosts whose TPU lacks f64.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
        _jax.devices()  # initialize now, before the plugin can re-override
    except Exception:
        pass  # backend already initialized; too late to repin

from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.time_stepping import TimeStepping, TimeSteppingScheme

__version__ = "0.1.0"

__all__ = [
    "FlowParameters",
    "TimeStepping",
    "TimeSteppingScheme",
]
