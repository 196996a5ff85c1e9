"""Probe: MXU rate for the pr kernel's dot shapes at each precision.

The parity-resident apply does, per 4096-anchor block:
  r = Ae(351x89)  @ x(89x4096)    f32
  s = Aev(351x81) @ su(81x4096)   bf16 stream
  y = M89(89x89)  @ x(89x4096) + Ai(89x81) @ n(81x4096)
Total ~0.61 GFLOP/block, 27 blocks/apply at 48^3. If these run at the
v5e f32 rate (~33 TFLOP/s = bf16 peak / 6) the apply is FLOP-bound at
~0.45 ms — matching the measured 0.548 ms. This probe times each dot
shape at f32 DEFAULT / f32 HIGHEST / bf16 inputs to find the real rates.
"""

import time

import jax
import jax.numpy as jnp

SHAPES = [(351, 89, 4096), (351, 81, 4096), (89, 89, 4096), (89, 81, 4096),
          (384, 128, 4096), (1024, 1024, 4096)]
REPS = 400


def timeit(m, k, n, dt_a, dt_b, prec):
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32).astype(dt_a)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32).astype(dt_b)

    @jax.jit
    def chained(a, b):
        def body(i, bb):
            r = jnp.dot(a, bb[:k] if False else bb, precision=prec,
                        preferred_element_type=jnp.float32)
            # feed back a k-row slice so the loop cannot be folded
            return (r[:k] * (1.0 / jnp.maximum(jnp.max(jnp.abs(r)), 1e-30))).astype(dt_b)

        return jnp.sum(jax.lax.fori_loop(0, REPS, body, b).astype(jnp.float32))

    float(chained(a, b))
    t0 = time.perf_counter()
    float(chained(a, b))
    dt = time.perf_counter() - t0
    fl = 2 * m * k * n * REPS
    return fl / dt / 1e12


def main():
    print(jax.devices())
    for m, k, n in SHAPES:
        if m < k:
            continue
        row = {}
        for name, (da, db, prec) in {
            "f32_default": (jnp.float32, jnp.float32, None),
            "f32_highest": (jnp.float32, jnp.float32, jax.lax.Precision.HIGHEST),
            "bf16_in": (jnp.bfloat16, jnp.bfloat16, None),
        }.items():
            try:
                row[name] = round(timeit(m, k, n, da, db, prec), 2)
            except Exception as ex:
                row[name] = type(ex).__name__
        print((m, k, n), row, "TFLOP/s")


if __name__ == "__main__":
    main()
