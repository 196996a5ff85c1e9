"""Probe: MXU throughput ceilings for the mat-vec's dot shapes.

The fused kernel's per-block work is dominated by (384,89)@(89,B) and
(89,89)/(89,96) dots; this measures what those shapes sustain on the real
chip at f32 vs bf16 multiply precision, plus the 4096^2 peak for context.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_mxu.py
"""

import os
import time

os.environ.setdefault("ADAFLO_BENCH", "1")
os.environ["ADAFLO_TPU_NO_X64"] = "1"

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = int(os.environ.get("REPS", "50"))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def timed(name, fn, *args, flops=None):
    @jax.jit
    def chained(*a):
        def body(i, aa):
            out = fn(*aa)
            s = (1.0 / jnp.maximum(jnp.sqrt(jnp.mean(out.astype(jnp.float32) ** 2)), 1e-30)).astype(aa[0].dtype)
            return (aa[0] * s,) + aa[1:]

        out = jax.lax.fori_loop(0, REPS, body, args)
        return jnp.sum(out[0].astype(jnp.float32))

    float(chained(*args))
    best = min(_t(lambda: float(chained(*args))) for _ in range(3))
    per = best / REPS * 1e3
    tf = f"  {flops / (best / REPS) / 1e12:7.2f} TFLOP/s" if flops else ""
    print(f"{name:46s} {per:8.4f} ms{tf}", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)

    # peak context
    for dt, prec in [
        (jnp.float32, "highest"),
        (jnp.float32, "default"),
        (jnp.bfloat16, "default"),
    ]:
        n = 4096
        a = jax.random.normal(key, (n, n), jnp.float32).astype(dt)
        b = jax.random.normal(key, (n, n), jnp.float32).astype(dt)
        f = functools.partial(
            lambda p, x, y: jnp.dot(x, y, precision=p, preferred_element_type=jnp.float32).astype(x.dtype),
            prec,
        )
        timed(f"xla {n}^2 {dt.__name__} prec={prec}", f, a, b, flops=2 * n**3)

    # the kernel's shape, as one big stacked matmul (E blocks side by side)
    E = 110592
    for dt, prec in [
        (jnp.float32, "highest"),
        (jnp.float32, "default"),
        (jnp.bfloat16, "default"),
    ]:
        A = jax.random.normal(key, (384, 96), jnp.float32).astype(dt)
        X = jax.random.normal(key, (96, E), jnp.float32).astype(dt)
        f = functools.partial(
            lambda p, x, y: jnp.dot(x, y, precision=p, preferred_element_type=jnp.float32).astype(x.dtype),
            prec,
        )
        timed(
            f"xla (384,96)@(96,{E}) {dt.__name__} prec={prec}",
            f,
            A,
            X,
            flops=2 * 384 * 96 * E,
        )

    # inside Pallas: blocked like the kernel (B=1024 per grid step)
    B = 1024

    def pkern(prec, a_ref, x_ref, o_ref):
        o_ref[:] = jnp.dot(
            a_ref[:], x_ref[:], precision=prec, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    def pall(prec, dt, A, X):
        return pl.pallas_call(
            functools.partial(pkern, prec),
            grid=(E // B,),
            in_specs=[
                pl.BlockSpec((384, 96), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((96, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (384, B), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((384, E), dt),
        )(A, X)

    for dt, prec in [
        (jnp.float32, "highest"),
        (jnp.float32, "default"),
        (jnp.bfloat16, "default"),
    ]:
        A = jax.random.normal(key, (384, 96), jnp.float32).astype(dt)
        X = jax.random.normal(key, (96, E), jnp.float32).astype(dt)
        timed(
            f"pallas blocked eval dot {dt.__name__} prec={prec}",
            functools.partial(pall, prec, dt),
            A,
            X,
            flops=2 * 384 * 96 * E,
        )


if __name__ == "__main__":
    main()
