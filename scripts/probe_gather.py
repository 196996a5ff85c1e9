"""Probe: TPU cost of the lattice cell gather/scatter variants.

The coupled Pallas mat-vec is fed by LatticeOps.gather_t ((n,) -> (n_loc, E))
and drained by scatter_add_t; both are XLA window-split/transpose chains
measured at ~180 GB/s (docs/STATUS.md perf notes). The parity alternatives
(LatticeOps.gather_pe / scatter_add_pe, the "pe" mat-vec layout) replace
them with contiguous shifted slices on the extended anchor raster; this
probe measures the production implementations of both on the real chip,
plus the parity pack (deinterleave) priced separately.

Run: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
     python scripts/probe_gather.py
"""

import os
import time

os.environ.setdefault("ADAFLO_BENCH", "1")
os.environ["ADAFLO_TPU_NO_X64"] = "1"

import jax
import jax.numpy as jnp

from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.lattice import LatticeOps

REPS = int(os.environ.get("REPS", "200"))
CELLS = int(os.environ.get("CELLS", "48"))
DEGREE = int(os.environ.get("DEGREE", "2"))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def timed(name, fn, arg, bytes_moved=None):
    @jax.jit
    def chained(c):
        def body(i, cc):
            out = fn(cc)
            s = 1.0 / jnp.maximum(
                jnp.sqrt(jnp.mean(jax.tree.leaves(out)[0] ** 2)), 1e-30
            )
            return jax.tree.map(lambda x: x * s, cc)

        out = jax.lax.fori_loop(0, REPS, body, c)
        return jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x), out)
        )

    float(chained(arg))
    best = min(_t(lambda: float(chained(arg))) for _ in range(3))
    per = best / REPS * 1e3
    bw = f"  {bytes_moved / (best / REPS) / 1e9:7.1f} GB/s" if bytes_moved else ""
    print(f"{name:44s} {per:8.4f} ms{bw}", flush=True)
    return per


def main():
    print("device:", jax.devices()[0], flush=True)
    mesh = StructuredMesh((CELLS,) * 3, (0.0,) * 3, (1.0,) * 3)
    sp = ScalarSpace(mesh, DEGREE)
    lat = LatticeOps.for_space(sp)
    n, E, EA = sp.n_dofs, lat.n_cells, lat.n_anchors
    n_loc = lat.n_loc
    itemsize = 4
    print(
        f"n_dofs={n}  E={E}  EA={EA} (+{100 * (EA - E) / E:.1f}%)  "
        f"n_loc={n_loc}",
        flush=True,
    )

    u = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)

    # A. baseline window-split/transpose chain
    gbytes = (n + n_loc * E) * itemsize
    timed("A  gather_t (XLA window/transpose)", lat.gather_t, u, gbytes)
    x_t = lat.gather_t(u)
    timed("A' scatter_add_t (XLA)", lat.scatter_add_t, x_t, gbytes)

    # C. the parity pack alone (deinterleave into sub-lattices)
    timed(
        "C  parity pack (stride-deg subsample)",
        lat._parity_subs,
        u,
        2 * n * itemsize,
    )

    # B/D. the production parity gather/scatter ("pe" mat-vec layout)
    pbytes = (n + n_loc * EA) * itemsize
    timed("B  gather_pe (contiguous slices)", lat.gather_pe, u, pbytes)
    x_pe = lat.gather_pe(u)
    timed("D  scatter_add_pe (shifted adds)", lat.scatter_add_pe, x_pe, pbytes)


if __name__ == "__main__":
    main()
