"""Probe: candidate TPU implementations of the lattice cell gather/scatter.

The coupled Pallas mat-vec is fed by LatticeOps.gather_t ((n,) -> (89, E))
and drained by scatter_add_t; both are XLA window-split/transpose chains
measured at ~180 GB/s (docs/STATUS.md perf notes) — ~0.56 ms of the 1.39 ms
apply. This probe measures alternatives on the real chip:

  A. current gather_t / scatter_add_t (baseline)
  B. parity-packed gather: dofs stored as the 8 even/odd sub-lattices of the
     Q2 node lattice, cells enumerated on the EXTENDED anchor raster
     (ncz+1)(ncy+1)(ncx+1) — every local dof row is then ONE contiguous
     shifted 1D slice of one sub-lattice (no transposes, no strides)
  C. the deinterleave itself (lexicographic -> parity), to price keeping
     the solver vectors lexicographic
  D. parity scatter-add: overlap-add of 27 shifted 1D slices
"""

import os
import time

os.environ.setdefault("ADAFLO_BENCH", "1")
os.environ["ADAFLO_TPU_NO_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.lattice import LatticeOps

REPS = int(os.environ.get("REPS", "200"))
CELLS = int(os.environ.get("CELLS", "48"))


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


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def parity_pack(u_lat, nn):
    """(nz,ny,nx) lexicographic lattice -> list of 8 flat parity
    sub-lattices, each padded to the extended anchor raster so that
    window offsets never run off the end."""
    nz, ny, nx = nn
    ncz, ncy, ncx = (nz - 1) // 2, (ny - 1) // 2, (nx - 1) // 2
    az, ay, ax = ncz + 1, ncy + 1, ncx + 1  # anchor raster per axis
    subs = []
    for pz in range(2):
        for py in range(2):
            for px in range(2):
                s = u_lat[pz::2, py::2, px::2]
                s = jnp.pad(
                    s,
                    (
                        (0, az - s.shape[0]),
                        (0, ay - s.shape[1]),
                        (0, ax - s.shape[2]),
                    ),
                )
                subs.append(s.reshape(-1))
    return jnp.stack(subs)  # (8, az*ay*ax)


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    mesh = StructuredMesh((CELLS,) * 3, (0.0,) * 3, (1.0,) * 3)
    sp = ScalarSpace(mesh, 2)
    lat = LatticeOps.for_space(sp)
    nn = tuple(reversed(sp.n_nodes_axis))  # (nz, ny, nx)
    n = sp.n_dofs
    nc = CELLS
    E = nc**3
    a1 = nc + 1
    EA = a1**3  # extended anchor raster
    sy, sx = a1 * a1, a1
    itemsize = 4

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (n,), jnp.float32)

    print(f"n_dofs={n}  E={E}  EA={EA} (+{100 * (EA - E) / E:.1f}%)", flush=True)

    # A. baseline
    gbytes = (n + 27 * E) * itemsize
    timed("A  gather_t (XLA window/transpose)", lat.gather_t, u, gbytes)
    x_t = lat.gather_t(u)
    timed(
        "A' scatter_add_t (XLA)", lat.scatter_add_t, x_t, gbytes
    )

    # C. deinterleave lexicographic -> parity (priced separately)
    u_lat = u.reshape(nn)

    def deinter(ul):
        return parity_pack(ul, nn)

    timed("C  deinterleave (8x stride-2 subsample)", deinter, u_lat, 2 * n * itemsize)
    subs = parity_pack(u_lat, nn)

    # B. parity gather: 27 shifted contiguous slices
    # local (zl, yl, xl): parity p = (zl&1, yl&1, xl&1),
    # offset = (zl>>1)*sy + (yl>>1)*sx + (xl>>1)
    rows = []
    for zl in range(3):
        for yl in range(3):
            for xl in range(3):
                p = (zl % 2) * 4 + (yl % 2) * 2 + (xl % 2)
                off = (zl // 2) * sy + (yl // 2) * sx + (xl // 2)
                rows.append((p, off))

    def parity_gather(ss):
        return jnp.stack(
            [jax.lax.dynamic_slice(ss[p], (off,), (EA,)) if off else ss[p][:EA]
             for p, off in rows]
        )

    # offsets are static: use static slicing with pad guarantee
    def parity_gather_static(ss):
        out = []
        for p, off in rows:
            if off:
                sl = jnp.concatenate([ss[p][off:], jnp.zeros((off,), ss.dtype)])
            else:
                sl = ss[p]
            out.append(sl)
        return jnp.stack(out)

    pg_bytes = (8 * EA + 27 * EA) * itemsize
    timed("B  parity gather (27 shifted slices)", parity_gather_static, subs, pg_bytes)

    # D. parity scatter-add: overlap-add back into the 8 sub-lattices
    xg = parity_gather_static(subs)

    def parity_scatter(x27):
        acc = [jnp.zeros((EA,), x27.dtype) for _ in range(8)]
        for i, (p, off) in enumerate(rows):
            contrib = x27[i]
            if off:
                contrib = jnp.concatenate(
                    [jnp.zeros((off,), x27.dtype), contrib[:-off]]
                )
            acc[p] = acc[p] + contrib
        return jnp.stack(acc)

    timed("D  parity scatter-add (27 shifted adds)", parity_scatter, xg, pg_bytes)

    # E. reinterleave parity -> lexicographic (the way back)
    def reinter(ss):
        az = a1
        full = jnp.zeros(nn, ss.dtype)
        i = 0
        for pz in range(2):
            for py in range(2):
                for px in range(2):
                    s3 = ss[i].reshape(az, az, az)
                    i += 1
                    tz = nn[0] - pz - (nn[0] - pz) // 2 * 2 + (nn[0] - pz) // 2
                    # target extents along each axis
                    ez = (nn[0] - pz + 1) // 2
                    ey = (nn[1] - py + 1) // 2
                    ex = (nn[2] - px + 1) // 2
                    full = full.at[pz::2, py::2, px::2].set(
                        s3[:ez, :ey, :ex]
                    )
        return full

    timed("E  reinterleave (8x stride-2 scatter)", reinter, subs, 2 * n * itemsize)


if __name__ == "__main__":
    main()
