"""Weak-scaling evidence on the virtual CPU device mesh (VERDICT r2 #7).

Fixed cells per device, D = 1/2/4/8 devices: per-step wall time (one full
NS time step after warm-up; CPU-virtual, so the numbers evidence compiled
sharding structure, not chip performance), per-apply halo bytes from the
HaloOps pack maps (the analytic collective-permute payload), and the
ghost-to-owned ratio.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python scripts/weak_scaling.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np

# per-device tile: 32 columns x 16 rows. The mesh grows along y with D and
# the contiguous-block cell partition (x fastest) then assigns each device
# exactly 16 full rows -> the halo is the same two 32-cell row interfaces
# at every D (true weak scaling: constant ghost/owned per device).
TILE_X, TILE_Y = 32, 16


def build(n_cells_y, pad):
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.parameters import FlowParameters
    from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

    par = FlowParameters.from_string(
        """
subsection Time stepping
  set end time = 10
  set step size = 0.05
end
subsection Navier-Stokes
  set dimension = 2
  set global refinements = 0
  set velocity degree = 2
  subsection Solver
    set NL max iterations = 3
    set NL tolerance = 1.e-9
    set lin max iterations = 60
    set lin tolerance = 1.e-6
  end
end
subsection Output options
  set output verbosity = 0
end
"""
    )
    m = StructuredMesh.subdivided_hyper_rectangle(
        (TILE_X, n_cells_y), (0.0, 0.0), (2.0, float(n_cells_y) / TILE_Y)
    )
    ns = NavierStokes(par, m, pad_dofs_to=pad)
    ns.set_velocity_dirichlet_boundary(
        0, lambda x, t: np.stack([x[:, 1] * (1 - x[:, 1]), 0 * x[:, 0]])
    )
    ns.fix_pressure_constant(0)
    ns.setup_problem()
    return ns


def halo_bytes(halo) -> int:
    """Collective-permute payload of ONE gather + ONE scatter (bytes, f64):
    every offset ships its padded pack slab in both directions."""
    per_dir = sum(halo.ghost_counts.values()) * halo.n_devices * 8
    return 2 * per_dir


_WIDTHS = {
    "f64": 8, "u64": 8, "s64": 8, "f32": 4, "u32": 4, "s32": 4,
    "bf16": 2, "f16": 2, "u16": 2, "s16": 2, "u8": 1, "s8": 1, "pred": 1,
}


def hlo_halo_bytes(halo) -> int:
    """Collective-permute bytes actually present in the COMPILED gather and
    scatter programs (round-3 VERDICT bonus / round-5 #8: verify the
    analytic halo model against the HLO). Shapes inside shard_map are
    per-device; multiply by the device count for the global payload."""
    import re

    import jax as _jax
    import jax.numpy as _jnp

    cd = _jax.ShapeDtypeStruct(
        (halo.n_cells_padded, halo.n_loc), halo.cd_local.dtype
    )
    u = _jax.ShapeDtypeStruct((halo.n_dofs_padded,), _jnp.float64)
    r = _jax.ShapeDtypeStruct(
        (halo.n_cells_padded, halo.n_loc), _jnp.float64
    )
    total = 0
    for fn, args in (
        (halo._gather_sm, (u, cd)),
        (halo._scatter_sm, (r, cd)),
    ):
        hlo = fn.lower(*args).compile().as_text()
        for m in re.finditer(
            r"= \(?(\w+)\[([\d,]*)\][^=]*? collective-permute", hlo
        ):
            dims = [int(d) for d in m.group(2).split(",") if d]
            total += _WIDTHS.get(m.group(1), 8) * int(np.prod(dims or [1]))
    return total * halo.n_devices


def main():
    from adaflo_tpu.parallel.halo import HaloOps
    from adaflo_tpu.parallel.sharding import shard_solver_state, solver_mesh

    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu (the config update above came too late — a "
        "backend was already initialized)"
    )
    print("virtual-mesh weak scaling: step_ms is 8 virtual devices on ONE"
          " physical core (compiled sharding structure, not chip speed);")
    print("the scaling evidence is the analytic halo payload per apply and"
          " its ICI time at the v5e 45 GB/s/link ring bandwidth.")
    print(f"{'D':>2} {'cells':>6} {'dofs':>8} {'step_ms':>9} "
          f"{'halo_B/apply':>12} {'HLO_B/apply':>11} {'ghost/owned':>11} "
          f"{'ICI_us/apply':>12}")
    for D in (1, 2, 4, 8):
        ns = build(TILE_Y * D, pad=8)
        shard_solver_state(
            ns, solver_mesh(jax.devices()[:D]), explicit_halo=True
        )
        lat_u = ns.operator.lat_u
        hb = gr = 0.0
        hlo_b = 0
        if isinstance(lat_u, HaloOps) and D > 1:
            hb = halo_bytes(lat_u) + halo_bytes(ns.operator.lat_p)
            hlo_b = hlo_halo_bytes(lat_u) + hlo_halo_bytes(
                ns.operator.lat_p
            )
            gr = lat_u.n_ghost / lat_u.dofs_per_device
        ns.advance_time_step()  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            ns.advance_time_step()
            times.append(time.perf_counter() - t0)
        n_dofs = 2 * ns.u_space.n_dofs + ns.p_space.n_dofs
        ici_us = hb / 45e9 * 1e6  # one ring hop per offset, 45 GB/s ICI
        print(
            f"{D:>2} {ns.mesh.n_cells:>6} {n_dofs:>8} "
            f"{min(times)*1e3:>9.1f} {int(hb):>12} {hlo_b:>11} "
            f"{gr:>11.3f} {ici_us:>12.2f}"
        )
        if hlo_b and hb:
            dev = abs(hlo_b - hb) / hb
            print(f"   HLO vs analytic: {100*dev:.1f}% deviation"
                  + ("" if dev <= 0.10 else "  (> 10% — model stale!)"))


if __name__ == "__main__":
    main()
