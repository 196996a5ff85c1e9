"""Benchmark: matrix-free Navier-Stokes mat-vec throughput (DoF/s/chip).

The driver-declared target metric (BASELINE.md): DoF/s per chip for the
matrix-free coupled NS mat-vec, vs the reference sample of ~34 MDoF/s
(3.3 ms/call at 112,724 DoF on 3 x86 ranks, beltrami_3d.output:23).

Runs on whatever the default JAX platform provides (the real TPU chip under
the driver); prints ONE JSON line.
"""

import json
import os
import sys
import time


def main() -> None:
    os.environ.setdefault("ADAFLO_BENCH", "1")
    # f32 is the TPU deployment precision for the HBM-bound mat-vec (v5e has
    # no native f64 units: measured 330x slower in f64 emulation);
    # correctness-critical runs use f64 on request
    dtype_name = os.environ.get("ADAFLO_BENCH_DTYPE", "float32")
    if dtype_name != "float64":
        os.environ["ADAFLO_TPU_NO_X64"] = "1"
    import jax
    import jax.numpy as jnp

    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)
    import numpy as np

    from adaflo_tpu.fe.constraints import Constraints
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.ops.navier_stokes import (
        Linearized,
        NavierStokesOperator,
        TimeWeights,
    )
    from adaflo_tpu.parameters import FlowParameters

    # 3D Q2/Q1 coupled Newton mat-vec, ~3.7M dofs
    cells = int(os.environ.get("ADAFLO_BENCH_CELLS", "48"))
    par = FlowParameters.from_string(
        """
subsection Navier-Stokes
  set dimension = 3
  set velocity degree = 2
end
"""
    )
    mesh = StructuredMesh((cells,) * 3, (0.0,) * 3, (1.0,) * 3)
    u_space = ScalarSpace(mesh, 2)
    p_space = ScalarSpace(mesh, 1)
    cu = []
    for _ in range(3):
        c = Constraints(u_space.n_dofs)
        c.close()
        cu.append(c)
    cp = Constraints(p_space.n_dofs)
    cp.close()
    dtype = jnp.float64 if dtype_name == "float64" else jnp.float32
    op = NavierStokesOperator(par, u_space, p_space, cu, cp, dtype=dtype)
    n_dofs = 3 * u_space.n_dofs + p_space.n_dofs

    tw = TimeWeights(
        *(jnp.asarray(v, dtype) for v in (30.0, -30.0, 0.0, 1.0))
    )
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (3, u_space.n_dofs), dtype)
    p = jax.random.normal(key, (p_space.n_dofs,), dtype)
    lin_dofs = op._gather_u(u, resolve=False)
    lin_val = op.ev_u.values(lin_dofs)
    lin_grad = op.ev_u.gradients(lin_dofs)
    lin_base = Linearized(
        lin_val, lin_grad, jnp.trace(lin_grad, axis1=1, axis2=2), lin_dofs
    )

    # enough chained reps to amortize the per-dispatch overhead (measured
    # ~40 ms through this host's TPU tunnel — at the old reps=20 that added
    # ~2 ms/apply, swamping the kernel itself), and the result is forced to
    # a host scalar: block_until_ready alone does not reliably wait here
    reps = int(os.environ.get("ADAFLO_BENCH_REPS", "200"))

    def make_chained(layout):
        """Per-layout jitted chain; the layout env var is read at trace
        time inside the operator, and the frozen-linearization stream is
        pre-rastered exactly as the per-Newton-step production hook does.

        Layout "pr" times the parity-RESIDENT apply: the Krylov iterate
        stays in the packed parity layout across the whole chain (pack /
        unpack happen once, outside the timed loop) — exactly how the
        resident solver path uses it. The constraint-identity rows and the
        pressure-average projection are applied in packed space, so each
        iteration is the full vmult equivalent."""
        os.environ["ADAFLO_PALLAS_LAYOUT"] = layout
        lin = lin_base
        if op._pallas_tables is not None:
            from adaflo_tpu.ops.pallas_matvec import stream_t

            qt = stream_t(lin_base)
            if layout in ("pe", "pi", "pr"):
                qt = op.lat_u.cells_to_anchors(qt)
            lin = lin_base._replace(qt=qt)

        # `lin` rides as a jit ARGUMENT (embedded-literal trap, see
        # _matvec_time)
        if layout == "pr":
            if not op.pr_supported():
                raise RuntimeError("pr layout unsupported here")

            @jax.jit
            def chained_pr(u, p, ll):
                # the round-5 kernel fuses the chain's normalization into
                # the apply (output scale + in-kernel ||r||^2), so each
                # iteration is exactly ONE kernel — no separate
                # full-vector normalize pass rides the timing
                x = op.pr_pack(u, p)

                def body(i, carry):
                    xx, n = carry
                    r, n2 = op.vmult_pr(
                        xx, tw, ll, scale=jax.lax.rsqrt(n), want_norm=True
                    )
                    return r, jnp.maximum(n2, 1e-60)

                x, _ = jax.lax.fori_loop(
                    0, reps, body, (x, jnp.asarray(1.0, x.dtype))
                )
                ru, rp = op.pr_unpack(x)
                return jnp.sum(ru) + jnp.sum(rp)

            return chained_pr, lin

        @jax.jit
        def chained(u, p, ll):
            def body(i, carry):
                uu, pp = carry
                ru, rp = op.vmult(uu, pp, tw, ll)
                # keep magnitudes bounded (and the loop body non-foldable)
                s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(ru * ru)), 1e-30)
                return (ru * s, rp * s)

            ru, rp = jax.lax.fori_loop(0, reps, body, (u, p))
            return jnp.sum(ru) + jnp.sum(rp)

        return chained, lin

    # autotune the HBM layout of the Pallas fast path unless pinned:
    # "t" (transposed window-split), "pe" (parity anchor raster), "n"
    # (cell-major). The best layout is the reported headline number.
    layout_env = os.environ.get("ADAFLO_PALLAS_LAYOUT")
    layouts = (
        [layout_env]
        if layout_env
        else (["pr", "t", "pi", "n"] if op._pallas_tables is not None else ["t"])
    )
    # "pi"/"pr" silently demote without the dof stream — timing them would
    # mislabel a second "pe" measurement
    if os.environ.get("ADAFLO_PALLAS_STREAM", "dofs") != "dofs":
        layouts = [l for l in layouts if l not in ("pi", "pr")] or ["t"]
    layout_ms = {}
    dt = float("inf")
    best_layout = layouts[0]
    for layout in layouts:
        try:
            chained, lin_arg = make_chained(layout)
            float(chained(u, p, lin_arg))  # compile + warmup (forced readback)
            dt_l = min(
                _timed_call(lambda: float(chained(u, p, lin_arg)))
                for _ in range(3)
            )
        except Exception as ex:  # a failing variant must not kill the bench
            layout_ms[layout] = f"{type(ex).__name__}"
            continue
        layout_ms[layout] = dt_l / reps * 1e3
        if dt_l < dt:
            dt, best_layout = dt_l, layout
    if not (dt < float("inf")):
        # every variant failed (incl. the production default "t"): fail
        # loudly rather than emit a bogus 0-DoF/s / Infinity JSON line
        raise RuntimeError(f"all Pallas layouts failed: {layout_ms}")
    if layout_env is None:
        os.environ["ADAFLO_PALLAS_LAYOUT"] = best_layout

    dofs_per_s = n_dofs * reps / dt
    baseline = 34e6  # reference sample MDoF/s (BASELINE.md)

    # -- bytes moved / HBM roofline (BASELINE.json north-star metric) ------
    # Minimum data motion of one coupled mat-vec: read (u, p), write
    # (ru, rp), and stream the frozen linearization fields
    # (values (E,3,n_q) + gradients (E,3,3,n_q) + divergence (E,n_q)).
    # Everything else (basis tables, geometry scalars) is O(1).
    itemsize = np.dtype(dtype_name).itemsize
    E = u_space.mesh.n_cells
    n_q = op.ev_u.n_q
    # the frozen-linearization stream rides HBM in bf16 on the f32 path
    # (pallas_matvec.stream_t)
    lin_itemsize = 2 if dtype_name == "float32" else itemsize
    stream_mode = os.environ.get("ADAFLO_PALLAS_STREAM", "dofs")
    if stream_mode == "dofs":
        # dof stream: 3 components x n_loc_u cell-local dofs of u*, with the
        # q-point fields re-evaluated on the MXU inside the kernel
        lin_bytes = E * 3 * op.u_space.n_local * lin_itemsize
    else:
        # q-field stream: values (3) + gradients (9) per q point; the u*
        # divergence derives from the gradients in-kernel
        lin_bytes = E * n_q * (3 + 9) * lin_itemsize
    vec_bytes = 2 * n_dofs * itemsize  # read + write
    bytes_min = vec_bytes + lin_bytes
    eff_gbps = bytes_min * reps / dt / 1e9
    hbm_peak_gbps = 819.0  # v5e HBM peak
    dev = jax.devices()[0]
    if "v5p" in str(getattr(dev, "device_kind", "")).lower():
        hbm_peak_gbps = 2765.0

    # measured achievable streaming bandwidth for context: a chained XLA
    # elementwise pass over the same footprint as one mat-vec. The min-bytes
    # roofline above assumes ideal single-pass streaming; the deviation from
    # `achievable` quantifies how much is XLA-attainable at all, and the
    # mat-vec's remaining gap is the gather/scatter relayout cost around the
    # fused kernel (see docs/STATUS.md perf notes).
    probe = jax.random.normal(key, (max(1, bytes_min // 8), 2), dtype)

    @jax.jit
    def stream(x0):
        def body(i, xx):
            s = 1.0 / jnp.maximum(jnp.sqrt(jnp.mean(xx * xx)), 1e-30)
            return xx * s

        return jnp.sum(jax.lax.fori_loop(0, reps, body, x0))

    float(stream(probe))
    dt_s = min(_timed_call(lambda: float(stream(probe))) for _ in range(3))
    # per iteration XLA fuses the norm of the previous result into its
    # write, so each pass reads and writes the array once
    achievable_gbps = 2 * probe.size * itemsize * reps / dt_s / 1e9

    result = {
        "metric": "ns_matvec_throughput",
        "value": dofs_per_s,
        "unit": "DoF/s/chip",
        "vs_baseline": dofs_per_s / baseline,
        "n_dofs": n_dofs,
        "ms_per_matvec": dt / reps * 1e3,
        "platform": dev.platform,
        "dtype": dtype_name,
        "bytes_per_matvec_min": bytes_min,
        "hbm_gbps_effective": eff_gbps,
        "pct_hbm_roofline": 100.0 * eff_gbps / hbm_peak_gbps,
        "hbm_peak_gbps_assumed": hbm_peak_gbps,
        "hbm_gbps_achievable_measured": achievable_gbps,
        "pct_of_achievable": 100.0 * eff_gbps / achievable_gbps,
        "pallas_stream": stream_mode,
        "pallas_layout": best_layout,
        "layout_ms": {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in layout_ms.items()
        },
    }

    # -- north-star per-chip density: ~84^3 cells = 15.6M DoF (the
    # BASELINE.json target talks 1e9 DoF on a v5p-64 = ~15.6M DoF/chip) ----
    cells2 = int(os.environ.get("ADAFLO_BENCH_CELLS2", "84"))
    if cells2 and dev.platform != "cpu":
        try:
            r2 = _matvec_time(cells2, best_layout, max(20, reps // 4))
            result["n_dofs_ns"] = r2["n_dofs"]
            result["ms_per_matvec_ns"] = r2["ms"]
            result["dofs_per_s_ns"] = r2["n_dofs"] / (r2["ms"] / 1e3)
            result["hbm_gbps_effective_ns"] = r2["bytes_min"] / (
                r2["ms"] / 1e3
            ) / 1e9
            result["pct_hbm_roofline_ns"] = (
                100.0 * result["hbm_gbps_effective_ns"] / hbm_peak_gbps
            )
        except Exception as ex:
            result["north_star_error"] = f"{type(ex).__name__}: {ex}"

    # -- wall time per timestep (BASELINE.json metric), with the dispatch
    # split VERDICT r2 #2 asks for: n jitted dispatches/step x the measured
    # per-dispatch tunnel overhead, separated from estimated device time ---
    overhead_s = None
    if os.environ.get("ADAFLO_BENCH_RB", "1") != "0":
        try:
            overhead_s = _dispatch_overhead_s()
            result["dispatch_overhead_ms"] = overhead_s * 1e3
        except Exception as ex:
            result["dispatch_overhead_error"] = f"{type(ex).__name__}: {ex}"
        try:
            r = _step_time_rising_bubble("rising_bubble_ls_short.prm")
            result["rb_ls_s_per_step"] = r["s_per_step"]
            result["rb_ls_dispatches_per_step"] = r["dispatches_per_step"]
            if overhead_s is not None:
                result["rb_ls_overhead_s_per_step"] = (
                    r["dispatches_per_step"] * overhead_s
                )
                result["rb_ls_device_s_per_step_est"] = max(
                    r["s_per_step"] - r["dispatches_per_step"] * overhead_s,
                    0.0,
                )
        except Exception as ex:  # keep the primary metric robust
            result["rb_ls_error"] = f"{type(ex).__name__}: {ex}"

    # the FULL 3200-cell reference configuration (rising_bubble_ls.prm)
    if os.environ.get("ADAFLO_BENCH_RB_FULL", "1") != "0":
        try:
            r = _step_time_rising_bubble("rising_bubble_ls.prm")
            result["rb_ls_full_s_per_step"] = r["s_per_step"]
            result["rb_ls_full_dispatches_per_step"] = r[
                "dispatches_per_step"
            ]
            if overhead_s is not None:
                result["rb_ls_full_device_s_per_step_est"] = max(
                    r["s_per_step"] - r["dispatches_per_step"] * overhead_s,
                    0.0,
                )
        except Exception as ex:
            result["rb_ls_full_error"] = f"{type(ex).__name__}: {ex}"

    # one 3D configuration: the reference's own beltrami_3d sample
    # (112,724 DoF Q2/Q1, the config behind its 3.3 ms mat-vec anchor)
    if os.environ.get("ADAFLO_BENCH_3D", "1") != "0":
        try:
            r = _step_time_beltrami_3d()
            result["beltrami3d_s_per_step"] = r["s_per_step"]
            result["beltrami3d_dispatches_per_step"] = r[
                "dispatches_per_step"
            ]
            if overhead_s is not None:
                result["beltrami3d_device_s_per_step_est"] = max(
                    r["s_per_step"] - r["dispatches_per_step"] * overhead_s,
                    0.0,
                )
        except Exception as ex:
            result["beltrami3d_error"] = f"{type(ex).__name__}: {ex}"

    # flagship-scale 3D two-phase: 32,768-cell rising bubble on the
    # resident variable-coefficient path (round-5 VERDICT #3). Runs in a
    # SUBPROCESS with its own time budget: a fresh process sees a clean
    # chip (the bench main still holds every earlier section's arrays and
    # executables — running this largest configuration in-process
    # exhausted HBM), and a compile blowout can never cost the whole
    # bench run.
    if os.environ.get("ADAFLO_BENCH_RB3D", "1") != "0":
        import subprocess

        script = (
            "import os, sys, json\n"
            "os.environ['ADAFLO_TPU_NO_X64'] = '1'\n"
            f"sys.path.insert(0, {repr(os.path.dirname(os.path.abspath(__file__)))})\n"
            "import bench\n"
            "r = bench._step_time_rising_bubble_3d()\n"
            "print('RB3D_JSON ' + json.dumps(r))\n"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", script],
                capture_output=True,
                text=True,
                timeout=int(os.environ.get("ADAFLO_BENCH_RB3D_BUDGET_S",
                                           "2400")),
            )
            line = next(
                (l for l in proc.stdout.splitlines()
                 if l.startswith("RB3D_JSON ")),
                None,
            )
            if line is None:
                tail = (proc.stderr or "").strip().splitlines()[-1:]
                raise RuntimeError(
                    f"subprocess rc={proc.returncode}: {tail}"
                )
            r = json.loads(line[len("RB3D_JSON "):])
            result["rb_ls_3d_s_per_step"] = r["s_per_step"]
            result["rb_ls_3d_dispatches_per_step"] = r[
                "dispatches_per_step"
            ]
            if overhead_s is not None:
                result["rb_ls_3d_device_s_per_step_est"] = max(
                    r["s_per_step"] - r["dispatches_per_step"] * overhead_s,
                    0.0,
                )
        except Exception as ex:
            result["rb_ls_3d_error"] = f"{type(ex).__name__}: {str(ex)[:300]}"

    print(json.dumps(result))


def _timed_call(fn) -> float:
    import time as _time

    t0 = _time.perf_counter()
    fn()
    return _time.perf_counter() - t0


def _matvec_time(cells: int, layout: str, reps: int) -> dict:
    """One coupled mat-vec timing at a given mesh size and layout (the
    second-size probe of the headline metric). Returns n_dofs, ms/apply and
    the min-bytes basis."""
    import jax
    import jax.numpy as jnp

    from adaflo_tpu.fe.constraints import Constraints
    from adaflo_tpu.fe.space import ScalarSpace
    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.ops.navier_stokes import (
        Linearized,
        NavierStokesOperator,
        TimeWeights,
    )
    from adaflo_tpu.parameters import FlowParameters

    os.environ["ADAFLO_PALLAS_LAYOUT"] = layout
    par = FlowParameters.from_string(
        "subsection Navier-Stokes\n  set dimension = 3\n"
        "  set velocity degree = 2\nend\n"
    )
    mesh = StructuredMesh((cells,) * 3, (0.0,) * 3, (1.0,) * 3)
    us, ps = ScalarSpace(mesh, 2), ScalarSpace(mesh, 1)
    cu = []
    for _ in range(3):
        c = Constraints(us.n_dofs)
        c.close()
        cu.append(c)
    cp = Constraints(ps.n_dofs)
    cp.close()
    op = NavierStokesOperator(par, us, ps, cu, cp, dtype=jnp.float32)
    n_dofs = 3 * us.n_dofs + ps.n_dofs
    tw = TimeWeights(*(jnp.float32(v) for v in (30.0, -30.0, 0.0, 1.0)))
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (3, us.n_dofs), jnp.float32)
    p = jax.random.normal(key, (ps.n_dofs,), jnp.float32)
    ld = op._gather_u(u, resolve=False)
    lv = op.ev_u.values(ld)
    lg = op.ev_u.gradients(ld)
    lin = Linearized(lv, lg, jnp.trace(lg, axis1=1, axis2=2), ld)
    from adaflo_tpu.ops.pallas_matvec import stream_t

    qt = stream_t(lin)
    if layout in ("pe", "pi", "pr"):
        qt = op.lat_u.cells_to_anchors(qt)
    lin = lin._replace(qt=qt)

    # `lin` rides as a jit ARGUMENT: captured device arrays are embedded
    # as literal constants in the lowered program (~100MB of MLIR at 84^3,
    # which OOMs the compile helper)
    if layout == "pr" and op.pr_supported():

        @jax.jit
        def chained(uu, pp, ll):
            # fused scale+norm chain: each iteration is ONE kernel (no
            # separate normalize pass — at 15.1M dofs that pass alone
            # costs ~0.35 ms/apply)
            x = op.pr_pack(uu, pp)

            def body(i, carry):
                xx, n = carry
                r, n2 = op.vmult_pr(
                    xx, tw, ll, scale=jax.lax.rsqrt(n), want_norm=True
                )
                return r, jnp.maximum(n2, 1e-60)

            x, _ = jax.lax.fori_loop(
                0, reps, body, (x, jnp.asarray(1.0, x.dtype))
            )
            ru, rp = op.pr_unpack(x)
            return jnp.sum(ru) + jnp.sum(rp)

    else:

        @jax.jit
        def chained(uu, pp, ll):
            def body(i, carry):
                ru, rp = op.vmult(carry[0], carry[1], tw, ll)
                s = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(ru * ru)), 1e-30)
                return (ru * s, rp * s)

            ru, rp = jax.lax.fori_loop(0, reps, body, (uu, pp))
            return jnp.sum(ru) + jnp.sum(rp)

    float(chained(u, p, lin))
    dt = min(_timed_call(lambda: float(chained(u, p, lin))) for _ in range(3))
    bytes_min = 2 * n_dofs * 4 + mesh.n_cells * 3 * us.n_local * 2
    return {"n_dofs": n_dofs, "ms": dt / reps * 1e3, "bytes_min": bytes_min}


class _DispatchCounter:
    """Counts calls to jax.jit-compiled functions. Installed by patching
    jax.jit BEFORE the solver is constructed, so every jitted callable the
    solver creates increments the counter when dispatched. Host<->device
    scalar readbacks ride the same round trip as the dispatch they follow,
    so dispatches are the unit the tunnel overhead multiplies."""

    def __init__(self):
        self.count = 0
        self._orig = None

    def install(self):
        import functools

        import jax

        self._orig = orig = jax.jit
        counter = self

        def counting_jit(fn=None, **kw):
            if fn is None:
                return lambda f: counting_jit(f, **kw)
            compiled = orig(fn, **kw)

            @functools.wraps(fn)
            def call(*a, **k):
                counter.count += 1
                return compiled(*a, **k)

            return call

        jax.jit = counting_jit

    def uninstall(self):
        import jax

        jax.jit = self._orig


def _dispatch_overhead_s() -> float:
    """Measured per-dispatch round-trip overhead: a trivial jitted op with a
    forced scalar readback (device time is negligible, so this is the
    host/tunnel cost each dispatch pays)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))  # compile
    return min(_timed_call(lambda: float(f(x))) for _ in range(20))


def _step_time_rising_bubble(prm_name: str) -> dict:
    """Seconds per time step + jitted dispatches per step of a
    rising_bubble_ls configuration (the BASELINE-declared wall-time/timestep
    benchmark): best of 3 steps after a 1-step warmup (compile + cache)."""
    import io
    import time as _time
    from pathlib import Path

    counter = _DispatchCounter()
    counter.install()
    try:
        from adaflo_tpu.drivers.rising_bubble import (
            MicroFluidicProblem,
            TwoPhaseParameters,
            initial_distance,
        )
        from adaflo_tpu.functions import ZeroFunction

        prm = Path(__file__).resolve().parent / "tests/prms" / prm_name
        par = TwoPhaseParameters.from_file(str(prm))
        par.output_verbosity = 0
        par.end_time = 1.0  # enough steps to time past warmup
        # f32 deployment precision: the f64 tolerances are unreachable; use
        # the f32-appropriate targets (same iteration structure)
        par.tol_nl_iteration = max(par.tol_nl_iteration, 5e-6)
        par.tol_lin_iteration = max(par.tol_lin_iteration, 1e-4)
        prob = MicroFluidicProblem(par, out=io.StringIO())
        solver = prob.solver
        solver.set_no_slip_boundary(0)
        solver.fix_pressure_constant(0)
        solver.set_symmetry_boundary(2)
        solver.setup_problem(ZeroFunction(par.dimension), initial_distance)
        solver.advance_time_step()  # warmup/compile
        best = float("inf")
        n_disp = 0
        for _ in range(3):
            c0 = counter.count
            t0 = _time.perf_counter()
            solver.advance_time_step()
            dt = _time.perf_counter() - t0
            if dt < best:
                best, n_disp = dt, counter.count - c0
        return {"s_per_step": best, "dispatches_per_step": n_disp}
    finally:
        counter.uninstall()


def _step_time_rising_bubble_3d() -> dict:
    """Seconds per step of a FLAGSHIP-scale 3D two-phase configuration:
    32,768 cells (32^3 Q2/Q1, ~860k NS dofs + 2.15M level-set dofs) —
    3D + two-phase + at the 32k-cell Pallas gate, so the NS Krylov
    solve runs the parity-RESIDENT kernel with the streamed variable
    rho/mu coefficient block (the BASELINE.json north-star class; the
    64k- and 128k-cell variants exceed the single v5e's 16 GB HBM
    through the level-set pipeline's working set)."""
    import io
    import time as _time
    from pathlib import Path

    import numpy as np

    counter = _DispatchCounter()
    counter.install()
    try:
        from adaflo_tpu.drivers.rising_bubble import (
            TwoPhaseParameters,
            initial_distance,
        )
        from adaflo_tpu.functions import ZeroFunction
        from adaflo_tpu.mesh.structured import StructuredMesh
        from adaflo_tpu.twophase.level_set_okz import LevelSetOKZSolver

        prm = (
            Path(__file__).resolve().parent
            / "tests/prms/rising_bubble_ls_3d_bench.prm"
        )
        par = TwoPhaseParameters.from_file(str(prm))
        par.output_verbosity = 0
        par.end_time = 1.0
        par.tol_nl_iteration = max(par.tol_nl_iteration, 5e-6)
        par.tol_lin_iteration = max(par.tol_lin_iteration, 1e-4)
        # bound the Krylov basis memory: ~10 jitted programs (fused
        # pre-Newton, Newton loop, advect+reinit, preconditioner build,
        # ...) hold their workspaces concurrently on the 16 GB chip, and
        # a restart-50 FGMRES basis in several of them tips it over
        par.max_lin_iteration = min(par.max_lin_iteration, 30)
        # the mesh below is built at FULL resolution: zero the prm's
        # refine count or setup_problem would refine it 2^(3*3)x more
        # (the source of this bench's serial "HBM OOMs" — they were
        # 16.8M-cell meshes)
        par.global_refinements = 0
        mesh = StructuredMesh.subdivided_hyper_rectangle(
            (32, 32, 32), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
        )
        # symmetry on the four side faces, no-slip top/bottom (the 3D
        # analog of rising_bubble.cc:136-144)
        eps = 1e-14
        mesh.set_boundary_id(
            lambda c: (np.abs(c[:, 0] - 1) < eps)
            | (np.abs(c[:, 0]) < eps)
            | (np.abs(c[:, 1] - 1) < eps)
            | (np.abs(c[:, 1]) < eps),
            2,
        )
        solver = LevelSetOKZSolver(par, mesh, out=io.StringIO())
        solver.set_no_slip_boundary(0)
        solver.fix_pressure_constant(0)
        solver.set_symmetry_boundary(2)
        solver.setup_problem(ZeroFunction(3), initial_distance)
        solver.advance_time_step()  # warmup/compile
        best = float("inf")
        n_disp = 0
        for _ in range(2):
            c0 = counter.count
            t0 = _time.perf_counter()
            solver.advance_time_step()
            dt = _time.perf_counter() - t0
            if dt < best:
                best, n_disp = dt, counter.count - c0
        return {"s_per_step": best, "dispatches_per_step": n_disp}
    finally:
        counter.uninstall()


def _step_time_beltrami_3d() -> dict:
    """Seconds per time step of the reference's beltrami_3d configuration
    (112,724 DoF Q2/Q1 3D coupled Newton, beltrami_3d.output)."""
    import io
    import time as _time
    from pathlib import Path

    counter = _DispatchCounter()
    counter.install()
    try:
        from adaflo_tpu.drivers.beltrami import (
            BeltramiProblem,
            exact_p,
            exact_u,
            interpolate,
            _to_jnp,
        )
        from adaflo_tpu.parameters import FlowParameters

        prm = Path(__file__).resolve().parent / "tests/prms/beltrami_3d.prm"
        par = FlowParameters.from_file(str(prm))
        par.output_verbosity = 0
        par.tol_nl_iteration = max(par.tol_nl_iteration, 5e-6)
        par.tol_lin_iteration = max(par.tol_lin_iteration, 1e-4)
        prob = BeltramiProblem(par, out=io.StringIO())
        ns = prob.navier_stokes
        dim, nu = 3, prob.nu
        ns.set_velocity_dirichlet_boundary(
            0, lambda x, t: exact_u(nu, dim)(x, t)
        )
        ns.fix_pressure_constant(0, lambda x, t: exact_p(nu, dim)(x, t))
        ns.setup_problem()
        ns.solution[0] = _to_jnp(interpolate(ns.u_space, exact_u(nu, dim)))
        p0 = interpolate(ns.p_space, exact_p(nu, dim))
        ns.solution[1] = ns.solution[1].at[: len(p0)].set(_to_jnp(p0))

        def one_step():
            ns.init_time_advance(True)
            ns.evaluate_time_step()

        one_step()  # warmup/compile
        best = float("inf")
        n_disp = 0
        for _ in range(3):
            c0 = counter.count
            t0 = _time.perf_counter()
            one_step()
            dt = _time.perf_counter() - t0
            if dt < best:
                best, n_disp = dt, counter.count - c0
        return {"s_per_step": best, "dispatches_per_step": n_disp}
    finally:
        counter.uninstall()


if __name__ == "__main__":
    main()
