"""Checkpoint / resume of solver state.

The reference has no checkpointing (SURVEY.md section 5: state only survives
mesh changes via SolutionTransfer); this framework adds it: the complete
time-stepping state (solution history + controller clock) round-trips
through a single .npz file, so long runs resume exactly (the BDF-2 history
is part of the state, so the restarted trajectory is bit-identical).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _ts_state(ts) -> dict:
    return {
        "ts_now": ts._now,
        "ts_prev": ts._prev,
        "ts_step_no": ts._step_no,
        "ts_current_step": ts._current_step,
        "ts_last_step": ts._last_step,
        "ts_step": ts._step,
        "ts_weight": ts._weight,
        "ts_weight_old": ts._weight_old,
        "ts_weight_old_old": ts._weight_old_old,
        "ts_f_ex_old": ts._factor_extrapol_old,
        "ts_f_ex_old_old": ts._factor_extrapol_old_old,
        "ts_at_end": ts._at_end,
    }


def _restore_ts(ts, data) -> None:
    ts._now = float(data["ts_now"])
    ts._prev = float(data["ts_prev"])
    ts._step_no = int(data["ts_step_no"])
    ts._current_step = float(data["ts_current_step"])
    ts._last_step = float(data["ts_last_step"])
    ts._step = float(data["ts_step"])
    ts._weight = float(data["ts_weight"])
    ts._weight_old = float(data["ts_weight_old"])
    ts._weight_old_old = float(data["ts_weight_old_old"])
    ts._factor_extrapol_old = float(data["ts_f_ex_old"])
    ts._factor_extrapol_old_old = float(data["ts_f_ex_old_old"])
    ts._at_end = bool(data["ts_at_end"])


def save_navier_stokes(ns, path: str) -> None:
    state = _ts_state(ns.time_stepping)
    for name in ("solution", "solution_old", "solution_old_old"):
        blocks = getattr(ns, name)
        state[f"{name}_u"] = np.asarray(blocks[0])
        state[f"{name}_p"] = np.asarray(blocks[1])
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **state)


def load_navier_stokes(ns, path: str) -> None:
    import jax.numpy as jnp

    data = np.load(path)
    _restore_ts(ns.time_stepping, data)
    for name in ("solution", "solution_old", "solution_old_old"):
        blocks = getattr(ns, name)
        blocks[0] = jnp.asarray(data[f"{name}_u"])
        blocks[1] = jnp.asarray(data[f"{name}_p"])
    ns.update_preconditioner = True


def save_two_phase(solver, path: str) -> None:
    ns = solver.navier_stokes
    state = _ts_state(solver.time_stepping)
    for name in ("solution", "solution_old", "solution_old_old"):
        blocks = getattr(ns, name)
        state[f"ns_{name}_u"] = np.asarray(blocks[0])
        state[f"ns_{name}_p"] = np.asarray(blocks[1])
        cblocks = getattr(solver, name)
        state[f"c_{name}_0"] = np.asarray(cblocks[0])
        state[f"c_{name}_1"] = np.asarray(cblocks[1])
    state["heaviside"] = np.asarray(solver.heaviside)
    state["normals"] = np.asarray(solver.normal_vector_field)
    state["old_residual"] = getattr(solver, "old_residual", 1e30)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **state)


def load_two_phase(solver, path: str) -> None:
    import jax.numpy as jnp

    data = np.load(path)
    ns = solver.navier_stokes
    _restore_ts(solver.time_stepping, data)
    for name in ("solution", "solution_old", "solution_old_old"):
        blocks = getattr(ns, name)
        blocks[0] = jnp.asarray(data[f"ns_{name}_u"])
        blocks[1] = jnp.asarray(data[f"ns_{name}_p"])
        cblocks = getattr(solver, name)
        cblocks[0] = jnp.asarray(data[f"c_{name}_0"])
        cblocks[1] = jnp.asarray(data[f"c_{name}_1"])
    solver.heaviside = jnp.asarray(data["heaviside"])
    solver.normal_vector_field = jnp.asarray(data["normals"])
    solver.old_residual = float(data["old_residual"])
    ns.update_preconditioner = True
