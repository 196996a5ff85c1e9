"""Error norms and interpolation utilities.

Counterpart of VectorTools::integrate_difference / interpolate as used by the
reference drivers (e.g. /root/reference/tests/poiseuille.cc:154-195): cellwise
L2 errors against an analytic solution with a high-order quadrature, combined
as the l2 norm of the cell values.
"""

from __future__ import annotations

import numpy as np

from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.ops.tensor import CellEvaluator


def _evaluator(space, n_q_1d: int):
    """(evaluator, quad coords (E, n_q, dim), jxw (E, n_q)) for uniform or
    adaptive-forest spaces."""
    if getattr(space, "is_forest", False):
        from adaflo_tpu.ops.tensor import VariableCellEvaluator

        ev = VariableCellEvaluator(space.dim, space.basis, n_q_1d, space.h_cells)
        return ev, ev.quad_coords(space), np.asarray(ev.jxw_cells)
    mesh = space.mesh
    ev = CellEvaluator(space.dim, space.basis, n_q_1d, mesh.h)
    jxw = np.broadcast_to(np.asarray(ev.jxw), (mesh.n_cells, ev.n_q))
    return ev, ev.quad_coords(mesh), jxw


def interpolate(space: ScalarSpace, fn, time: float = 0.0) -> np.ndarray:
    """Nodal interpolation; returns (n,) for scalar fn, (C, n) for vector."""
    return np.asarray(fn(space.node_coords, time))


def l2_error(
    space: ScalarSpace,
    vec,
    exact_fn,
    time: float = 0.0,
    n_q_1d: int | None = None,
    n_components: int = 1,
) -> float:
    """sqrt(int (u_h - u)^2 dx) with an n_q_1d Gauss rule (defaults to
    degree+2 like the reference drivers)."""
    import jax.numpy as jnp

    if n_q_1d is None:
        n_q_1d = space.degree + 2
    ev, qp, jxw = _evaluator(space, n_q_1d)
    E = qp.shape[0]
    exact = np.asarray(exact_fn(qp.reshape(-1, space.dim), time))
    vec = np.asarray(vec)
    if n_components == 1:
        cells = jnp.asarray(vec[space.cell_dofs])
        vals = np.asarray(ev.values(cells)).reshape(-1)
        diff2 = (vals - exact) ** 2
    else:
        cells = jnp.asarray(
            np.transpose(vec[:, space.cell_dofs], (1, 0, 2))
        )  # (E, C, nloc)
        vals = np.asarray(ev.values(cells))  # (E, C, n_q)
        exact = exact.reshape(n_components, E, ev.n_q)
        diff2 = ((np.transpose(vals, (1, 0, 2)) - exact) ** 2).sum(axis=0).reshape(-1)
    return float(np.sqrt(np.sum(diff2 * jxw.reshape(-1))))


def l2_norm(space: ScalarSpace, vec, n_q_1d: int, n_components: int = 1) -> float:
    """sqrt(int u_h^2 dx) with an n_q_1d Gauss rule (for relative errors,
    beltrami.cc:280-297 uses degree v_degree)."""
    return l2_error(
        space,
        vec,
        lambda x, t: (
            np.zeros(len(x)) if n_components == 1 else np.zeros((n_components, len(x)))
        ),
        n_q_1d=n_q_1d,
        n_components=n_components,
    )


def cell_divergence_norm(space: ScalarSpace, u, n_q_1d: int | None = None) -> float:
    """l2 norm over cells of the cellwise integral of div(u)
    (beltrami.cc:228-251)."""
    import jax.numpy as jnp

    if n_q_1d is None:
        n_q_1d = space.degree + 1
    ev, _, jxw = _evaluator(space, n_q_1d)
    u = np.asarray(u)
    cells = jnp.asarray(np.transpose(u[:, space.cell_dofs], (1, 0, 2)))
    grads = np.asarray(ev.gradients(cells))  # (E, C, dim, n_q)
    div = np.trace(grads, axis1=1, axis2=2)  # (E, n_q)
    cell_div = (div * jxw).sum(axis=1)
    return float(np.sqrt((cell_div**2).sum()))


def max_value(space: ScalarSpace, vec, n_components: int = 1) -> float:
    """Maximum magnitude over quadrature points (get_maximal_velocity
    equivalent, two_phase_base.cc:479-545)."""
    import jax.numpy as jnp

    ev, _, _ = _evaluator(space, space.degree + 1)
    vec = np.asarray(vec)
    if n_components == 1:
        vals = np.asarray(ev.values(jnp.asarray(vec[space.cell_dofs])))
        return float(np.abs(vals).max())
    cells = jnp.asarray(np.transpose(vec[:, space.cell_dofs], (1, 0, 2)))
    vals = np.asarray(ev.values(cells))  # (E, C, n_q)
    mag = np.sqrt((vals**2).sum(axis=1))
    return float(mag.max())


def l2_error_augmented_pressure(
    op, p, exact_fn, time: float = 0.0, n_q_1d: int | None = None
) -> float:
    """L2 pressure error for augmented Taylor-Hood (FE_Q_DG0): evaluates the
    Q part plus the per-cell constant at the quadrature points."""
    import jax.numpy as jnp

    space = op.p_space
    mesh = space.mesh
    if n_q_1d is None:
        n_q_1d = space.degree + 3
    ev = CellEvaluator(space.dim, space.basis, n_q_1d, mesh.h)
    vals = np.asarray(
        ev.values(jnp.asarray(np.asarray(p)[: space.n_dofs][space.cell_dofs]))
    )
    pc = np.asarray(p)[op.n_p_q : op.n_p_q + mesh.n_cells]
    vals = vals + pc[:, None]
    qp = ev.quad_coords(mesh)
    exact = np.asarray(exact_fn(qp.reshape(-1, space.dim), time)).reshape(
        mesh.n_cells, ev.n_q
    )
    jxw = np.asarray(ev.jxw)
    return float(np.sqrt((((vals - exact) ** 2) * jxw[None, :]).sum()))
