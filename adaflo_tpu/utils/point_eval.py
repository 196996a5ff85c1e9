"""Evaluation of FE fields at arbitrary physical points + transpose scatter.

Counterpart of deal.II FEPointEvaluation / RemotePointEvaluation as used by
the reference's sharp-interface module (sharp_interface_util.h:52-123,
242-330): on the structured mesh, point location is integer arithmetic and
basis evaluation is the tensor product of per-point 1D tabulations. Host
numpy (diagnostics / front-tracking cadence, off the device hot path).
"""

from __future__ import annotations

import numpy as np

from adaflo_tpu.fe.space import ScalarSpace


def locate_points(mesh, points: np.ndarray):
    """(n, dim) physical points -> (cell_index (n,), local coords (n, dim))."""
    ref = (points - mesh.origin[None, :]) / mesh.h[None, :]
    cell_axis = np.clip(
        np.floor(ref).astype(np.int64),
        0,
        np.asarray(mesh.n_cells_axis) - 1,
    )
    local = ref - cell_axis
    idx = cell_axis[:, 0].copy()
    stride = 1
    for a in range(1, mesh.dim):
        stride *= mesh.n_cells_axis[a - 1]
        idx += stride * cell_axis[:, a]
    return idx, local


def _point_basis(space: ScalarSpace, local: np.ndarray) -> np.ndarray:
    """(n, dim) local coords -> (n, n_local) basis values (x fastest)."""
    mats = [space.basis.tabulate(local[:, a])[0] for a in range(space.dim)]
    if space.dim == 1:
        return mats[0]
    if space.dim == 2:
        return np.einsum("pi,pj->pji", mats[0], mats[1]).reshape(
            len(local), -1
        )[:, _lex_perm(space)]
    return np.einsum("pi,pj,pk->pkji", mats[0], mats[1], mats[2]).reshape(
        len(local), -1
    )[:, _lex_perm(space)]


def _lex_perm(space):
    # einsum output above is already (z, y, x) C-order = x fastest: identity
    return np.arange(space.n_local)


def evaluate_at_points(space: ScalarSpace, values: np.ndarray, points: np.ndarray):
    """Evaluate a field at points. values: (n,) scalar or (C, n) vector."""
    idx, local = locate_points(space.mesh, points)
    phi = _point_basis(space, local)  # (n_pts, n_local)
    cd = space.cell_dofs[idx]  # (n_pts, n_local)
    values = np.asarray(values)
    if values.ndim == 1:
        return np.einsum("pl,pl->p", phi, values[cd])
    return np.einsum("pl,cpl->cp", phi, values[:, cd])


def scatter_at_points(
    space: ScalarSpace, points: np.ndarray, weights: np.ndarray, n_components=1
):
    """Transpose of evaluate_at_points: r_i += phi_i(x_p) w_p.
    weights: (n_pts,) or (C, n_pts); returns (n,) or (C, n) (padded)."""
    idx, local = locate_points(space.mesh, points)
    phi = _point_basis(space, local)
    cd = space.cell_dofs[idx]
    if n_components == 1:
        out = np.zeros(space.n_dofs_padded)
        np.add.at(out, cd.reshape(-1), (phi * weights[:, None]).reshape(-1))
        return out
    out = np.zeros((n_components, space.n_dofs_padded))
    for c in range(n_components):
        np.add.at(
            out[c], cd.reshape(-1), (phi * weights[c][:, None]).reshape(-1)
        )
    return out


def winding_number_inside(polygon: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Boolean inside-test for a closed polygon (n_v, 2) against (n, 2)
    points — the reference's boost::geometry point-in-polygon replacement
    (sharp_interface_util.h:126-233), vectorized crossing-number test."""
    x, y = points[:, 0], points[:, 1]
    x0, y0 = polygon[:, 0], polygon[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    # crossing number: edges straddling the horizontal ray
    cond = (y0[None, :] <= y[:, None]) != (y1[None, :] <= y[:, None])
    denom = np.where(np.abs(y1 - y0) > 1e-300, y1 - y0, 1.0)
    t = (y[:, None] - y0[None, :]) / denom[None, :]
    xi = x0[None, :] + t * (x1 - x0)[None, :]
    crossings = np.sum(cond & (xi > x[:, None]), axis=1)
    return crossings % 2 == 1
