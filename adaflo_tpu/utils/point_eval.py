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


def solid_angle_inside(
    vertices: np.ndarray, triangles: np.ndarray, points: np.ndarray,
    chunk: int = 4096,
) -> np.ndarray:
    """Boolean inside-test for a closed triangle surface against (n, 3)
    points — the 3D counterpart of winding_number_inside (the reference's
    boost::geometry phase classification, sharp_interface_util.h:126-233):
    the summed signed solid angle (van Oosterom-Strackee) is ~4*pi inside,
    ~0 outside."""
    tri = vertices[triangles]  # (T, 3, 3)
    out = np.empty(len(points), dtype=bool)
    for s in range(0, len(points), chunk):
        p = points[s : s + chunk]
        a = tri[None, :, 0, :] - p[:, None, :]
        b = tri[None, :, 1, :] - p[:, None, :]
        c = tri[None, :, 2, :] - p[:, None, :]
        la = np.linalg.norm(a, axis=2)
        lb = np.linalg.norm(b, axis=2)
        lc = np.linalg.norm(c, axis=2)
        num = np.einsum("ptd,ptd->pt", a, np.cross(b, c))
        den = (
            la * lb * lc
            + np.einsum("ptd,ptd->pt", a, b) * lc
            + np.einsum("ptd,ptd->pt", b, c) * la
            + np.einsum("ptd,ptd->pt", c, a) * lb
        )
        omega = 2.0 * np.arctan2(num, den)
        out[s : s + chunk] = np.abs(omega.sum(axis=1)) > 2.0 * np.pi
    return out


# 6-tet decomposition of the unit cube (lexicographic corners 0..7) around
# the 0-7 diagonal; all tets share edge (0, 7)
_CUBE_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ]
)
_TET_EDGES = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
# case table: sign mask (bit i = value_i > 0) -> triangles as edge triples.
# popcount 1 cases; popcount 2 quads split into two triangles with the
# crossing edges in cyclic order; complements reuse the same geometry.
_TET_CASES = {
    0b0001: [(0, 1, 2)],
    0b0010: [(0, 3, 4)],
    0b0100: [(1, 3, 5)],
    0b1000: [(2, 4, 5)],
    0b0011: [(1, 2, 4), (1, 4, 3)],
    0b0101: [(0, 2, 5), (0, 5, 3)],
    0b1001: [(0, 1, 5), (0, 5, 4)],
}


def marching_tetrahedra_cells(corner_values: np.ndarray, corner_coords: np.ndarray):
    """Zero-contour triangles from hexahedral sub-cells: corner_values
    (N, 8), corner_coords (N, 8, 3), corners lexicographic. Returns
    (n_tri, 3, 3) triangle soup (the GridTools::MarchingCubeAlgorithm
    analog of sharp_interface_util.h:833, built on the ambiguity-free
    6-tet decomposition)."""
    v = corner_values[:, _CUBE_TETS]  # (N, 6, 4)
    p = corner_coords[:, _CUBE_TETS]  # (N, 6, 4, 3)
    v = v.reshape(-1, 4) + 1e-22
    p = p.reshape(-1, 4, 3)
    pos = v > 0
    mask = (
        pos[:, 0] * 1 + pos[:, 1] * 2 + pos[:, 2] * 4 + pos[:, 3] * 8
    ).astype(np.int64)
    # crossing points on all 6 tet edges (valid only where signs differ)
    va = v[:, _TET_EDGES[:, 0]]
    vb = v[:, _TET_EDGES[:, 1]]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = va / np.where(np.abs(va - vb) > 1e-300, va - vb, 1.0)
    pa = p[:, _TET_EDGES[:, 0]]
    pb = p[:, _TET_EDGES[:, 1]]
    px = pa + (pb - pa) * t[:, :, None]  # (M, 6, 3)

    tris = []
    for m, tri_list in _TET_CASES.items():
        sel = (mask == m) | (mask == (~m & 0xF))
        if not sel.any():
            continue
        # a positive vertex of each selected tet (orientation anchor)
        pos_sel = pos[sel]
        first_pos = np.argmax(pos_sel, axis=1)
        p_pos = p[sel][np.arange(sel.sum()), first_pos]
        for e0, e1, e2 in tri_list:
            t = np.stack([px[sel, e0], px[sel, e1], px[sel, e2]], axis=1)
            # orient the normal toward the positive-phi side
            nrm = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
            flip = (
                np.einsum("td,td->t", nrm, p_pos - t.mean(axis=1)) < 0
            )
            t[flip] = t[flip][:, ::-1]
            tris.append(t)
    if not tris:
        return np.zeros((0, 3, 3))
    return np.concatenate(tris, axis=0)
