"""Solution output: VTU (VTK XML) time series.

Counterpart of the reference's DataOut + write_data_output
(/root/reference/source/flow_base_algorithm.cc:222-279): per-cell patches
with optional subdivision, vtu files per output step plus a .pvd collection
honoring the tick-based output cadence. Single-file writer (the sharded
solver gathers to host for diagnostics output, which is off the hot path).
"""

from __future__ import annotations

import os
import xml.sax.saxutils as sx
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from adaflo_tpu.fe.basis import equidistant_points
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.ops.tensor import CellEvaluator

VTK_VERTEX = 1
VTK_LINE = 3
VTK_TRIANGLE = 5
VTK_QUAD = 9
VTK_HEXAHEDRON = 12


def _ref_lattice(pts: np.ndarray, dim: int) -> np.ndarray:
    """((n)^dim, dim) tensor lattice of 1D points, x fastest."""
    if dim == 1:
        return pts[:, None]
    if dim == 2:
        return np.stack(
            np.meshgrid(pts, pts, indexing="ij")[::-1], axis=-1
        ).reshape(-1, 2)
    return np.stack(
        np.meshgrid(pts, pts, pts, indexing="ij")[::-1], axis=-1
    ).reshape(-1, 3)


def _patch_points(mesh, n_sub: int) -> np.ndarray:
    """(E, (n_sub+1)^dim, dim) patch point coordinates."""
    pts = equidistant_points(n_sub + 1)
    if hasattr(mesh, "cell_geometry"):  # adaptive forest
        centers, h = mesh.cell_geometry()
        ref = _ref_lattice(pts, mesh.dim)
        return (centers - 0.5 * h)[:, None, :] + ref[None] * h[:, None, :]
    if hasattr(mesh, "edge_manifold"):  # unstructured QuadMesh (curved)
        from adaflo_tpu.fe.mapped_space import CellMapping

        return CellMapping(mesh, 3).map_points(_ref_lattice(pts, mesh.dim))
    if getattr(mesh, "is_graded", False):  # graded tensor mesh
        origins = mesh.cell_origins()
        h = mesh.cell_widths()
        ref = _ref_lattice(pts, mesh.dim)
        return origins[:, None, :] + ref[None] * h[:, None, :]
    dummy_basis = ScalarSpace(mesh, 1).basis
    ev = CellEvaluator(mesh.dim, dummy_basis, (pts, np.zeros_like(pts)), mesh.h)
    return ev.quad_coords(mesh)


def _field_at_patch_points(space: ScalarSpace, values: np.ndarray, n_sub: int):
    import jax.numpy as jnp

    pts = equidistant_points(n_sub + 1)
    # values() never uses the cell extents, so a unit h works for any mesh
    ev = CellEvaluator(
        space.dim, space.basis, (pts, np.zeros_like(pts)), (1.0,) * space.dim
    )
    values = np.asarray(values)
    if values.ndim == 1:
        return np.asarray(ev.values(jnp.asarray(values[space.cell_dofs])))
    cells = jnp.asarray(np.transpose(values[:, space.cell_dofs], (1, 0, 2)))
    return np.asarray(ev.values(cells))  # (E, C, n_pts)


def _write_vtu_simplex(filename, mesh, fields) -> None:
    """Triangle meshes: one VTK_TRIANGLE per cell, fields at the vertices."""
    verts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    E = mesh.n_cells
    pts3 = np.zeros((3 * E, 3))
    pts3[:, :2] = mesh.vertices[mesh.cells].reshape(-1, 2)
    conn = np.arange(3 * E).reshape(E, 3)
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">',
        "<UnstructuredGrid>",
        f'<Piece NumberOfPoints="{3 * E}" NumberOfCells="{E}">',
        "<Points>",
        '<DataArray type="Float64" NumberOfComponents="3" format="ascii">',
        "\n".join(" ".join("%.12g" % v for v in row) for row in pts3),
        "</DataArray></Points>",
        "<Cells>",
        '<DataArray type="Int32" Name="connectivity" format="ascii">',
        "\n".join(" ".join(str(v) for v in row) for row in conn),
        "</DataArray>",
        '<DataArray type="Int32" Name="offsets" format="ascii">',
        " ".join(str(3 * (i + 1)) for i in range(E)),
        "</DataArray>",
        '<DataArray type="UInt8" Name="types" format="ascii">',
        " ".join(str(VTK_TRIANGLE) for _ in range(E)),
        "</DataArray></Cells>",
        "<PointData>",
    ]
    for name, (space, values, ncomp) in fields.items():
        V, _ = space.element.tabulate(verts)  # (3, n_loc)
        values = np.asarray(values)
        if values.ndim == 1:
            vals = np.einsum("pi,ei->ep", V, values[space.cell_dofs])
            data = vals.reshape(-1, 1)
            lines.append(
                f'<DataArray type="Float64" Name="{sx.escape(name)}" format="ascii">'
            )
        else:
            cells = np.transpose(values[:, space.cell_dofs], (1, 0, 2))
            vals = np.einsum("pi,eci->ecp", V, cells)  # (E, C, 3)
            data = np.zeros((3 * E, 3))
            data[:, :ncomp] = np.transpose(vals, (0, 2, 1)).reshape(-1, ncomp)
            lines.append(
                f'<DataArray type="Float64" Name="{sx.escape(name)}" '
                'NumberOfComponents="3" format="ascii">'
            )
        lines.append(
            "\n".join(" ".join("%.12g" % v for v in row) for row in np.atleast_2d(data))
        )
        lines.append("</DataArray>")
    lines += ["</PointData>", "</Piece></UnstructuredGrid></VTKFile>"]
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    Path(filename).write_text("\n".join(lines))


def write_vtu(
    filename: str,
    mesh,
    fields: Dict[str, Tuple[ScalarSpace, np.ndarray, int]],
    n_subdivisions: int = 1,
) -> None:
    """fields: name -> (space, dof values ((n,) or (C, n)), n_components)."""
    if getattr(mesh, "is_simplex", False):
        _write_vtu_simplex(filename, mesh, fields)
        return
    dim = mesh.dim
    n_sub = max(n_subdivisions, 1)
    coords = _patch_points(mesh, n_sub)  # (E, P, dim)
    E, P, _ = coords.shape
    n_points = E * P
    pts3 = np.zeros((n_points, 3))
    pts3[:, :dim] = coords.reshape(-1, dim)

    # connectivity: subcells of each patch
    n1 = n_sub + 1
    if dim == 1:
        corner = np.arange(n_sub)
        conn_local = np.stack([corner, corner + 1], axis=1)
        ctype = VTK_LINE
    elif dim == 2:
        iy, ix = np.meshgrid(np.arange(n_sub), np.arange(n_sub), indexing="ij")
        base = (iy * n1 + ix).reshape(-1)
        conn_local = np.stack([base, base + 1, base + n1 + 1, base + n1], axis=1)
        ctype = VTK_QUAD
    else:
        iz, iy, ix = np.meshgrid(
            np.arange(n_sub), np.arange(n_sub), np.arange(n_sub), indexing="ij"
        )
        base = ((iz * n1 + iy) * n1 + ix).reshape(-1)
        conn_local = np.stack(
            [
                base,
                base + 1,
                base + n1 + 1,
                base + n1,
                base + n1 * n1,
                base + n1 * n1 + 1,
                base + n1 * n1 + n1 + 1,
                base + n1 * n1 + n1,
            ],
            axis=1,
        )
        ctype = VTK_HEXAHEDRON
    conn = (conn_local[None, :, :] + (np.arange(E) * P)[:, None, None]).reshape(
        -1, conn_local.shape[1]
    )
    n_cells_out = conn.shape[0]
    offsets = np.arange(1, n_cells_out + 1) * conn.shape[1]
    types = np.full(n_cells_out, ctype)

    def arr2txt(a, fmt="%.12g"):
        return "\n".join(" ".join(fmt % v for v in row) for row in np.atleast_2d(a))

    lines = []
    w = lines.append
    w('<?xml version="1.0"?>')
    w('<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">')
    w("<UnstructuredGrid>")
    w(f'<Piece NumberOfPoints="{n_points}" NumberOfCells="{n_cells_out}">')
    w("<Points>")
    w('<DataArray type="Float64" NumberOfComponents="3" format="ascii">')
    w(arr2txt(pts3))
    w("</DataArray></Points>")
    w("<Cells>")
    w('<DataArray type="Int32" Name="connectivity" format="ascii">')
    w(arr2txt(conn, "%d"))
    w("</DataArray>")
    w('<DataArray type="Int32" Name="offsets" format="ascii">')
    w(" ".join(str(v) for v in offsets))
    w("</DataArray>")
    w('<DataArray type="UInt8" Name="types" format="ascii">')
    w(" ".join(str(v) for v in types))
    w("</DataArray></Cells>")
    w("<PointData>")
    for name, (space, values, ncomp) in fields.items():
        vals = _field_at_patch_points(space, values, n_sub)
        if ncomp == 1:
            data = vals.reshape(-1, 1)
            w(
                f'<DataArray type="Float64" Name="{sx.escape(name)}" '
                'format="ascii">'
            )
        else:
            data = np.zeros((n_points, 3))
            data[:, :ncomp] = np.transpose(vals, (0, 2, 1)).reshape(-1, ncomp)
            w(
                f'<DataArray type="Float64" Name="{sx.escape(name)}" '
                'NumberOfComponents="3" format="ascii">'
            )
        w(arr2txt(data))
        w("</DataArray>")
    w("</PointData>")
    w("</Piece></UnstructuredGrid></VTKFile>")
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    Path(filename).write_text("\n".join(lines))


class TimeSeriesWriter:
    """vtu series + .pvd collection with at_tick cadence
    (flow_base_algorithm.cc:222-279)."""

    def __init__(self, base_name: str) -> None:
        self.base_name = base_name
        self.records: list[tuple[float, str]] = []
        self.counter = 0

    def write(self, mesh, fields, time: float, n_subdivisions: int = 1) -> None:
        fname = f"{self.base_name}-{self.counter:04d}.vtu"
        write_vtu(fname, mesh, fields, n_subdivisions)
        self.records.append((time, os.path.basename(fname)))
        self.counter += 1
        pvd = [
            '<?xml version="1.0"?>',
            '<VTKFile type="Collection" version="0.1">',
            "<Collection>",
        ]
        for t, f in self.records:
            pvd.append(f'<DataSet timestep="{t}" group="" part="0" file="{f}"/>')
        pvd += ["</Collection>", "</VTKFile>"]
        Path(f"{self.base_name}.pvd").write_text("\n".join(pvd))
