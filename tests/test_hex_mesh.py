"""Extruded hex meshes + Hex3DSpace (flow_past_square_cylinder config)."""

import os
from pathlib import Path

import numpy as np
import pytest

from adaflo_tpu.fe.hex_space import Hex3DSpace
from adaflo_tpu.mesh.unstructured import HexMesh, QuadMesh

SLOW = os.environ.get("ADAFLO_RUN_SLOW") is None


def test_square_cylinder_mesh_counts():
    """396 2D cells (50x8 minus the 4 void cells) x 8 layers = 3168 hexes;
    dof counts as in our validated run (91230 = 87108 + 4122)."""
    from adaflo_tpu.drivers.flow_past_square_cylinder import create_triangulation

    tria = create_triangulation()
    assert tria.n_cells == 3168
    su = Hex3DSpace(tria, 2)
    sp = Hex3DSpace(tria, 1)
    assert 3 * su.n_dofs == 87108
    assert sp.n_dofs == 4122
    # boundary ids: inflow plane, outflow plane, walls + square cylinder
    assert tria.all_boundary_ids() == {0, 1, 2}
    # the hole's walls carry id 0
    hole = [
        k
        for k in tria.boundary_face_keys
        if 0.44 < tria.face_center(k)[0] < 0.56
        and 0.14 < tria.face_center(k)[1] < 0.26
    ]
    assert len(hole) > 0
    assert all(tria.boundary_id(k) == 0 for k in hole)


def test_hex_space_interpolation_exact():
    """Q2 on an extruded mesh reproduces a triquadratic exactly (entity
    numbering and per-cell geometry are consistent)."""
    import jax.numpy as jnp

    from adaflo_tpu.ops.forest_ops import evaluator_for

    quad = QuadMesh.subdivided_hyper_rectangle((3, 2), (0.0, 0.0), (1.5, 1.0))
    mesh = HexMesh.extrude(quad, 3, 0.8)
    sp = Hex3DSpace(mesh, 2)
    ev = evaluator_for(sp, 3)

    def f(p):
        return (
            p[..., 0] ** 2
            - 2 * p[..., 1] ** 2
            + 0.5 * p[..., 2] ** 2
            + p[..., 0] * p[..., 1]
            - p[..., 2]
        )

    u = jnp.asarray(f(sp.node_coords))
    vals = np.asarray(ev.values(u[sp.cell_dofs]))
    qc = ev.quad_coords(sp)
    assert np.abs(vals - f(qc)).max() < 1e-12
    # volume via jxw
    vol = float(np.asarray(ev.jxw_cells).sum())
    assert abs(vol - 1.5 * 1.0 * 0.8) < 1e-12


def test_hex_refine_global():
    quad = QuadMesh.subdivided_hyper_rectangle((2, 1), (0.0, 0.0), (1.0, 0.5))
    mesh = HexMesh.extrude(quad, 2, 0.5)
    mesh.set_boundary_id_by_center(lambda c: abs(c[0]) < 1e-12, 7)
    n_bf = len(mesh.boundary_faces_with_id(7))
    mesh.refine_global(1)
    assert mesh.n_cells == 16
    assert len(mesh.boundary_faces_with_id(7)) == 4 * n_bf


@pytest.mark.skipif(SLOW, reason="slow tier (ADAFLO_RUN_SLOW)")
def test_square_cylinder_short_golden():
    from adaflo_tpu.drivers.flow_past_square_cylinder import main
    from adaflo_tpu.testing import compare_with_golden, run_driver_capture

    here = Path(__file__).parent
    text = run_driver_capture(
        main, str(here / "prms" / "flow_past_square_cylinder_short.prm")
    )
    assert "converged." in text
    compare_with_golden(
        text, here / "golden" / "flow_past_square_cylinder_short.output"
    )
