"""Two-phase level set on unstructured meshes: the micro_particle (curved
quads, Gmsh 2.2) and simplex_bubble (triangles, Gmsh 4.1) configurations."""

import io
import os
from pathlib import Path

import numpy as np
import pytest

MICRO_MSH = Path("/root/reference/applications/microfluidic_2D.msh")
BUBBLE_MSH = Path("/root/reference/tests/simplex_bubble_2.msh")
SLOW = os.environ.get("ADAFLO_RUN_SLOW") is None


@pytest.mark.skipif(not MICRO_MSH.exists(), reason="reference mesh unavailable")
def test_micro_particle_geometry():
    """Gmsh 2.2 read + boundary/manifold partition of the microfluidic
    channel (micro_particle.cc:236-316)."""
    from adaflo_tpu.applications.micro_particle import create_triangulation

    tria = create_triangulation(str(MICRO_MSH.parent))
    assert tria.n_cells > 500
    assert tria.all_boundary_ids() >= {0, 1, 2, 3, 4}
    # all four arc manifolds attached
    assert set(tria.manifolds) == {12, 23, 34, 41}
    # curved boundary edges exist on each arc
    for mid in (12, 23, 34, 41):
        curved = [
            k for k in tria.boundary_edge_keys
            if tria._edge_manifold_id.get(k) == mid
        ]
        assert curved, mid


@pytest.mark.skipif(not BUBBLE_MSH.exists(), reason="reference mesh unavailable")
def test_simplex_bubble_header_parity():
    """Setup header matches the reference golden
    (tests/simplex_bubble.output:1-5): 1792 cells, 8347 = 7394 + 953 NS
    dofs, 953 level-set dofs, mesh sizes 0.0777163 / 0.0263957."""
    from adaflo_tpu.drivers.simplex_bubble import (
        SimplexBubbleProblem,
        TwoPhaseParameters,
        initial_distance,
    )
    from adaflo_tpu.functions import ZeroFunction

    par = TwoPhaseParameters.from_file(
        str(Path("/root/reference/tests/simplex_bubble.prm"))
    )
    par.global_refinements = 2
    par.end_time = 0.0
    buf = io.StringIO()
    prob = SimplexBubbleProblem(par, out=buf, mesh_dir=str(BUBBLE_MSH.parent))
    s = prob.solver
    s.set_no_slip_boundary(0)
    s.fix_pressure_constant(0)
    s.set_symmetry_boundary(2)
    s.setup_problem(ZeroFunction(2), initial_distance)
    text = buf.getvalue()
    for anchor in (
        "Number of active cells: 1792.",
        "Number of Navier-Stokes degrees of freedom: 8347 (7394 + 953).",
        "Number of level set degrees of freedom: 953.",
        "Mesh size (largest/smallest element length at finest level): "
        "0.0777163 / 0.0263957",
    ):
        assert anchor in text, f"missing: {anchor}\n{text}"


@pytest.mark.skipif(
    SLOW or not BUBBLE_MSH.exists(), reason="slow tier (ADAFLO_RUN_SLOW)"
)
def test_simplex_bubble_steps():
    """Three time steps on the reference's mesh: NS residual magnitudes in
    the golden's range and the level set stays in [-1, 1]."""
    from adaflo_tpu.drivers.simplex_bubble import (
        SimplexBubbleProblem,
        TwoPhaseParameters,
    )

    par = TwoPhaseParameters.from_file(
        str(Path("/root/reference/tests/simplex_bubble.prm"))
    )
    par.global_refinements = 2
    par.end_time = 0.06
    buf = io.StringIO()
    prob = SimplexBubbleProblem(par, out=buf, mesh_dir=str(BUBBLE_MSH.parent))
    prob.run()
    text = buf.getvalue()
    assert text.count("conv.]") == 3, text
    c = np.asarray(prob.solver.solution[0])
    assert c.min() > -1.3 and c.max() < 1.3
