"""Parameter tree + prm parser tests (reference: source/parameters.cc)."""

import pytest

from adaflo_tpu.parameters import (
    FlowParameters,
    Linearization,
    PhysicalType,
    Scheme,
    VelocityPreconditioner,
)
from adaflo_tpu.prm import PrmError

POISEUILLE_PRM = """
# comment line
subsection Time stepping
  set end time   = 20
  set step size  = 0.5
end
subsection Navier-Stokes
  set physical type      = incompressible
  set dimension          = 2
  set global refinements = 4
  set velocity degree    = 2
  set viscosity          = 0.5
  subsection Solver
    set linearization scheme         = coupled implicit Newton
    set NL max iterations            = 10
    set NL tolerance                 = 1.e-12
    set lin max iterations           = 50
    set lin tolerance                = 1.e-5
    set lin relative tolerance       = 1
    set lin velocity preconditioner  = amg
    set lin its before inner solvers = 50
  end
end
subsection Output options
  set output verbosity = 2
  set output vtk files = 0
end
"""


def test_defaults():
    p = FlowParameters.from_string("")
    assert p.dimension == 2
    assert p.velocity_degree == 2
    assert p.viscosity == 1.0
    assert p.density == 1.0
    assert p.beta_convective_term_momentum_balance == 0.5
    assert p.linearization == Linearization.coupled_implicit_newton
    assert p.time_step_scheme == Scheme.bdf_2
    assert p.max_lin_iteration == 500
    assert p.tol_lin_iteration == 1e-3
    assert p.surface_tension == 1.0
    assert p.concentration_subdivisions == 2
    assert p.n_reinit_steps == 2


def test_poiseuille_config():
    p = FlowParameters.from_string(POISEUILLE_PRM)
    assert p.end_time == 20
    assert p.time_step_size_start == 0.5
    assert p.viscosity == 0.5
    assert p.global_refinements == 4
    assert p.tol_nl_iteration == 1e-12
    assert p.max_lin_iteration == 50
    assert p.precondition_velocity == VelocityPreconditioner.u_amg
    assert p.physical_type == PhysicalType.incompressible
    # min (0.1) < start (0.5): adaptive limits stay (parameters.cc:595-597)
    assert p.time_step_size_min == 0.1 and p.time_step_size_max == 1.0


def test_large_start_step_disables_adaptivity():
    p = FlowParameters.from_string(
        "subsection Time stepping\n set step size = 0.01\n"
        " set min step size = 0.05\n set max step size = 2\nend"
    )
    # min > start: clamp both to the start step (parameters.cc:595-597)
    assert p.time_step_size_min == 0.01 and p.time_step_size_max == 0.01


def test_stokes_zeroes_density():
    p = FlowParameters.from_string(
        "subsection Navier-Stokes\n set physical type = stokes\nend"
    )
    assert p.physical_type == PhysicalType.stokes
    assert p.density == 0.0


def test_two_phase_density_override():
    p = FlowParameters.from_string(
        "subsection Two phase\n set density = 100\n set density difference = -99\nend"
    )
    assert p.density == 100.0
    assert p.density_diff == -99.0
    assert p.use_variable_coefficients


def test_damping_sign_flip():
    p = FlowParameters.from_string(
        "subsection Navier-Stokes\n set damping = 2.5\nend"
    )
    assert p.damping == -2.5


def test_unknown_entry_rejected():
    with pytest.raises(PrmError):
        FlowParameters.from_string(
            "subsection Navier-Stokes\n set nonsense = 1\nend"
        )


def test_invalid_selection_rejected():
    with pytest.raises(PrmError):
        FlowParameters.from_string(
            "subsection Navier-Stokes\n set physical type = compressible\nend"
        )


def test_velocity_degree_one_rejected():
    with pytest.raises(PrmError):
        FlowParameters.from_string(
            "subsection Navier-Stokes\n set velocity degree = 1\nend"
        )


def test_anisotropic_refinement_rejected():
    """Isotropic-only mesh adaptation: the flag must fail loudly at parse
    time rather than silently run an isotropic mesh (the reference's only
    consumer is the matrix-based LS damping, level_set_okz_matrix.cc:646)."""
    with pytest.raises(PrmError):
        FlowParameters.from_string(
            "subsection Navier-Stokes\n set anisotropic refinement = 1\nend"
        )


def test_simplex_mesh_flag_requires_simplex_mesh():
    """'simplex mesh = 1' with a tensor-product mesh must raise (the flag
    selects simplex FE construction in the reference, navier_stokes.cc:92)."""
    import numpy as np

    from adaflo_tpu.mesh.structured import StructuredMesh
    from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

    par = FlowParameters.from_string(
        "subsection Navier-Stokes\n set dimension = 2\n"
        " set simplex mesh = 1\n set velocity degree = 2\nend"
    )
    mesh = StructuredMesh((2, 2), (0.0, 0.0), (1.0, 1.0))
    with pytest.raises(NotImplementedError):
        NavierStokes(par, mesh)


def test_approximate_projections_raises_like_reference():
    """The reference hard-fails in compute_normal when approximate
    projections are requested (level_set_okz_compute_normal.cc:227)."""
    par = FlowParameters.from_string(
        "subsection Navier-Stokes\n set dimension = 2\nend\n"
        "subsection Two phase\n set approximate projections = 1\nend"
    )
    assert par.approximate_projections is True
