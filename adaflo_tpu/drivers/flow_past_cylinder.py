"""2D flow past a circular cylinder (Schaefer-Turek benchmark geometry).

Mirrors the reference driver /root/reference/tests/flow_past_cylinder.cc:
the mesh merges a refined hyper_shell around the cylinder (with deal.II's
exact vertex adjustments, cc:181-262) with a structured right block; the
cylinder boundary carries a polar manifold so all refinement and the Q3 cell
mapping follow the true circle. Boundary ids: 1 inflow (Dirichlet parabolic
profile), 2 outflow (open, zero pressure), 0 walls + cylinder (no-slip).

Mesh parity with the reference is exact: 2176 cells / 48960 dofs at
2 global refinements, 'Approximate size last cell' 0.0253144
(flow_past_cylinder.output:2-4).
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.mesh.unstructured import PolarManifold, QuadMesh
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes

CENTER = np.array([0.5, 0.2])


def inflow_velocity(dim: int):
    """Schaefer & Turek parabolic inflow (flow_past_cylinder.cc:75-90)."""

    def fn(x, t=0.0):
        Um = 1.5 if dim == 2 else 2.25
        H = 0.41
        coefficient = 4.0 ** (dim - 1) * Um / H ** (2 * dim - 2)
        vals = np.zeros((dim, len(x)))
        vals[0] = coefficient * x[:, 1] * (H - x[:, 1])
        if dim == 3:
            vals[0] *= x[:, 2] * (H - x[:, 2])
        return vals

    return fn


def create_triangulation(compute_in_2d: bool = True) -> QuadMesh:
    """The reference's create_triangulation (flow_past_cylinder.cc:181-280)."""
    middle = QuadMesh.hyper_shell(CENTER, 0.05, 0.2, 4)
    # reset_all_manifolds + polar manifold on the inner-circle faces
    middle.set_manifold(0, PolarManifold(CENTER))
    middle.set_manifold_id_by_center(
        lambda c: np.linalg.norm(c - CENTER) <= 0.05, 0
    )
    middle.refine_global(1)
    # move the vertices to create a slightly asymmetric cube with a hole
    # (exact coordinate list from the reference, cc:205-240)
    moves_exact = [
        ((0.7, 0.2), (0.7, 0.205)),
        ((0.6, 0.3), (0.7, 0.41)),
        ((0.6, 0.1), (0.7, 0.0)),
        ((0.5, 0.4), (0.5, 0.41)),
        ((0.5, 0.0), (0.5, 0.0)),
        ((0.4, 0.3), (0.3, 0.41)),
        ((0.4, 0.1), (0.3, 0.0)),
        ((0.3, 0.2), (0.3, 0.205)),
    ]
    middle.moved_vertices([(o, n, 1e-10) for o, n in moves_exact])
    moves_mid_ring = [
        ((0.56379, 0.13621), (0.59, 0.11)),
        ((0.56379, 0.26379), (0.59, 0.29)),
        ((0.43621, 0.13621), (0.41, 0.11)),
        ((0.43621, 0.26379), (0.41, 0.29)),
    ]
    middle.moved_vertices([(o, n, 1e-4) for o, n in moves_mid_ring])
    middle.refine_global(1)

    right = QuadMesh.subdivided_hyper_rectangle((18, 4), (0.7, 0.0), (2.5, 0.41))
    parts = [middle, right]
    if not compute_in_2d:
        left = QuadMesh.subdivided_hyper_rectangle((3, 4), (0.0, 0.0), (0.3, 0.41))
        parts = [left, middle, right]
    tria = QuadMesh.merge(parts)

    inflow_x = 0.3 if compute_in_2d else 0.0
    tria.set_boundary_id_by_center(lambda c: abs(c[0] - inflow_x) < 1e-12, 1)
    tria.set_boundary_id_by_center(lambda c: abs(c[0] - 2.5) < 1e-12, 2)
    tria.set_manifold(10, PolarManifold(CENTER))
    tria.set_manifold_id_by_center(
        lambda c: np.linalg.norm(c - CENTER) <= 0.05, 10
    )
    return tria


class FlowPastCylinder:
    def __init__(self, parameters: FlowParameters, out=None) -> None:
        assert parameters.dimension == 2, (
            "the TPU build runs the 2D benchmark (3D extrusion pending)"
        )
        self.parameters = parameters
        self.out = out
        self.mesh = create_triangulation()
        self.navier_stokes = NavierStokes(parameters, self.mesh, out=out)

    def _p(self, *a, **k):
        print(*a, **k, file=self.out or sys.stdout)

    def run(self) -> None:
        ns = self.navier_stokes
        par = self.parameters
        self._p(
            f"Running a {par.dimension}D flow past a cylinder using "
            f"{ns.time_stepping.name()}, Q{par.velocity_degree}"
            f"/Q{par.pressure_degree} elements"
        )
        ns.set_no_slip_boundary(0)
        ns.set_velocity_dirichlet_boundary(1, inflow_velocity(par.dimension))
        ns.set_open_boundary(2, lambda x, t: np.zeros(len(x)))

        ns.setup_problem(inflow_velocity(par.dimension))
        ns.print_n_dofs()
        ns.output_solution(par.output_filename)

        while not ns.time_stepping.at_end():
            ns.advance_time_step()
            if ns.time_stepping.at_tick(par.output_frequency):
                ns.output_solution(par.output_filename)


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "flow_past_cylinder.prm"
    parameters = FlowParameters.from_file(paramfile)
    problem = FlowPastCylinder(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
