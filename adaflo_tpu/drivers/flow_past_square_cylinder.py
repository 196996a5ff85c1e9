"""3D flow past a square cylinder (extruded channel with a square hole).

Mirrors the reference driver /root/reference/tests/flow_past_square_cylinder.cc:
2D 50x8 rectangle (0,0)-(2.5,0.4) with the cells around (0.5, 0.2) removed,
top boundary shifted to y = 0.41, extruded over 9 z-slices to 0.41; inflow
(id 1) is the fluctuating Schaefer-Turek profile, outflow (id 2) is an open
boundary with normal flux only, all other boundaries no-slip. All cells are
axis-aligned boxes, so the hex path with per-cell Cartesian geometry
applies.
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.mesh.unstructured import HexMesh, QuadMesh
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes


def inflow_velocity(dim: int, fluctuating: bool):
    """Schaefer & Turek inflow (flow_past_square_cylinder.cc:75-90)."""

    def fn(x, t=0.0):
        Um = 1.5 if dim == 2 else 2.25
        H = 0.41
        coefficient = 4.0 ** (dim - 1) * Um / H ** (2 * dim - 2)
        vals = np.zeros((dim, len(x)))
        vals[0] = coefficient * x[:, 1] * (H - x[:, 1])
        if dim == 3:
            vals[0] *= x[:, 2] * (H - x[:, 2])
        if fluctuating:
            vals[0] *= np.sin(t * np.pi / 8.0)
        return vals

    return fn


def create_triangulation() -> HexMesh:
    """flow_past_square_cylinder.cc:154-227 (3D path)."""
    tmp = QuadMesh.subdivided_hyper_rectangle((50, 8), (0.0, 0.0), (2.5, 0.4))
    tria2d = tmp.removed_cells(
        lambda c: 0.45 < c[0] < 0.55 and 0.15 < c[1] < 0.25
    )
    # shift the upper end of the domain from 0.40 to 0.41
    top = np.abs(tria2d.vertices[:, 1] - 0.4) < 1e-10
    tria2d.vertices[top, 1] = 0.41
    tria = HexMesh.extrude(tria2d, 9, 0.41)
    tria.set_boundary_id_by_center(lambda c: abs(c[0]) < 1e-12, 1)
    tria.set_boundary_id_by_center(lambda c: abs(c[0] - 2.5) < 1e-12, 2)
    return tria


class FlowPastSquareCylinder:
    def __init__(self, parameters: FlowParameters, out=None) -> None:
        assert parameters.dimension == 3, "the prm configuration is 3D"
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
            f"Running a {par.dimension}D flow past a square cylinder using "
            f"{ns.time_stepping.name()}, Q{par.velocity_degree}"
            f"/Q{par.pressure_degree} elements"
        )
        ns.set_no_slip_boundary(0)
        ns.set_velocity_dirichlet_boundary(
            1, inflow_velocity(par.dimension, True)
        )
        ns.set_open_boundary_with_normal_flux(2, lambda x, t: np.zeros(len(x)))

        ns.setup_problem(inflow_velocity(par.dimension, True))
        ns.print_n_dofs()
        ns.output_solution(par.output_filename)

        while not ns.time_stepping.at_end():
            ns.advance_time_step()
            if ns.time_stepping.at_tick(par.output_frequency):
                ns.output_solution(par.output_filename)


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "flow_past_square_cylinder.prm"
    parameters = FlowParameters.from_file(paramfile)
    problem = FlowPastSquareCylinder(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
