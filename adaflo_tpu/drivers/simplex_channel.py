"""2D channel flow on a simplex (triangle) mesh.

Mirrors the reference driver /root/reference/tests/simplex_channel.cc:
uniform inflow u = (1, 0) on boundary 0, open outflow (1), no-slip walls
(2, 3); P2/P1 elements on an unstructured triangle mesh. The mesh comes from
a Gmsh .msh file named ``simplex_channel_<n>.msh`` with n =
'global refinements' (which selects the file and is then reset, like the
reference's fix_n_refinements, simplex_channel.cc:132-141); without a mesh
file, the structured-simplices generator provides an equivalent mesh
(GridGenerator::subdivided_hyper_rectangle_with_simplices counterpart).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from adaflo_tpu.mesh.unstructured import TriMesh, read_msh
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes


def inflow_velocity(dim: int):
    def fn(x, t=0.0):
        vals = np.zeros((dim, len(x)))
        vals[0] = 1.0
        return vals

    return fn


def create_triangulation(n_refinements: int, mesh_dir: str | None = None) -> TriMesh:
    n = 2**n_refinements
    mesh_file = None
    for base in filter(None, (mesh_dir, os.environ.get("ADAFLO_MESH_DIR"), ".")):
        cand = os.path.join(base, f"simplex_channel_{n_refinements}.msh")
        if os.path.exists(cand):
            mesh_file = cand
            break
    if mesh_file is not None:
        tria = read_msh(mesh_file)
    else:
        tria = TriMesh.subdivided_hyper_rectangle_with_simplices(
            (5 * n, 1 * n), (0.0, 0.0), (5.0, 1.0)
        )
    tria.set_boundary_id_by_center(lambda c: abs(c[0] - 0.0) < 1e-8, 0)
    tria.set_boundary_id_by_center(lambda c: abs(c[0] - 5.0) < 1e-8, 1)
    tria.set_boundary_id_by_center(lambda c: abs(c[1] - 0.0) < 1e-8, 2)
    tria.set_boundary_id_by_center(lambda c: abs(c[1] - 1.0) < 1e-8, 3)
    return tria


class SimplexChannel:
    def __init__(
        self, parameters: FlowParameters, out=None, mesh_dir: str | None = None
    ) -> None:
        assert parameters.dimension == 2, "2D simplex channel"
        self.parameters = parameters
        self.out = out
        # 'global refinements' selects the mesh resolution, then resets
        # (simplex_channel.cc fix_n_refinements)
        n_ref = parameters.global_refinements
        parameters.global_refinements = 0
        self.mesh = create_triangulation(n_ref, mesh_dir)
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
        for i in range(2, 2 * par.dimension):
            ns.set_no_slip_boundary(i)
        ns.set_velocity_dirichlet_boundary(0, inflow_velocity(par.dimension))
        ns.set_open_boundary(1, lambda x, t: np.zeros(len(x)))

        ns.setup_problem(inflow_velocity(par.dimension))
        ns.print_n_dofs()
        ns.output_solution(par.output_filename)

        while not ns.time_stepping.at_end():
            ns.advance_time_step()
            if ns.time_stepping.at_tick(par.output_frequency):
                ns.output_solution(par.output_filename)


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "simplex_channel.prm"
    parameters = FlowParameters.from_file(paramfile)
    problem = SimplexChannel(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
