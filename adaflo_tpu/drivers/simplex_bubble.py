"""Rising bubble on a simplex (triangle) mesh.

Mirrors the reference driver /root/reference/tests/simplex_bubble.cc: the
[0,1] x [0,2] channel as an unstructured triangle mesh from
``simplex_bubble_<n>.msh`` (n = 'global refinements', then reset — the
reference's fix_n_refinements idiom), symmetry on x = 0/1 (id 2), no-slip
elsewhere, pressure fixed; conservative level set with
FE_SimplexP(concentration subdivisions); no bubble statistics in the loop
(matching the reference's plain advance + output loop).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from adaflo_tpu.mesh.unstructured import TriMesh, read_msh
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.prm import ParameterHandler


class TwoPhaseParameters(FlowParameters):
    solver_method: str = "level set okz"

    @classmethod
    def from_file(cls, parameter_file: str) -> "TwoPhaseParameters":
        prm = ParameterHandler()
        cls.declare_parameters(prm)
        prm.enter_subsection("Problem-specific")
        prm.declare_entry(
            "two-phase method",
            "level set okz",
            "level set okz|level set okz matrix|phase field",
        )
        prm.leave_subsection()
        if parameter_file.endswith(".json"):
            prm.parse_input_from_json(parameter_file)
        else:
            prm.parse_input(parameter_file)
        self = cls()
        self._parse(prm)
        prm.enter_subsection("Problem-specific")
        self.solver_method = prm.get("two-phase method")
        prm.leave_subsection()
        return self


def initial_distance(x, t=0.0):
    radius = 0.25
    center = np.full(x.shape[1], 0.5)
    return np.linalg.norm(x - center[None, :], axis=1) - radius


def create_triangulation(n_refinements: int, mesh_dir: str | None = None) -> TriMesh:
    mesh_file = None
    for base in filter(None, (mesh_dir, os.environ.get("ADAFLO_MESH_DIR"), ".")):
        cand = os.path.join(base, f"simplex_bubble_{n_refinements}.msh")
        if os.path.exists(cand):
            mesh_file = cand
            break
    if mesh_file is not None:
        tria = read_msh(mesh_file)
    else:
        n = 2**n_refinements
        tria = TriMesh.subdivided_hyper_rectangle_with_simplices(
            (5 * n, 10 * n), (0.0, 0.0), (1.0, 2.0)
        )
    # symmetry on the left/right faces (simplex_bubble.cc:181-187)
    tria.set_boundary_id_by_center(
        lambda c: abs(c[0] - 1) < 1e-12 or abs(c[0]) < 1e-12, 2
    )
    return tria


class SimplexBubbleProblem:
    def __init__(
        self,
        parameters: TwoPhaseParameters,
        out=None,
        mesh_dir: str | None = None,
    ) -> None:
        assert parameters.dimension == 2, "2D simplex bubble"
        self.parameters = parameters
        self.out = out
        n_ref = parameters.global_refinements
        parameters.global_refinements = 0
        self.mesh = create_triangulation(n_ref, mesh_dir)
        if parameters.solver_method != "level set okz":
            raise ValueError(f"Unknown solver '{parameters.solver_method}'")
        from adaflo_tpu.twophase.level_set_okz import LevelSetOKZSolver

        self.solver = LevelSetOKZSolver(parameters, self.mesh, out=out)

    def run(self) -> None:
        from adaflo_tpu.functions import ZeroFunction

        solver = self.solver
        par = self.parameters
        solver.set_no_slip_boundary(0)
        solver.fix_pressure_constant(0)
        solver.set_symmetry_boundary(2)
        solver.setup_problem(ZeroFunction(2), initial_distance)
        solver.output_solution(par.output_filename, 2)

        while not solver.get_time_stepping().at_end():
            solver.advance_time_step()
            solver.output_solution(par.output_filename, 2)


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "rising_bubble.prm"
    parameters = TwoPhaseParameters.from_file(paramfile)
    problem = SimplexBubbleProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
