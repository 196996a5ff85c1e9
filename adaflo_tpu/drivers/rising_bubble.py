"""2D/3D rising bubble benchmark driver.

Mirrors the reference driver /root/reference/tests/rising_bubble.cc: a bubble
of radius 0.25 centered at (0.5, 0.5) in the [0,1] x [0,2] channel, no-slip
top/bottom, symmetry left/right, pressure fixed; solver selected from the
"Problem-specific / two-phase method" parameter (level set okz | level set
okz matrix | phase field); bubble statistics after every step.
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.prm import ParameterHandler


class TwoPhaseParameters(FlowParameters):
    """FlowParameters + the driver's 'Problem-specific' subsection
    (rising_bubble.cc:34-55)."""

    solver_method: str = "level set okz"

    @classmethod
    def from_file(cls, parameter_file: str) -> "TwoPhaseParameters":
        prm = ParameterHandler()
        cls.declare_parameters(prm)
        prm.enter_subsection("Problem-specific")
        prm.declare_entry(
            "two-phase method",
            "level set okz",
            "level set okz|level set okz matrix|phase field|"
            "front tracking|mixed level set|sharp level set|level set",
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


class MicroFluidicProblem:
    def __init__(self, parameters: TwoPhaseParameters, out=None) -> None:
        self.parameters = parameters
        self.out = out
        dim = parameters.dimension
        subdivisions = (5,) * (dim - 1) + (10,)
        top_right = (1.0,) * (dim - 1) + (2.0,)
        if parameters.adaptive_refinements > 0:
            # AMR configuration (rising_bubble_ls_adap.prm): forest-of-
            # octrees mesh, the p4est counterpart
            from adaflo_tpu.mesh.forest import ForestMesh

            self.mesh = ForestMesh(subdivisions, (0.0,) * dim, top_right)
            self.mesh.set_boundary_id(0, 0, 2)
            self.mesh.set_boundary_id(0, 1, 2)
        else:
            self.mesh = StructuredMesh.subdivided_hyper_rectangle(
                subdivisions, (0.0,) * dim, top_right
            )
            # symmetry on the x = 0 / x = 1 faces (rising_bubble.cc:136-144)
            self.mesh.set_boundary_id(
                lambda c: (np.abs(c[:, 0] - 1) < 1e-14) | (np.abs(c[:, 0]) < 1e-14),
                2,
            )

        method = parameters.solver_method
        if method == "level set okz":
            from adaflo_tpu.twophase.level_set_okz import LevelSetOKZSolver

            self.solver = LevelSetOKZSolver(parameters, self.mesh, out=out)
        elif method == "level set okz matrix":
            from adaflo_tpu.twophase.level_set_okz_matrix import (
                LevelSetOKZMatrixSolver,
            )

            self.solver = LevelSetOKZMatrixSolver(
                parameters, self.mesh, out=out
            )
        elif method == "phase field":
            from adaflo_tpu.twophase.phase_field import PhaseFieldSolver

            self.solver = PhaseFieldSolver(parameters, self.mesh, out=out)
        else:
            raise ValueError(f"Unknown solver '{method}' selected")

    def run(self) -> None:
        from adaflo_tpu.functions import ZeroFunction

        solver = self.solver
        par = self.parameters
        solver.set_no_slip_boundary(0)
        solver.fix_pressure_constant(0)
        solver.set_symmetry_boundary(2)
        solver.setup_problem(ZeroFunction(par.dimension), initial_distance)
        solver.output_solution(par.output_filename)

        solution_data = [solver.compute_bubble_statistics(0)]
        while not solver.get_time_stepping().at_end():
            solver.advance_time_step()
            solver.output_solution(par.output_filename)
            solver.refine_grid()
            solution_data.append(solver.compute_bubble_statistics())
        self.solution_data = solution_data


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "rising_bubble.prm"
    parameters = TwoPhaseParameters.from_file(paramfile)
    problem = MicroFluidicProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
