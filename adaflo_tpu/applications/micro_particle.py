"""Microfluidic particle transport (two-phase level set on an unstructured
Gmsh geometry).

Mirrors the reference application /root/reference/applications/
micro_particle.cc (2D path): the microfluidic channel geometry is read from
``microfluidic_2D.msh`` (Gmsh 2.2), the four rounded interior corners carry
polar manifolds so refinement and the Q3 cell mapping follow the arcs,
boundary ids partition the channel mouths (1, 2: driven inflows, 3: driven
outflow, 4: open with normal flux and pressure 50), everything else no-slip.
A bubble of radius 0.25 at (0.5, 0.5) is transported by the flow; bubble
statistics print per step like the reference's solution_data records.

The reference's headline configuration extrudes this geometry to 3D with
adaptive refinement; the 2D configuration here exercises the identical
two-phase machinery on the mapped (curved unstructured) path.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from adaflo_tpu.mesh.unstructured import PolarManifold, QuadMesh, read_msh
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
    return np.linalg.norm(x - 0.5, axis=1) - 0.25


def boundary_velocity(boundary_ind: int, dim: int = 2):
    """BoundaryValuesVelocity (micro_particle.cc:92-157): fixed directions
    per mouth, ramped in over t < 0.01; z-component 0 in 3D."""
    base = {1: (0.5, 0.0), 2: (0.0, 1.0), 3: (-10.0, 0.0)}[boundary_ind]

    def fn(x, t=0.0):
        vals = np.zeros((dim, len(x)))
        vals[0] = base[0]
        vals[1] = base[1]
        if t <= 0:
            vals[:] = 0.0
        elif t < 0.01:
            vals *= np.sin(np.pi * t / 0.02)
        return vals

    return fn


ARC_CENTERS = {
    12: (-1.0, 0.5),
    23: (2.0, 0.5),
    34: (2.0, 4.5),
    41: (-1.0, 4.5),
}


def create_triangulation(mesh_dir: str | None = None) -> QuadMesh:
    mesh_file = None
    for base in filter(
        None, (mesh_dir, os.environ.get("ADAFLO_MESH_DIR"), ".")
    ):
        cand = os.path.join(base, "microfluidic_2D.msh")
        if os.path.exists(cand):
            mesh_file = cand
            break
    if mesh_file is None:
        raise FileNotFoundError(
            "microfluidic_2D.msh not found (set ADAFLO_MESH_DIR)"
        )
    tria = read_msh(mesh_file)
    # boundary ids by plane (micro_particle.cc:236-259)
    tria.set_boundary_id_by_center(lambda c: abs(c[0] + 2) < 1e-12, 1)
    tria.set_boundary_id_by_center(lambda c: abs(c[0] - 3) < 1e-12, 3)
    tria.set_boundary_id_by_center(lambda c: abs(c[1] + 0.5) < 1e-12, 2)
    tria.set_boundary_id_by_center(lambda c: abs(c[1] - 8) < 1e-12, 4)
    # polar manifolds on the rounded corners (cc:262-316); the reference
    # keeps boundary id 0 there (no-slip)
    for mid, center in ARC_CENTERS.items():
        cx, cy = center
        tria.set_manifold(mid, PolarManifold(np.array(center)))
        tria.set_manifold_id_by_center(
            lambda c, cx=cx, cy=cy: (
                cy - 0.5 <= c[1] <= cy + 0.5 and cx <= c[0] <= cx + 1
                if cx < 0
                else cy - 0.5 <= c[1] <= cy + 0.5 and cx - 1 <= c[0] <= cx
            ),
            mid,
        )
    return tria


class MicroFluidicProblem:
    def __init__(
        self,
        parameters: TwoPhaseParameters,
        out=None,
        mesh_dir: str | None = None,
    ) -> None:
        self.parameters = parameters
        self.out = out
        base = create_triangulation(mesh_dir)
        if parameters.dimension == 3:
            # GridGenerator::extrude_triangulation(tria_2d, 9, 1.)
            # (micro_particle.cc:326): 9 vertex levels = 8 cell slices over
            # height 1; the z-caps are no-slip (boundary id 0, cc:279-289)
            from adaflo_tpu.mesh.extruded import ExtrudedMesh

            self.mesh = ExtrudedMesh(base, 8, 1.0, z_boundary_id=0)
        else:
            self.mesh = base
        if parameters.solver_method != "level set okz":
            raise ValueError(f"Unknown solver '{parameters.solver_method}'")
        from adaflo_tpu.twophase.level_set_okz import LevelSetOKZSolver

        self.solver = LevelSetOKZSolver(parameters, self.mesh, out=out)

    def run(self) -> None:
        from adaflo_tpu.functions import ZeroFunction

        solver = self.solver
        par = self.parameters
        for bid in (1, 2, 3):
            solver.set_velocity_dirichlet_boundary(
                bid, boundary_velocity(bid, par.dimension)
            )
        solver.set_no_slip_boundary(0)
        solver.set_open_boundary_with_normal_flux(
            4, lambda x, t: np.full(len(x), 50.0)
        )
        solver.setup_problem(ZeroFunction(par.dimension), initial_distance)
        solver.output_solution(par.output_filename)

        self.solution_data = [solver.compute_bubble_statistics(0)]
        while not solver.get_time_stepping().at_end():
            solver.advance_time_step()
            solver.output_solution(par.output_filename)
            self.solution_data.append(solver.compute_bubble_statistics())


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "micro_particle.prm"
    parameters = TwoPhaseParameters.from_file(paramfile)
    problem = MicroFluidicProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
