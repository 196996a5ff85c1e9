"""Two-phase channel flow with moving contact lines (Cahn-Hilliard).

Mirrors /root/reference/tests/phasefield_poiseuille.cc: a (0,6) x (-1,1)
channel, no-slip walls with a prescribed contact angle, open boundaries with
normal flux at both ends pinning the inflow fluid type, interface initially
the vertical plane x = 2.5 (c = -tanh((2.5 - x)/eps)). Reported per step:
interface position on the centerline and at both walls with contact angles,
contact-line velocity, concentration range, and the standard two-phase
statistics block.
"""

from __future__ import annotations

import sys

import numpy as np

from adaflo_tpu.drivers.rising_bubble import TwoPhaseParameters
from adaflo_tpu.fe.basis import equidistant_points
from adaflo_tpu.functions import ZeroFunction
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.tensor import CellEvaluator

CHANNEL_WIDTH = 1.0
LENGTH = 6.0


def initial_distance(x, t=0.0):
    """Signed distance to the initial interface plane x = 2.5
    (InitialValuesLS, phasefield_poiseuille.cc:36-52)."""
    return -x[:, 0] + 2.5


def _fmt(x: float, prec: int) -> str:
    s = f"{x:.{prec}g}"
    if "e" in s:
        mant, ex = s.split("e")
        return f"{mant}e{int(ex):+03d}"
    return s


class ChannelProblem:
    def __init__(self, parameters: TwoPhaseParameters, out=None) -> None:
        from adaflo_tpu.twophase.phase_field import PhaseFieldSolver

        self.parameters = parameters
        self.out = out
        assert parameters.dimension == 2
        nx = int(round(LENGTH / (2 * CHANNEL_WIDTH)))
        self.mesh = StructuredMesh(
            (nx, 1), (0.0, -CHANNEL_WIDTH), (LENGTH, 2 * CHANNEL_WIDTH)
        )
        self.mesh.set_boundary_id(
            lambda c: np.abs(c[:, 0] - LENGTH) < 1e-13, 1
        )
        self.mesh.set_boundary_id(lambda c: np.abs(c[:, 0]) < 1e-13, 2)
        self.solver = PhaseFieldSolver(parameters, self.mesh, out=out)
        self.old_contact_position = 0.0
        self.contact_velocity = 0.0
        self.solution_data = []

    def _p(self, *a, **k):
        print(*a, **k, file=self.out or sys.stdout)

    # -- diagnostics (phasefield_poiseuille.cc:206-446) ---------------------
    def _face_line_crossing(self, c_vals, xs):
        """Zero crossing between the two endpoint values of a horizontal
        face row; returns 0.0 when there is none."""
        c0, c1 = c_vals[:-1], c_vals[1:]
        prod = c0 * c1
        hit = np.flatnonzero(prod <= 0)
        if len(hit) == 0:
            return 0.0
        i = hit[0]
        return float(
            -c0[i] * (xs[i + 1] - xs[i]) / (c1[i] - c0[i]) + xs[i]
        )

    def _row_values(self, y_target):
        """Concentration values along the horizontal node row nearest
        y_target, restricted to FE nodes (trapezoid endpoints like the
        reference's QTrapezoid face rule)."""
        sp = self.solver.ls_space
        c = np.asarray(self.solver.solution[0])[: sp.n_dofs]
        coords = sp.node_coords
        row = np.abs(coords[:, 1] - y_target) < 1e-10
        xs = coords[row, 0]
        order = np.argsort(xs)
        return c[row][order], xs[order]

    def output_results(self) -> None:
        solver = self.solver
        sp = solver.ls_space
        deg = sp.degree
        h = self.mesh.h

        # concentration range over QIterated(QTrapezoid, deg+2) points
        pts = equidistant_points(deg + 3)
        ev = CellEvaluator(2, sp.basis, (pts, np.zeros_like(pts)), h)
        import jax.numpy as jnp

        cvals = np.asarray(
            ev.values(
                jnp.asarray(np.asarray(solver.solution[0])[: sp.n_dofs][sp.cell_dofs])
            )
        )
        cmin, cmax = float(cvals.min()), float(cvals.max())

        # centerline + wall crossings (node rows = trapezoid face points)
        c_mid, x_mid = self._row_values(0.0)
        pos_x = self._face_line_crossing(c_mid, x_mid)
        eps_shift = 1e-22 * CHANNEL_WIDTH
        c_lo, x_lo = self._row_values(-CHANNEL_WIDTH)
        pos_lower_1 = self._face_line_crossing(c_lo + eps_shift, x_lo)
        # one cell-row above the wall (the reference's opposite face)
        c_lo2, x_lo2 = self._row_values(-CHANNEL_WIDTH + h[1])
        pos_lower_2 = self._face_line_crossing(c_lo2 + eps_shift, x_lo2)
        h_lower = h[1]
        c_up, x_up = self._row_values(CHANNEL_WIDTH)
        pos_upper_1 = self._face_line_crossing(c_up + eps_shift, x_up)
        c_up2, x_up2 = self._row_values(CHANNEL_WIDTH - h[1])
        pos_upper_2 = self._face_line_crossing(c_up2 + eps_shift, x_up2)
        h_upper = h[1]

        angle_lower = (
            -np.arctan((pos_lower_2 - pos_lower_1) / h_lower) * 180.0 / np.pi
            + 90.0
        )
        angle_upper = (
            np.arctan((pos_upper_2 - pos_upper_1) / h_upper) * 180.0 / np.pi
            + 90.0
        )
        ts = solver.time_stepping
        self.contact_velocity = (
            pos_lower_1 - self.old_contact_position
        ) / ts.step_size()
        self.old_contact_position = pos_lower_1

        self._p(f"  Interface location center pointwise:  {_fmt(pos_x, 4)}")
        self._p(
            f"  Interface location lower wall/angle:  {_fmt(pos_lower_1, 4)}"
            f" / {_fmt(angle_lower, 4)}"
        )
        self._p(
            f"  Interface location upper wall/angle:  {_fmt(pos_upper_1, 4)}"
            f" / {_fmt(angle_upper, 4)}"
        )
        self._p(f"  Interface velocity:                   "
                f"{_fmt(self.contact_velocity, 4)}")
        self.solution_data.append(
            (ts.now(), pos_x, pos_lower_1, angle_lower, pos_upper_1, angle_upper)
        )
        self._p(
            f"  Concentration range: {_fmt(cmin, 3)} / {_fmt(cmax, 3)}"
        )
        solver.compute_bubble_statistics()

    def run(self, n_steps=None) -> None:
        solver = self.solver
        par = self.parameters
        self._p(
            f"Running a 2D phase field channel flow problem using "
            f"{solver.time_stepping.name()}, Q{par.velocity_degree}"
            f"/Q{par.pressure_degree} elements"
        )
        solver.set_no_slip_boundary(0)
        solver.set_open_boundary_with_normal_flux(1, None, 1)
        solver.set_open_boundary_with_normal_flux(2, None, -1)
        solver.setup_problem(ZeroFunction(2), initial_distance)
        self.output_results()

        step = 0
        while not solver.time_stepping.at_end():
            solver.advance_time_step()
            self.output_results()
            step += 1
            if n_steps is not None and step >= n_steps:
                break


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    paramfile = argv[0] if argv else "phasefield_poiseuille.prm"
    parameters = TwoPhaseParameters.from_file(paramfile)
    problem = ChannelProblem(parameters)
    problem.run()
    from adaflo_tpu.utils.timer import print_wall_times
    print_wall_times(parameters, problem)


if __name__ == "__main__":
    main()
