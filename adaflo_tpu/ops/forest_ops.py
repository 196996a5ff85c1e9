"""Matrix-free operators on adaptive ForestSpace meshes.

The general index-map gather/scatter path (u[cell_dofs] / at[].add) paired
with VariableCellEvaluator per-cell geometry: the adaptive-mesh counterpart
of ops/navier_stokes.py's uniform-lattice kernels. Constraint handling
follows the same deal.II matrix-free convention (resolve -> cell loop ->
condense -> identity rows) the uniform operators use, now including
multi-master hanging-node rows.

This module carries the scalar building blocks (Helmholtz alpha*M + beta*K,
rhs assembly, diagonal) used by the adaptive Poisson/projection solves; the
full adaptive Navier-Stokes operator composes the same pieces.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.forest_space import ForestSpace
from adaflo_tpu.ops.tensor import VariableCellEvaluator


def evaluator_for(space, n_q_1d: int, dtype=None):
    """Per-cell-geometry evaluator for a space on the general index-map
    path: MappedEvaluator for unstructured (curved) meshes,
    VariableCellEvaluator for axis-aligned forest cells."""
    if getattr(space, "is_simplex", False):
        from adaflo_tpu.ops.mapped import SimplexEvaluator

        return SimplexEvaluator(space, n_q_1d, dtype)
    if getattr(space, "is_extruded", False):
        # curved base x z-lattice: tensorized block-diagonal geometry
        from adaflo_tpu.ops.mapped import Extruded3DEvaluator

        return Extruded3DEvaluator(space, n_q_1d, dtype)
    if hasattr(space, "mapping"):
        # curved 2D quads with full Jacobians
        from adaflo_tpu.ops.mapped import MappedEvaluator

        return MappedEvaluator(space.dim, space.basis, n_q_1d, space.mapping, dtype)
    # per-cell Cartesian geometry (forests, axis-aligned hex meshes)
    return VariableCellEvaluator(space.dim, space.basis, n_q_1d, space.h_cells, dtype)


class ForestHelmholtzOperator:
    """alpha * mass + beta * stiffness on a ForestSpace, constrained.

    vmult computes y = C^T A C u with identity on constrained rows — the
    standard symmetric constrained operator (SPD on the free subspace), same
    structure as deal.II matrix-free cell loops with AffineConstraints."""

    def __init__(
        self,
        space: ForestSpace,
        constraints: Constraints,
        n_q_1d: int | None = None,
        dtype=None,
    ) -> None:
        self.space = space
        self.con = constraints
        nq = n_q_1d or (space.degree + 1)
        self.ev = evaluator_for(space, nq, dtype=dtype)
        self.cell_dofs = jnp.asarray(space.cell_dofs)
        self.n = space.n_dofs_padded

    # -- core loops ----------------------------------------------------------
    def _scatter(self, r_loc):
        return (
            jnp.zeros(self.n, r_loc.dtype)
            .at[self.cell_dofs.ravel()]
            .add(r_loc.ravel())
        )

    def cell_apply(self, uc, alpha, beta):
        ev = self.ev
        out = 0.0
        if alpha is not None:
            out = ev.integrate_values(alpha * ev.values(uc))
        if beta is not None:
            out = out + ev.integrate_gradients(beta * ev.gradients(uc))
        return out

    def vmult(self, u, alpha=1.0, beta=1.0):
        ur = self.con.resolve(u)
        uc = ur[self.cell_dofs]
        r = self._scatter(self.cell_apply(uc, alpha, beta))
        r = self.con.condense(r)
        cd = self.con.constrained_dofs
        if len(cd):
            r = r.at[cd].set(u[cd])
        if self.n > self.space.n_dofs:
            r = r.at[self.space.n_dofs :].set(u[self.space.n_dofs :])
        return r

    def rhs(self, f_vals):
        """Assemble condensed rhs from quad-point values f_vals (E, n_q)."""
        r = self._scatter(self.ev.integrate_values(f_vals))
        r = self.con.condense(r)
        return r

    def diagonal(self, alpha=1.0, beta=1.0):
        """Global diagonal (unit-basis trick per cell), identity on
        constrained rows."""
        E = self.space.n_cells
        nl = self.ev.n_local
        I = jnp.broadcast_to(
            jnp.eye(nl, dtype=self.ev.dtype), (E, nl, nl)
        )
        loc = self.cell_apply(I, alpha, beta)  # (E, j, i)
        dloc = jnp.einsum("eii->ei", loc)
        d = self._scatter(dloc)
        cd = self.con.constrained_dofs
        if len(cd):
            d = d.at[cd].set(1.0)
        if self.n > self.space.n_dofs:
            d = d.at[self.space.n_dofs :].set(1.0)
        return d

    # -- error/norm helpers ---------------------------------------------------
    def l2_error(self, u, exact_fn) -> float:
        """L2 error of the (distributed) dof vector vs exact_fn(points)."""
        u = np.asarray(self.con.distribute(jnp.asarray(u)))
        qc = self.ev.quad_coords(self.space)  # (E, n_q, dim)
        vals = np.asarray(self.ev.values(jnp.asarray(u)[self.cell_dofs]))
        exact = exact_fn(qc.reshape(-1, self.space.dim)).reshape(vals.shape)
        jxw = np.asarray(self.ev.jxw_cells)
        return float(np.sqrt((((vals - exact) ** 2) * jxw).sum()))
