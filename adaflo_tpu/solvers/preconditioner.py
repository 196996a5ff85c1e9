"""Preconditioner building blocks and the block-triangular NS preconditioner.

TPU-native replacement for the reference's NavierStokesPreconditioner
(/root/reference/source/navier_stokes_preconditioner.cc:593-737): identical
block structure —

  1. approximate velocity-block inverse,
  2. apply the divergence block,
  3. Schur complement: Cahouet-Chabbard (scaled pressure-mass solve plus a
     pressure-Poisson approximation) for the time-dependent case, or
     Kay-Loghin-Wathen pressure convection-diffusion for the stationary case

— but the ILU / ML-AMG components (which have no efficient TPU analog: both
are sequential triangular/graph algorithms) are replaced by matrix-free
Chebyshev iteration with Jacobi scaling, whose building blocks (diagonal
extraction, mat-vecs) run as batched device kernels.  All state lives in a
NamedTuple of arrays so the whole preconditioner application jits.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from adaflo_tpu.ops.navier_stokes import Coefficients, NavierStokesOperator, TimeWeights
from adaflo_tpu.parameters import (
    FlowParameters,
    Linearization,
    PhysicalType,
    VelocityPreconditioner,
)
from adaflo_tpu.solvers.krylov import cg
from adaflo_tpu.solvers.multigrid import LatticeGMG


class DiagonalPreconditioner:
    """Inverse-diagonal application with the reference's thresholding
    (diagonal_preconditioner.cc:38-124): entries below 1e-10 * ||d||_inf are
    treated as 1."""

    def __init__(self, diagonal) -> None:
        self.diagonal = diagonal
        leaves = jax.tree_util.tree_leaves(diagonal)
        mx = jnp.max(jnp.stack([jnp.max(jnp.abs(l)) for l in leaves]))
        self.inverse = jax.tree_util.tree_map(
            lambda d: jnp.where(jnp.abs(d) > 1e-10 * mx, 1.0 / d, 1.0), diagonal
        )

    def vmult(self, r):
        return jax.tree_util.tree_map(lambda i, x: i * x, self.inverse, r)

    __call__ = vmult


def estimate_lambda_max(A: Callable, Dinv, shape_like, n_iter: int = 12):
    """Power iteration estimate of lambda_max(D^-1 A) (replaces deal.II
    PreconditionChebyshev's Lanczos estimate). Deterministic start vector."""

    def norm(v):
        return jnp.sqrt(
            sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(v))
        )

    v = jax.tree_util.tree_map(
        lambda x: jnp.cos(
            jnp.arange(x.size, dtype=x.dtype).reshape(x.shape) * 0.7 + 0.3
        ),
        shape_like,
    )
    v = jax.tree_util.tree_map(lambda x: x / norm(v), v)

    def body(i, carry):
        v, lam = carry
        w = jax.tree_util.tree_map(lambda i_, x: i_ * x, Dinv, A(v))
        lam = norm(w)
        v = jax.tree_util.tree_map(lambda x: x / jnp.maximum(lam, 1e-30), w)
        return (v, lam)

    _, lam = lax.fori_loop(0, n_iter, body, (v, jnp.float64(1.0)))
    return lam


class ChebyshevPreconditioner:
    """Chebyshev-polynomial approximate inverse of an SPD(-dominated)
    operator preconditioned by its inverse diagonal. The TPU-native stand-in
    for one ILU application / one AMG V-cycle: only mat-vecs and elementwise
    ops, no sequential dependencies."""

    def __init__(
        self,
        A: Callable,
        diagonal,
        lambda_max,
        degree: int = 4,
        smoothing_range: float = 30.0,
    ) -> None:
        self.A = A
        self.Dinv = DiagonalPreconditioner(diagonal).inverse
        self.degree = degree
        self.lmax = 1.2 * lambda_max
        self.lmin = lambda_max / smoothing_range

    def vmult(self, b):
        theta = 0.5 * (self.lmax + self.lmin)
        delta = 0.5 * (self.lmax - self.lmin)
        sigma1 = theta / delta
        tm = jax.tree_util.tree_map

        z = tm(lambda i, x: i * x, self.Dinv, b)
        d = tm(lambda x: x / theta, z)
        x = d
        rho_old = 1.0 / sigma1

        def body(k, carry):
            x, d, rho_old = carry
            r = tm(lambda bb, ax: bb - ax, b, self.A(x))
            z = tm(lambda i, rr: i * rr, self.Dinv, r)
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            d = tm(lambda dd, zz: rho * rho_old * dd + 2.0 * rho / delta * zz, d, z)
            x = tm(lambda xx, dd: xx + dd, x, d)
            return (x, d, rho)

        x, _, _ = lax.fori_loop(1, self.degree, body, (x, d, rho_old))
        return x

    __call__ = vmult


# ---------------------------------------------------------------------------
class PrecState(NamedTuple):
    """Arrays rebuilt on preconditioner refresh (the analog of the
    reference's assemble_matrices + compute, ns_prec.cc:899-974)."""

    u_diag: jnp.ndarray  # (dim, n_u) velocity-block diagonal
    u_lambda_max: jnp.ndarray
    poisson_diag: jnp.ndarray  # (n_p,)
    poisson_lambda_max: jnp.ndarray
    mass_diag: jnp.ndarray  # (n_p,) lumped pressure mass (unweighted)
    mass_diag_w: jnp.ndarray  # (n_p,) lumped mass weighted by mass_coefficient
    inv_rho_weight: jnp.ndarray  # 1/(time weight * rho_min) or 1 (stationary)
    mass_coefficient: jnp.ndarray  # 1/(mu + tau_gd): scalar or per-cell (E,)
    lin: object  # frozen Linearized state
    coeffs: Coefficients
    u_gmg: object = None  # tuple of per-component GMGState, or None
    p_gmg: object = None  # GMGState for the pressure Poisson, or None
    # contraction factor of the velocity-block Chebyshev as a fixed-point
    # iteration; > 1 means the block is too nonsymmetric (convection
    # dominated) for a real-interval Chebyshev polynomial and the apply
    # switches to Jacobi-GMRES (the robustness role of the reference's ILU)
    u_cheb_growth: jnp.ndarray = None


class NavierStokesPreconditioner:
    """Block-triangular preconditioner; `vmult` mirrors ns_prec.cc:593-737."""

    def __init__(
        self,
        parameters: FlowParameters,
        op: NavierStokesOperator,
        constraints_schur,
        u_chebyshev_degree: int = 5,
        p_chebyshev_degree: int = 5,
    ) -> None:
        self.parameters = parameters
        self.op = op
        self.constraints_schur = constraints_schur
        self.u_cheb_deg = u_chebyshev_degree
        self.p_cheb_deg = p_chebyshev_degree

        # geometric multigrid on the Q1-subelement lattice replaces the
        # reference's AMG (selected by 'lin velocity preconditioner = amg*');
        # 'ilu*' falls back to Chebyshev/Jacobi (closest matrix-free analog)
        self.use_gmg = parameters.precondition_velocity in (
            VelocityPreconditioner.u_amg,
            VelocityPreconditioner.u_amg_linear,
        )
        if getattr(op.u_space, "is_mapped", False):
            # unstructured/curved meshes: geometric multigrid on the
            # snapshot hierarchy the refinement recorded (the counterpart of
            # the reference's ML-AMG on merged/refined triangulations,
            # ns_prec.cc:465-562). Falls back to Chebyshev/Jacobi when the
            # mesh has no refinement history (coarse-only runs). Extruded
            # 3D meshes coarsen the curved base through its history and
            # halve the z-slices (ExtrudedGMG).
            from adaflo_tpu.solvers.mapped_multigrid import (
                ExtrudedGMG,
                MappedGMG,
            )

            u_space = op.u_space
            is_ext = getattr(u_space, "is_extruded", False)
            if is_ext:
                MappedGMG = ExtrudedGMG
                hist = getattr(u_space.mesh.base, "history", None)
            else:
                hist = getattr(u_space.mesh, "history", None)
            # QuadMesh records refinement snapshots; simplex (TriMesh) and
            # snapshot-less meshes have no hierarchy -> Chebyshev/Jacobi.
            # Extruded meshes always have the z axis to semi-coarsen
            # (ExtrudedGMG z-only levels), so they keep GMG even when the
            # base was built without refinement (micro_particle's
            # 'global refinements = 0')
            if not hist and not (
                is_ext and u_space.mesh.n_slices % 2 == 0
            ):
                self.use_gmg = False
            if self.use_gmg:
                dim = op.dim
                bids = sorted(u_space.mesh.all_boundary_ids())
                u_bids = []
                for c in range(dim):
                    full = []
                    for bid in bids:
                        dofs = u_space.boundary_dofs(bid)
                        if len(dofs) and op.constraints_u[c].is_constrained[
                            dofs
                        ].all():
                            full.append(bid)
                    u_bids.append(full)
                self.u_gmg_geom = [
                    MappedGMG(u_space, u_bids[c], u_space.n_dofs_padded)
                    for c in range(dim)
                ]
                # Schur-complement identity rows: open-boundary sides (all
                # p-dofs constrained) as level Dirichlet bids; a pressure-fix
                # point becomes a per-level pin (ns_prec.cc:1087-1186)
                p_bids = []
                covered = np.zeros(op.p_space.n_dofs, dtype=bool)
                for bid in bids:
                    dofs = op.p_space.boundary_dofs(bid)
                    if len(dofs) and constraints_schur.is_constrained[
                        dofs
                    ].all():
                        p_bids.append(bid)
                        covered[dofs] = True
                pin = None
                rem = [
                    d
                    for d in constraints_schur.dirichlet_dofs
                    if not covered[d]
                ]
                if rem:
                    pin = op.p_space.node_coords[int(rem[0])]
                self.p_gmg_geom = MappedGMG(
                    op.p_space,
                    p_bids,
                    op.p_space.n_dofs_padded,
                    pin_position=pin,
                ) if parameters.pressure_degree >= 1 else None
            else:
                self.u_gmg_geom = None
                self.p_gmg_geom = None
            return
        if getattr(op.u_space, "is_forest", False):
            # adaptive forests: global-coarsening GMG on the forest level
            # hierarchy (solvers/forest_multigrid.py), the counterpart of the
            # reference's ML-AMG on p4est grids
            from adaflo_tpu.solvers.forest_multigrid import ForestGMG

            u_space = op.u_space
            # fully-Dirichlet sides per velocity component (forest NS
            # supports Dirichlet/no-slip + pressure fix, so all components
            # share the same sides)
            dim = op.dim
            u_sides = []
            for c in range(dim):
                sides = []
                for a in range(dim):
                    for s in (0, 1):
                        dofs = u_space.side_dofs(a, s)
                        if len(dofs) and op.constraints_u[c].is_constrained[
                            dofs
                        ].all():
                            sides.append((a, s))
                u_sides.append(sides)
            self.u_gmg_geom = [
                ForestGMG(u_space, u_sides[c], u_space.n_dofs_padded)
                for c in range(dim)
            ] if self.use_gmg else None
            pin = None
            if len(constraints_schur.dirichlet_dofs):
                pin = op.p_space.node_coords[
                    int(constraints_schur.dirichlet_dofs[0])
                ]
            self.p_gmg_geom = ForestGMG(
                op.p_space, [], op.p_space.n_dofs_padded, pin_position=pin
            ) if parameters.pressure_degree >= 1 else None
            return
        mesh = op.u_space.mesh
        if getattr(mesh, "is_graded", False):
            # graded tensor meshes: each space's dof lattice carries the
            # REAL per-axis widths (cell width / degree, nodal points are
            # equidistant within a cell) — the GMG levels then coarsen
            # through the construction history with width-weighted
            # transfers (reference bar: ML-AMG covers any mesh through the
            # assembled matrix, navier_stokes_preconditioner.cc:465-562)
            def graded_widths(degree):
                ws = []
                for a in range(mesh.dim):
                    w = np.repeat(np.diff(mesh.axis_nodes(a)), degree) / degree
                    if mesh.periodic[a]:
                        # periodic lattice: nodes = cells*deg, the GMG's
                        # non-wrapping level model drops the seam cell
                        w = w[:-1]
                    ws.append(w)
                return ws

            u_widths = graded_widths(parameters.velocity_degree)
            p_widths = graded_widths(max(parameters.pressure_degree, 1))
            h_u = h_p = None
        else:
            u_widths = p_widths = None
            h_u = mesh.h / parameters.velocity_degree
            h_p = mesh.h / max(parameters.pressure_degree, 1)
        self.u_gmg_geom = [
            LatticeGMG(
                op.u_space.n_nodes_axis,
                h_u,
                op.constraints_u[c].constrained_dofs,
                op.u_space.n_dofs_padded,
                axis_widths=u_widths,
            )
            for c in range(op.dim)
        ] if self.use_gmg else None
        self.p_gmg_geom = LatticeGMG(
            op.p_space.n_nodes_axis,
            h_p,
            constraints_schur.constrained_dofs,
            op.p_space.n_dofs_padded,
            axis_widths=p_widths,
        ) if parameters.pressure_degree >= 1 else None

    # -- build ----------------------------------------------------------
    def compute(self, tw: TimeWeights, lin, coeffs: Coefficients) -> PrecState:
        """Freeze the linearization point and rebuild diagonals + eigenvalue
        estimates (the analog of fix_linearization_point + assemble +
        ILU/AMG setup). Pure: returns the state pytree."""
        par = self.parameters
        op = self.op
        u_diag = op.velocity_block_diagonal(tw, lin, coeffs)
        uA = lambda v: op.velocity_vmult(v, tw, lin, coeffs)
        u_dinv = DiagonalPreconditioner(u_diag).inverse
        u_lmax = estimate_lambda_max(uA, u_dinv, u_diag)

        # stability probe: one error-propagation step of the Chebyshev
        # fixed-point iteration. Growth > 1 flags a convection-dominated
        # (complex-spectrum) block where a real-interval Chebyshev diverges.
        cheb_probe = ChebyshevPreconditioner(uA, u_diag, u_lmax, self.u_cheb_deg)
        e0 = jnp.cos(
            jnp.arange(u_diag.size, dtype=u_diag.dtype).reshape(u_diag.shape)
            * 0.7
        )
        e1 = e0 - cheb_probe(uA(e0))
        e2 = e1 - cheb_probe(uA(e1))
        u_cheb_growth = jnp.sqrt(
            jnp.sum(e2 * e2) / jnp.maximum(jnp.sum(e1 * e1), 1e-300)
        )

        # variable-coefficient Schur pieces (the reference's
        # use_variable_coefficients branches): per-q 1/rho in the pressure
        # Poisson (nsm.cc:976-997) and per-cell 1/(mu+tau) in the scaled
        # pressure mass (nsm.cc:1050-1061) — NOT in the projection scheme
        # or the stationary case
        variable_schur = self._variable_schur
        if par.physical_type == PhysicalType.incompressible_stationary:
            inv_rho_weight = jnp.float64(1.0)
            mass_coefficient = jnp.float64(1.0)
        else:
            rho_min = min(par.density, par.density + par.density_diff)
            if rho_min > 0:
                inv_rho_weight = 1.0 / (tw.weight * rho_min)
            else:
                inv_rho_weight = jnp.float64(0.0)
            if par.linearization == Linearization.projection:
                mass_coefficient = jnp.float64(1.0)
            elif coeffs.mu is not None:
                mu_cell = coeffs.mu[:, coeffs.mu.shape[1] // 2]
                mass_coefficient = 1.0 / (mu_cell + par.tau_grad_div)
            else:
                mass_coefficient = jnp.float64(
                    1.0 / (par.viscosity + par.tau_grad_div)
                )

        pscale, pcoeffs = self._poisson_scale_coeffs(
            jnp.float64(inv_rho_weight), coeffs if variable_schur else Coefficients()
        )
        poisson_diag = op.pressure_poisson_diagonal(
            pscale, self.constraints_schur, pcoeffs
        )
        pA = lambda p: op.pressure_poisson_vmult(
            p, pscale, pcoeffs, self.constraints_schur
        )
        p_dinv = DiagonalPreconditioner(poisson_diag).inverse
        p_lmax = estimate_lambda_max(pA, p_dinv, poisson_diag)
        mass_diag = op.pressure_lumped_mass()
        if jnp.asarray(mass_coefficient).ndim == 0:
            mass_diag_w = mass_diag * mass_coefficient
        else:
            mass_diag_w = op.pressure_lumped_mass(mass_coefficient)

        u_gmg = p_gmg = None
        # lattice GMG smooths on Q1 subcells (upsample per-cell arrays);
        # forest/mapped GMG levels keep the mesh cells, so per-cell
        # coefficients pass through directly
        per_cell_levels = getattr(op.u_space, "is_forest", False) or getattr(
            op.u_space, "is_mapped", False
        )
        if self.use_gmg and self.u_gmg_geom is not None:
            deg = par.velocity_degree
            if coeffs.rho is not None:
                rho_cell = jnp.mean(coeffs.rho, axis=1)
                alpha_u = tw.weight * (
                    rho_cell
                    if per_cell_levels
                    else _cells_to_subcells(
                        rho_cell, op.u_space.mesh.n_cells_axis, deg
                    )
                )
            else:
                alpha_u = jnp.float64(tw.weight * par.density)
            if par.physical_type != PhysicalType.incompressible:
                alpha_u = 0.0 * alpha_u  # no mass term (stationary / Stokes)
            if coeffs.mu is not None:
                mu_cell = jnp.mean(coeffs.mu, axis=1)
                beta_u = tw.tau1 * (
                    mu_cell
                    if per_cell_levels
                    else _cells_to_subcells(
                        mu_cell, op.u_space.mesh.n_cells_axis, deg
                    )
                )
            else:
                beta_u = jnp.float64(tw.tau1 * par.viscosity)
            u_gmg = tuple(
                self.u_gmg_geom[c].compute(alpha_u, beta_u)
                for c in range(op.dim)
            )
        if self.p_gmg_geom is not None:
            if pcoeffs.rho is not None:
                # per-cell 1/rho into the Poisson GMG levels
                inv_rho_cell = jnp.mean(1.0 / pcoeffs.rho, axis=1)
                beta_p = pscale * (
                    inv_rho_cell
                    if per_cell_levels
                    else _cells_to_subcells(
                        inv_rho_cell,
                        op.u_space.mesh.n_cells_axis,
                        max(par.pressure_degree, 1),
                    )
                )
            else:
                beta_p = pscale
            p_gmg = self.p_gmg_geom.compute(jnp.float64(0.0), beta_p)

        return PrecState(
            u_diag,
            u_lmax,
            poisson_diag,
            p_lmax,
            mass_diag,
            mass_diag_w,
            jnp.float64(inv_rho_weight),
            mass_coefficient,
            lin,
            coeffs,
            u_gmg,
            p_gmg,
            u_cheb_growth,
        )

    # -- pieces ---------------------------------------------------------
    @property
    def _variable_schur(self) -> bool:
        par = self.parameters
        return (
            par.linearization != Linearization.projection
            and par.physical_type != PhysicalType.incompressible_stationary
        )

    def _poisson_scale_coeffs(self, inv_rho_weight, coeffs: Coefficients):
        """(scale, coeffs) for the pressure Poisson operator: with variable
        density the per-q 1/rho enters and the scale is 1/weight
        (= inv_rho_weight * rho_min); otherwise the constant
        1/(weight * rho_min) with no coefficients."""
        scale = jnp.where(inv_rho_weight > 0, inv_rho_weight, 1.0)
        if coeffs.rho is None:
            return scale, Coefficients()
        par = self.parameters
        rho_min = min(par.density, par.density + par.density_diff)
        return scale * rho_min, coeffs

    def _u_approx_inverse(
        self, st: PrecState, ru, tw, do_inner: bool, u_robust: bool = False
    ):
        uA = lambda v: self.op.velocity_vmult(v, tw, st.lin, st.coeffs)
        if u_robust:
            # convection-dominated block (see u_cheb_growth): a fixed-count
            # Jacobi-preconditioned GMRES takes the role of the reference's
            # nonsymmetry-robust ILU (ns_prec.cc velocity ILU / inner
            # BiCgStab, cc:594-665). The outer solver is FGMRES, so a
            # nonstationary inner iteration is admissible.
            from adaflo_tpu.solvers.krylov import gmres as _gmres

            dinv = DiagonalPreconditioner(st.u_diag).inverse
            Mj = lambda r: dinv * r
            n_it = 30 if do_inner else 8
            return _gmres(
                uA,
                ru,
                jnp.zeros_like(ru),
                3e-2 * jnp.sqrt(jnp.vdot(ru, ru).real)
                if do_inner
                else jnp.float64(1e-50),
                n_it,
                restart=n_it,
                M=Mj,
            ).x
        # 'amg linear': one GMG V-cycle per component (ns_prec.cc velocity
        # AMG apply). The V-cycle smooths the alpha M + beta K model, which
        # tracks the transient velocity block well; for the stationary
        # (convection-dominated, no mass) block the Chebyshev polynomial of
        # the TRUE operator is the more robust choice, so GMG is gated to
        # transient runs.
        per_cell_levels = getattr(self.op.u_space, "is_forest", False) or getattr(
            self.op.u_space, "is_mapped", False
        )
        use_gmg_here = (
            st.u_gmg is not None
            and self.parameters.physical_type != PhysicalType.incompressible_stationary
            # variable-coefficient (two-phase) velocity blocks: forest/mapped
            # GMG levels carry true per-cell rho/mu and work well; the
            # lattice's Q1-subcell averaged model underperforms Chebyshev on
            # the true operator there, so it stays constant-coefficient-only
            and (st.coeffs.rho is None or per_cell_levels)
        )
        if use_gmg_here:
            M = lambda r: jnp.stack(
                [
                    self.u_gmg_geom[c].vmult(st.u_gmg[c], r[c])
                    for c in range(self.op.dim)
                ]
            )
        else:
            M = ChebyshevPreconditioner(
                uA, st.u_diag, st.u_lambda_max, self.u_cheb_deg
            )
        if not do_inner:
            return M(ru)
        # inner solve to 3e-2 relative with BiCGStab, like the reference
        # (ns_prec.cc:636-665) — the velocity block is nonsymmetric
        # (convection), so CG is not admissible here
        from adaflo_tpu.solvers.krylov import bicgstab as _bicgstab

        tol = 3e-2 * jnp.sqrt(jnp.vdot(ru, ru).real)
        res = _bicgstab(uA, ru, None, tol, 50, M=M)
        # fall back to the plain apply if the inner iteration broke down
        ok = res.converged | (res.residual < jnp.sqrt(jnp.vdot(ru, ru).real))
        return jnp.where(ok, res.x, M(ru))

    def _poisson_approx_inverse(self, st: PrecState, rp, strong: bool):
        pscale, pcoeffs = self._poisson_scale_coeffs(
            st.inv_rho_weight,
            st.coeffs if self._variable_schur else Coefficients(),
        )
        pA = lambda p: self.op.pressure_poisson_vmult(
            p, pscale, pcoeffs, self.constraints_schur
        )
        if st.p_gmg is not None:
            M = lambda r: self._poisson_gmg_apply(st, r)
        else:
            M = ChebyshevPreconditioner(
                pA, st.poisson_diag, st.poisson_lambda_max, self.p_cheb_deg
            )
        if not strong:
            return M(rp)
        tol = 3e-2 * jnp.sqrt(jnp.vdot(rp, rp).real)
        return cg(pA, rp, None, tol, 30, M=M).x

    def _poisson_gmg_apply(self, st: PrecState, r):
        """Poisson V-cycle on the Q part; Jacobi on the DG0 constants
        (augmented TH)."""
        op = self.op
        if not op.augmented:
            return self.p_gmg_geom.vmult(st.p_gmg, r)
        rq, rc = op._split_p(r)
        xq = self.p_gmg_geom.vmult(st.p_gmg, rq)
        scale = jnp.where(st.inv_rho_weight > 0, st.inv_rho_weight, 1.0)
        xc = rc / (op.dg0_diagonal() * scale)
        out = op._join_p(xq, xc)
        cs = self.constraints_schur.constrained_dofs
        if len(cs):
            out = out.at[cs].set(r[cs])
        return out

    def solve_pressure_mass(self, st: PrecState, rp):
        """CG on the scaled pressure mass, rel 1e-2, lumped-mass diagonal
        preconditioner (ns_prec.cc:741-773). With augmented TH the mass
        vmult projects out the DG0 constant mode (the operator is singular,
        cc:449-454); the rhs and the preconditioned residuals must then stay
        in the projected subspace, or the diagonal preconditioner feeds the
        null component back and the CG iterates blow up (observed 1e17 on
        adapted forests, silently eating ~4 digits on uniform lattices).

        precondition_pressure selects the mass approximation exactly as the
        reference does (ns_prec.cc:958-971): p_mass_ilu -> the inner CG
        solve (our matrix-free ILU-grade replacement); p_mass_diag -> one
        inverse-lumped-diagonal application, no inner solve."""
        from adaflo_tpu.parameters import PressurePreconditioner

        op = self.op
        mA = lambda p: op.pressure_mass_vmult(p, st.mass_coefficient)
        dinv = DiagonalPreconditioner(st.mass_diag_w).inverse
        if (
            op.pressure_dg0_mode is not None
            and self.parameters.linearization != Linearization.projection
        ):
            m1, w1, i1 = op.pressure_dg0_mode
            proj = lambda v: v - (w1 @ v) * i1 * m1
            rp = proj(rp)
            M = lambda r: proj(dinv * r)
        else:
            M = lambda r: dinv * r
        if (
            self.parameters.precondition_pressure
            == PressurePreconditioner.p_mass_diag
            and not self.parameters.augmented_taylor_hood
        ):
            return M(rp)
        return cg(
            mA,
            rp,
            jnp.zeros_like(rp),
            jnp.float64(1e-50),
            100,
            M=M,
            reduction=1e-2,
        ).x

    # -- application ----------------------------------------------------
    def apply(
        self,
        st: PrecState,
        rhs,
        tw: TimeWeights,
        do_inner: bool,
        u_robust: bool = False,
    ):
        """Apply the block-triangular preconditioner to (ru, rp). Pure in
        (st, rhs, tw); do_inner and u_robust are static Python bools.

        Sharding note: the GMG/Chebyshev internals reshape dof vectors onto
        the cell lattice, which under GSPMD materializes ONE field-sized
        gather at the apply boundary (pinned by the halo collective test);
        making the V-cycle halo-native is the remaining sharding work."""
        par = self.parameters
        ru, rp = rhs

        du = self._u_approx_inverse(st, ru, tw, do_inner, u_robust)
        # temp = -rp + B du (ns_prec.cc:670-673)
        temp = self.op.divergence_vmult_add(-rp, du, coeffs=st.coeffs)

        if par.physical_type == PhysicalType.incompressible_stationary:
            # Kay-Loghin-Wathen (ns_prec.cc:678-708); plain Laplacian with
            # coefficient 1 (the stationary branch of nsm.cc:1020-1024)
            pA = lambda p: self.op.pressure_poisson_vmult(
                p, jnp.float64(1.0), Coefficients(), self.constraints_schur
            )
            if st.p_gmg is not None:
                Mp = lambda r: self._poisson_gmg_apply(st, r)
            else:
                Mp = ChebyshevPreconditioner(
                    pA, st.poisson_diag, st.poisson_lambda_max, self.p_cheb_deg
                )
            tol = 1e-2 * jnp.sqrt(jnp.vdot(temp, temp).real)
            dp = cg(pA, temp, None, tol, 30, M=Mp).x
            cs = self.constraints_schur.constrained_dofs
            if len(cs):
                dp = dp.at[cs].set(0.0)
            t2 = self.op.pressure_convdiff_vmult(dp, st.coeffs, self.constraints_schur)
            if len(cs):
                t2 = t2.at[cs].set(temp[cs])
            dp = self.solve_pressure_mass(st, t2)
            return (du, dp)

        # Cahouet-Chabbard (ns_prec.cc:710-737)
        dp = self.solve_pressure_mass(st, temp)
        if par.density > 0:
            dp = dp + self._poisson_approx_inverse(st, temp, do_inner)
        return (du, dp)

    # ------------------------------------------------------------------
    def solve_projection_system(
        self,
        st: PrecState,
        solution_u,
        rhs_u,
        tw: TimeWeights,
        nl_tolerance,
        lin_tolerance,
        dt_start: float,
        constraints_u,
        constraints_schur,
        lin=None,
    ):
        """Fractional-step pressure-correction solve (ns_prec.cc:777-850):
        GMRES momentum solve, CG pressure-Poisson projection, rotational
        update via the mu-weighted divergence and a mass solve. Returns
        (update_u, update_p, phi, iterations, residual). `lin` is the
        current-step linearization for the momentum matrix; the
        preconditioner keeps st's frozen copy."""
        from adaflo_tpu.solvers.krylov import gmres

        op = self.op
        par = self.parameters
        lin = lin if lin is not None else st.lin
        uA = lambda v: op.velocity_vmult(v, tw, lin, st.coeffs)
        if st.u_gmg is not None:
            cheb = lambda r: jnp.stack(
                [
                    self.u_gmg_geom[c].vmult(st.u_gmg[c], r[c])
                    for c in range(op.dim)
                ]
            )
        else:
            cheb = ChebyshevPreconditioner(
                uA, st.u_diag, st.u_lambda_max, self.u_cheb_deg
            )
        res_u = gmres(
            uA,
            rhs_u,
            jnp.zeros_like(rhs_u),
            0.5 * nl_tolerance,
            par.max_lin_iteration,
            restart=50,
            M=cheb,
        )
        du = res_u.x
        for c, con in enumerate(constraints_u):
            du = du.at[c].set(con.distribute(du[c]))
        u_star = solution_u + du

        # pressure Poisson: rhs = -div(u*) with plain reads (cc:811-825)
        rhs_p = op.divergence_vmult_add(
            jnp.zeros(op.n_p_padded), u_star, coeffs=st.coeffs, plain=True
        )
        # projection scheme: constant-coefficient Poisson with rho_min (the
        # reference's use_variable_coefficients excludes projection,
        # nsm.cc:976-978)
        pA = lambda p: op.pressure_poisson_vmult(
            p, st.inv_rho_weight, Coefficients(), constraints_schur
        )
        if st.p_gmg is not None:
            pcheb = lambda r: self._poisson_gmg_apply(st, r)
        else:
            pcheb = ChebyshevPreconditioner(
                pA, st.poisson_diag, st.poisson_lambda_max, self.p_cheb_deg
            )
        rho_min = min(par.density, par.density + par.density_diff)
        tol_p = 0.1 * dt_start / rho_min * nl_tolerance
        cs = constraints_schur.constrained_dofs
        rhs_pz = rhs_p.at[cs].set(0.0) if len(cs) else rhs_p
        phi = cg(pA, rhs_pz, None, tol_p, 1000, M=pcheb).x
        phi = constraints_schur.distribute(phi)

        # rotational part: rhs = -mu div(u*); mass solve (cc:827-846)
        rhs_rot = op.divergence_vmult_add(
            jnp.zeros(op.n_p_padded),
            u_star,
            weight_by_viscosity=True,
            coeffs=st.coeffs,
            plain=True,
        )
        mA = lambda p: op.pressure_mass_vmult(p, jnp.float64(1.0))
        dinv = DiagonalPreconditioner(st.mass_diag).inverse
        dp_rot = cg(
            mA,
            rhs_rot,
            jnp.zeros_like(rhs_rot),
            jnp.float64(1e-50),
            1000,
            M=lambda r: dinv * r,
            reduction=0.1 * lin_tolerance,
        ).x
        dp_rot = constraints_schur.distribute(dp_rot)
        dp = dp_rot + phi
        return du, dp, phi, res_u.iterations, res_u.residual


def _cells_to_subcells(x_cells, n_cells_axis, deg: int):
    """Upsample a per-cell array to the deg^dim Q1 subcells of each cell."""
    dim = len(n_cells_axis)
    xx = x_cells.reshape(tuple(reversed(n_cells_axis)))
    for a in range(dim):
        xx = jnp.repeat(xx, deg, axis=a)
    return xx.reshape(-1)
