"""Single-phase Navier-Stokes solver/driver.

TPU-native counterpart of the reference's NavierStokes<dim>
(/root/reference/source/navier_stokes.cc): owns the (u, p) Taylor-Hood
spaces, boundary-condition machinery, the nonlinear Newton/Picard loop with
extrapolated initial guesses and preconditioner-staleness heuristics
(cc:833-1159), and the two-stage linear solve (cheap preconditioner first,
then inner solves, cc:559-653).

Host Python orchestrates time steps and the nonlinear loop and prints the
residual tables; each residual evaluation and each complete linear solve is a
single jitted XLA program with all Krylov loops inside (per-step scalars like
BDF weights are traced arguments, so kernels compile once per run).
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.flow_base import FlowBaseAlgorithm
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.navier_stokes import (
    Coefficients,
    NavierStokesOperator,
    TimeWeights,
)
from adaflo_tpu.parameters import (
    FlowParameters,
    Linearization,
    PhysicalType,
    VelocityPreconditioner,
)
from adaflo_tpu.solvers.krylov import fgmres
from adaflo_tpu.solvers.preconditioner import NavierStokesPreconditioner, PrecState
from adaflo_tpu.time_stepping import TimeStepping


class ExcNavierStokesNoConvergence(Exception):
    pass


class NavierStokes(FlowBaseAlgorithm):
    def __init__(
        self,
        parameters: FlowParameters,
        mesh: StructuredMesh,
        out=None,
        pad_dofs_to: int = 1,
    ) -> None:
        super().__init__()
        self.parameters = parameters
        self.mesh = mesh
        if getattr(parameters, "use_simplex_mesh", False):
            # `set simplex mesh = 1` selects simplex FE spaces in the
            # reference (navier_stokes.cc:92-98); here the mesh family is
            # the carrier of that choice, so the flag must agree with it
            from adaflo_tpu.mesh.unstructured import TriMesh

            if not isinstance(mesh, TriMesh):
                raise NotImplementedError(
                    "'simplex mesh = 1' requires a simplex (triangle) mesh; "
                    "this driver builds a tensor-product mesh. Use the "
                    "simplex drivers (simplex_channel, simplex_bubble) or "
                    "provide a Gmsh .msh simplex mesh."
                )
        self.pad_dofs_to = pad_dofs_to
        self.time_stepping = TimeStepping(parameters)
        self.out = out
        self.dim = mesh.dim
        self.system_is_setup = False
        # preconditioner bookkeeping (navier_stokes.h / cc:833-971)
        self.update_preconditioner = True
        self.update_preconditioner_frequency = 0
        self.n_iterations_last_prec_update = 0
        self.time_step_last_prec_update = 0
        # user forcing (filled by two-phase solvers: surface tension etc.)
        self.user_rhs_u = None
        self.user_rhs_p = None
        self.coefficients = Coefficients()
        from adaflo_tpu.utils.timer import Statistics, TimerOutput

        self.timer = TimerOutput()
        self.statistics = Statistics()

    # -- printing --------------------------------------------------------
    def _p(self, *args, **kw):
        print(*args, **kw, file=self.out or sys.stdout)

    # ------------------------------------------------------------------
    @property
    def is_forest(self) -> bool:
        from adaflo_tpu.mesh.forest import ForestMesh

        return isinstance(self.mesh, ForestMesh)

    @property
    def is_mapped(self) -> bool:
        from adaflo_tpu.mesh.extruded import ExtrudedMesh
        from adaflo_tpu.mesh.unstructured import HexMesh, QuadMesh, TriMesh

        return isinstance(self.mesh, (QuadMesh, TriMesh, HexMesh, ExtrudedMesh))

    def setup_problem(self, initial_velocity_fn=None) -> None:
        par = self.parameters
        mesh = self.mesh
        if par.global_refinements < 15:
            mesh.refine_global(par.global_refinements)
        for axis in self.boundary.periodic_axes:
            mesh.set_periodic(axis)
        self._setup_discretization()
        self._allocate_vectors(initial_velocity_fn)
        self._build_jitted()
        self.system_is_setup = True
        self._prec_state: Optional[PrecState] = None
        self._last_lin = None

    def _setup_discretization(self) -> None:
        """Build spaces, constraints, operator and preconditioner for the
        current mesh (re-entered after forest adaptation)."""
        par = self.parameters
        mesh = self.mesh
        if self.is_mapped:
            from adaflo_tpu.fe.mapped_space import CellMapping, MappedSpace
            from adaflo_tpu.mesh.unstructured import HexMesh, TriMesh

            bd = self.boundary
            if bd.periodic_axes:
                raise NotImplementedError(
                    "periodicity on unstructured meshes is not supported"
                )
            if isinstance(mesh, TriMesh):
                # simplex mesh: FE_SimplexP spaces on affine triangles
                # (navier_stokes.cc FE_SimplexP branch)
                from adaflo_tpu.fe.simplex import SimplexSpace

                self.u_space = SimplexSpace(mesh, par.velocity_degree)
                self.p_space = SimplexSpace(mesh, par.pressure_degree)
            elif isinstance(mesh, HexMesh):
                # 3D extruded / axis-aligned hex configurations
                from adaflo_tpu.fe.hex_space import Hex3DSpace

                self.u_space = Hex3DSpace(mesh, par.velocity_degree)
                self.p_space = Hex3DSpace(mesh, par.pressure_degree)
            elif getattr(mesh, "is_extruded", False):
                # curved 2D base swept in z (micro_particle.cc:326): tensor
                # spaces over the shared base mapping
                from adaflo_tpu.fe.extruded_space import ExtrudedSpace
                from adaflo_tpu.fe.mapped_space import CellMapping

                self.cell_mapping = CellMapping(mesh.base, degree=3)
                self.u_space = ExtrudedSpace(
                    mesh, par.velocity_degree, self.cell_mapping
                )
                self.p_space = ExtrudedSpace(
                    mesh, par.pressure_degree, self.cell_mapping
                )
            else:
                # one mapping shared by velocity and pressure (the
                # reference's single MappingQ(3), flow_base_algorithm.cc:44-46)
                self.cell_mapping = CellMapping(mesh, degree=3)
                self.u_space = MappedSpace(mesh, par.velocity_degree, self.cell_mapping)
                self.p_space = MappedSpace(mesh, par.pressure_degree, self.cell_mapping)
            if (bd.symmetry or bd.normal_flux) and not hasattr(
                self.u_space, "boundary_normal_axis_dofs"
            ):
                raise NotImplementedError(
                    "symmetry/normal-flux boundaries on this unstructured "
                    "mesh type are not supported"
                )
        elif self.is_forest:
            from adaflo_tpu.fe.forest_space import ForestSpace

            bd = self.boundary
            if bd.normal_flux or bd.open_conditions_p or bd.periodic_axes:
                raise NotImplementedError(
                    "adaptive forest NS currently supports Dirichlet/no-slip/"
                    "symmetry boundaries with pressure fix only"
                )
            self.u_space = ForestSpace(mesh, par.velocity_degree)
            self.p_space = ForestSpace(mesh, par.pressure_degree)
        else:
            self.u_space = ScalarSpace(mesh, par.velocity_degree)
            self.p_space = ScalarSpace(mesh, par.pressure_degree)
        if self.pad_dofs_to > 1:
            self.u_space.set_padding(self.pad_dofs_to)
            self.p_space.set_padding(self.pad_dofs_to)
        self._build_constraints()

        self.operator = NavierStokesOperator(
            par,
            self.u_space,
            self.p_space,
            self.constraints_u,
            self.constraints_p,
        )
        if self.boundary.pressure_fix:
            self.operator.enable_pressure_fix()
        self.preconditioner = NavierStokesPreconditioner(
            par, self.operator, self.constraints_schur
        )

    def _allocate_vectors(self, initial_velocity_fn=None) -> None:
        par = self.parameters
        n_u = self.u_space.n_dofs_padded
        n_p = self.operator.n_p_padded if par.augmented_taylor_hood else (
            self.p_space.n_dofs_padded
        )
        zeros_u = jnp.zeros((self.dim, n_u))
        zeros_p = jnp.zeros(n_p)
        self.solution = [zeros_u, zeros_p]
        self.solution_old = [zeros_u, zeros_p]
        self.solution_old_old = [zeros_u, zeros_p]
        self.solution_update = [zeros_u, zeros_p]
        self.const_rhs = [zeros_u, zeros_p]
        self.user_rhs = [zeros_u, zeros_p]

        if initial_velocity_fn is not None and not self.time_stepping.at_end():
            vals = np.asarray(
                initial_velocity_fn(self.u_space.node_coords, self.time_stepping.now())
            )
            self.solution[0] = self.solution[0].at[:, : vals.shape[1]].set(vals)

    # ------------------------------------------------------------------
    def _build_constraints(self) -> None:
        """Mirror of the reference's constraint setup
        (navier_stokes.cc:228-360) for structured meshes: Dirichlet and
        no-slip constrain all velocity components; symmetry
        (no-normal-flux) constrains the normal component per side;
        normal-flux-only boundaries constrain the tangential components.
        Periodicity is handled by lattice wrap-around in the spaces."""
        bd = self.boundary
        u_space, p_space = self.u_space, self.p_space
        cu = [Constraints(u_space.n_dofs) for _ in range(self.dim)]

        dirichlet_ids = set(bd.dirichlet_conditions_u) | bd.no_slip
        for bid in dirichlet_ids:
            if bid in bd.open_conditions_p:
                raise ValueError(
                    "Cannot mix velocity Dirichlet with open boundary on "
                    f"boundary id {bid}"
                )
            dofs = u_space.boundary_dofs(bid)
            for c in range(self.dim):
                cu[c].add_dirichlet(dofs)

        # per-side normal components for symmetry / tangential for normal-flux
        if (bd.symmetry or bd.normal_flux) and hasattr(
            u_space, "boundary_normal_axis_dofs"
        ):
            # unstructured axis-aligned boundaries (hex meshes)
            for bid in bd.symmetry | bd.normal_flux:
                for axis, dofs in u_space.boundary_normal_axis_dofs(bid):
                    if bid in bd.symmetry:
                        cu[axis].add_dirichlet(dofs)
                    if bid in bd.normal_flux:
                        for c in range(self.dim):
                            if c != axis:
                                cu[c].add_dirichlet(dofs)
        elif bd.symmetry or bd.normal_flux:
            for axis in range(self.dim):
                for end in (0, 1):
                    ids_here = set(np.unique(self.mesh.boundary_ids(axis, end)))
                    for bid in ids_here:
                        if hasattr(u_space, "boundary_faces"):
                            faces = [
                                fd
                                for ax, en, fd in u_space.boundary_faces(bid)
                                if (ax, en) == (axis, end)
                            ]
                            if not faces:
                                continue
                            dofs = np.unique(
                                np.concatenate([f.ravel() for f in faces])
                            )
                        else:
                            # forest: whole sides carry one boundary id
                            if bid not in (bd.symmetry | bd.normal_flux):
                                continue
                            dofs = u_space.side_dofs(axis, end)
                            if len(dofs) == 0:
                                continue
                        if bid in bd.symmetry:
                            cu[axis].add_dirichlet(dofs)
                        if bid in bd.normal_flux:
                            for c in range(self.dim):
                                if c != axis:
                                    cu[c].add_dirichlet(dofs)

        # hanging-node rows on adaptive forests (all components + pressure)
        hang_u = getattr(u_space, "hanging_slave", None)
        if hang_u is not None and len(hang_u):
            for c in cu:
                c.add_affine(
                    u_space.hanging_slave,
                    u_space.hanging_master,
                    u_space.hanging_weight,
                )
        for c in cu:
            c.close()
        self.constraints_u = cu

        cp = Constraints(p_space.n_dofs)
        hang_p = getattr(p_space, "hanging_slave", None)
        if hang_p is not None and len(hang_p):
            cp.add_affine(
                p_space.hanging_slave,
                p_space.hanging_master,
                p_space.hanging_weight,
            )
        cp.close()
        self.constraints_p = cp

        # Schur-complement-only constraints: Dirichlet on open boundaries +
        # the pressure-fix dof (ns_prec.cc:1087-1186)
        cs = Constraints(p_space.n_dofs)
        for bid in bd.open_conditions_p:
            cs.add_dirichlet(p_space.boundary_dofs(bid))
        for bid in bd.pressure_fix:
            dofs = p_space.boundary_dofs(bid)
            # never pin a hanging slave: its row is already constrained
            if hang_p is not None and len(hang_p):
                dofs = np.setdiff1d(dofs, np.unique(p_space.hanging_slave))
            if len(dofs):
                cs.add_dirichlet(dofs[:1])
        if hang_p is not None and len(hang_p):
            cs.add_affine(
                p_space.hanging_slave,
                p_space.hanging_master,
                p_space.hanging_weight,
            )
        cs.close()
        self.constraints_schur = cs

    # ------------------------------------------------------------------
    def _build_jitted(self) -> None:
        op = self.operator
        par = self.parameters

        def residual_fn(u, p, u_old, u_old_old, tw, const_u, const_p,
                        user_u, user_p, coeffs, ex):
            au, ap, lin = op.residual_assemble(
                u, p, u_old, u_old_old, tw, coeffs, ex
            )
            ru = const_u + user_u - au
            rp = const_p + user_p - ap
            rp = op.apply_pressure_average_projection(rp)
            res_u = jnp.sqrt(jnp.sum(ru * ru))
            res_p = jnp.sqrt(jnp.sum(rp * rp))
            return ru, rp, lin, res_u, res_p

        self._residual_fn = jax.jit(residual_fn)

        prec = self.preconditioner

        def solve_fn(
            rhs_u, rhs_p, sol_u, sol_p, tw, state, lin, tol, do_inner,
            max_iter, u_robust,
        ):
            # the system matrix linearizes around the CURRENT iterate (lin,
            # refreshed by every residual evaluation) while the
            # preconditioner keeps its frozen copy in `state` — exactly the
            # reference's fix_linearization_point semantics
            # (navier_stokes_matrix.cc:1144-1152)
            if op.pr_active(lin, state.coeffs):
                # parity-RESIDENT Krylov: the iterate lives in the packed
                # layout for the whole solve — one fused kernel per apply,
                # no per-apply relayout (the reference pays only ghost
                # exchange per apply, navier_stokes.cc:1255-1317); the
                # preconditioner applies at the pack boundary
                b = op.pr_pack(rhs_u, rhs_p)
                # variable two-phase rho/mu/damping stream, built once per
                # solve (XLA hoists it out of the Krylov while_loop)
                ct, has = op.pr_coeff_stream(state.coeffs)
                A = lambda x: op.vmult_pr(x, tw, lin, ct=ct, has=has)

                def M(r):
                    mu_, mp_ = prec.apply(
                        state, op.pr_unpack(r), tw, do_inner, u_robust
                    )
                    return op.pr_pack(mu_, mp_)

                res = fgmres(
                    A, b, jnp.zeros_like(b), tol, max_iter, restart=50, M=M
                )
                du, dp = op.pr_unpack(res.x)
            else:
                A = lambda x: op.vmult(x[0], x[1], tw, lin, state.coeffs)
                M = lambda r: prec.apply(state, r, tw, do_inner, u_robust)
                x0 = (jnp.zeros_like(rhs_u), jnp.zeros_like(rhs_p))
                res = fgmres(
                    A, (rhs_u, rhs_p), x0, tol, max_iter, restart=50, M=M
                )
                du, dp = res.x
            for c in range(self.dim):
                du = du.at[c].set(self.constraints_u[c].distribute(du[c]))
            dp = self.constraints_p.distribute(dp)
            # fold the Newton update into the same dispatch (one host
            # round trip less per iteration)
            return (
                du,
                dp,
                sol_u + du,
                sol_p + dp,
                res.iterations,
                res.residual,
                res.converged,
            )

        self._solve_fn = jax.jit(
            solve_fn, static_argnames=("do_inner", "max_iter", "u_robust")
        )

        def solve_res_fn(
            rhs_u, rhs_p, sol_u, sol_p, u_old, u_old_old, tw, state, lin,
            tol, const_u, const_p, user_u, user_p, coeffs, ex, do_inner,
            max_iter, u_robust,
        ):
            """Fused Newton iteration: linear solve + solution update + the
            fresh nonlinear residual at the new iterate — ONE dispatch and
            one coalesced readback per Newton step instead of two (the
            host<->device round trip dominates small problems)."""
            du, dp, u_new, p_new, it, lr, conv = solve_fn(
                rhs_u, rhs_p, sol_u, sol_p, tw, state, lin, tol, do_inner,
                max_iter, u_robust,
            )
            ru, rp, lin2, res_u, res_p = residual_fn(
                u_new, p_new, u_old, u_old_old, tw, const_u, const_p,
                user_u, user_p, coeffs, ex,
            )
            upd_u = jnp.sqrt(jnp.sum(du * du))
            upd_p = jnp.sqrt(jnp.sum(dp * dp))
            return (
                du, dp, u_new, p_new, ru, rp, lin2,
                it, lr, conv, res_u, res_p, upd_u, upd_p,
            )

        self._solve_res_fn = jax.jit(
            solve_res_fn, static_argnames=("do_inner", "max_iter", "u_robust")
        )

        # Fused Newton LOOP: the entire nonlinear iteration — linear
        # tolerance policy (navier_stokes.cc:851-868), two-stage linear
        # solve, solution update, fresh residual and convergence control —
        # in ONE dispatch (lax.while_loop), with a per-iteration history so
        # the host prints the exact residual table afterwards. The loop
        # exits early when the preconditioner-staleness heuristic
        # (cc:869-880) is about to trigger; the host rebuilds and re-enters.
        coupled = par.linearization in (
            Linearization.coupled_implicit_newton,
            Linearization.coupled_implicit_picard,
        )
        if coupled:
            max_nl = par.max_nl_iteration
            cheap_iters = min(
                par.iterations_before_inner_solvers, par.max_lin_iteration
            )
            stage2_iters = max(
                par.max_lin_iteration - par.iterations_before_inner_solvers, 0
            ) or par.max_lin_iteration
            tol_nl = float(par.tol_nl_iteration)
            tol_lin = float(par.tol_lin_iteration)
            rel_lin = bool(par.rel_lin_iteration)

            def newton_loop_fn(
                u, p, ru, rp, lin, res0, tw, state, const_u, const_p,
                user_u, user_p, coeffs, ex, u_old, u_old_old,
                stale_budget, remaining, u_robust,
            ):
                rdt = res0.dtype

                def lin_tolerance(res):
                    if not rel_lin:
                        return jnp.asarray(tol_lin, rdt)
                    return jnp.where(
                        res * tol_lin < 0.5 * tol_nl,
                        jnp.asarray(0.5 * tol_nl, rdt),
                        jnp.minimum(tol_lin * res, tol_lin).astype(rdt),
                    )

                hist0 = (
                    jnp.zeros((max_nl,), jnp.int32),   # lin iterations
                    jnp.zeros((max_nl,), rdt),          # lin residual
                    jnp.zeros((max_nl,), rdt),          # |du|
                    jnp.zeros((max_nl,), rdt),          # |dp|
                    jnp.zeros((max_nl,), rdt),          # new nonlinear res
                    jnp.zeros((max_nl,), rdt),          # new res (u part)
                    jnp.zeros((max_nl,), rdt),          # new res (p part)
                )
                du0 = jnp.zeros_like(u)
                dp0 = jnp.zeros_like(p)
                k0 = jnp.int32(0)
                carry0 = (k0, k0, u, p, ru, rp, lin, res0, du0, dp0, hist0)

                def cond(c):
                    k, tot = c[0], c[1]
                    res = c[7]
                    # always run the first iteration (the reference's loop
                    # only tests convergence after a solve); stop on
                    # convergence, iteration budget, or the staleness
                    # heuristic about to trigger at this iteration's start
                    return (
                        ((k == 0) | (res >= tol_nl))
                        & (k < remaining)
                        & (tot.astype(rdt) <= stale_budget)
                    )

                def body(c):
                    k, tot, u, p, ru, rp, lin, res, _du, _dp, hist = c
                    tol = lin_tolerance(res)
                    s1 = solve_fn(
                        ru, rp, u, p, tw, state, lin, tol, False,
                        cheap_iters, u_robust,
                    )

                    def stage2(_):
                        s2 = solve_fn(
                            ru, rp, u, p, tw, state, lin, tol, True,
                            stage2_iters, u_robust,
                        )
                        return s2[:4] + (s1[4] + s2[4], s2[5])

                    def stage1_done(_):
                        return s1[:6]

                    du, dp, u1, p1, it, lr = jax.lax.cond(
                        s1[6], stage1_done, stage2, None
                    )
                    ru2, rp2, lin2, res_u2, res_p2 = residual_fn(
                        u1, p1, u_old, u_old_old, tw, const_u, const_p,
                        user_u, user_p, coeffs, ex,
                    )
                    res2 = jnp.sqrt(res_u2**2 + res_p2**2).astype(rdt)
                    hist = (
                        hist[0].at[k].set(it),
                        hist[1].at[k].set(lr.astype(rdt)),
                        hist[2].at[k].set(jnp.sqrt(jnp.sum(du * du)).astype(rdt)),
                        hist[3].at[k].set(jnp.sqrt(jnp.sum(dp * dp)).astype(rdt)),
                        hist[4].at[k].set(res2),
                        hist[5].at[k].set(res_u2.astype(rdt)),
                        hist[6].at[k].set(res_p2.astype(rdt)),
                    )
                    return (
                        k + 1, tot + it, u1, p1, ru2, rp2, lin2, res2,
                        du, dp, hist,
                    )

                k, tot, u, p, ru, rp, lin, res, du, dp, hist = (
                    jax.lax.while_loop(cond, body, carry0)
                )
                return u, p, ru, rp, lin, res, du, dp, k, tot, hist

            self._newton_loop_fn = jax.jit(
                newton_loop_fn, static_argnames=("u_robust",)
            )
        else:
            self._newton_loop_fn = None

        @jax.jit
        def compute_prec_fn(tw, lin, coeffs):
            return prec.compute(tw, lin, coeffs)

        self._compute_prec_fn = compute_prec_fn

        if par.linearization == Linearization.projection:
            @jax.jit
            def solve_projection_fn(rhs_u, sol_u, tw, state, lin):
                return prec.solve_projection_system(
                    state,
                    sol_u,
                    rhs_u,
                    tw,
                    jnp.float64(par.tol_nl_iteration),
                    jnp.float64(par.tol_lin_iteration),
                    par.time_step_size_start,
                    self.constraints_u,
                    self.constraints_schur,
                    lin,
                )

            self._solve_projection_fn = solve_projection_fn

        @jax.jit
        def extrapolate_fn(cur, old, old_old, f1, f2):
            tmp = [f1 * c + f2 * o for c, o in zip(cur, old)]
            # rotate: old_old <- old, old <- cur, cur <- extrapolated
            return tmp, cur, old

        self._extrapolate_fn = extrapolate_fn

    # ------------------------------------------------------------------
    @property
    def n_dofs(self):
        n_p = self.p_space.n_dofs
        if self.parameters.augmented_taylor_hood:
            n_p += self.mesh.n_cells
        return (self.dim * self.u_space.n_dofs, n_p)

    def print_n_dofs(self) -> None:
        nu, npp = self.n_dofs
        # the reference prints the LAST cell's diameter (navier_stokes.cc:174)
        min_cell_diameter = getattr(
            self.mesh, "last_cell_diameter", self.mesh.cell_diameter
        )
        self._p(f" Number of active cells: {self.mesh.n_cells}.")
        self._p(
            f" Number of degrees of freedom (velocity/pressure): "
            f"{nu + npp} ({nu} + {npp})."
        )
        # default ostream precision (6), navier_stokes.cc:184
        self._p(
            f" Approximate size last cell: "
            f"{min_cell_diameter / np.sqrt(self.dim):.6g}"
        )

    # ------------------------------------------------------------------
    def apply_boundary_conditions(self) -> None:
        """Write Dirichlet values into the solution at the current time and
        assemble the open-boundary rhs (navier_stokes.cc:1214-1318)."""
        bd = self.boundary
        time = self.time_stepping.now()
        u_space = self.u_space
        # write boundary values in place on the device: only the (small)
        # boundary-dof arrays cross the host boundary, not the full vector
        u = self.solution[0]
        for bid, fn in bd.dirichlet_conditions_u.items():
            dofs = u_space.boundary_dofs(bid)
            if len(dofs) == 0:
                continue
            vals = np.asarray(fn(u_space.node_coords[dofs], time))
            u = u.at[:, jnp.asarray(dofs)].set(jnp.asarray(vals))
        for bid in bd.no_slip:
            dofs = u_space.boundary_dofs(bid)
            if len(dofs):
                u = u.at[:, jnp.asarray(dofs)].set(0.0)
        self.solution[0] = u

        # symmetry/normal-flux dofs that are not covered by a Dirichlet
        # function must read zero in the constrained component
        u_dev = self.solution[0]
        dirichlet_ids = set(bd.dirichlet_conditions_u) | bd.no_slip
        covered = (
            np.unique(
                np.concatenate(
                    [u_space.boundary_dofs(b) for b in dirichlet_ids]
                )
            )
            if dirichlet_ids
            else np.empty(0, dtype=np.int64)
        )
        for c in range(self.dim):
            dd = self.constraints_u[c].dirichlet_dofs
            extra = np.setdiff1d(dd, covered, assume_unique=False)
            if len(extra):
                u_dev = u_dev.at[c, extra].set(0.0)
        # hanging nodes: restore conformity of the solution (their masters
        # may be Dirichlet dofs that were just written)
        if len(self.constraints_u[0].vslave):
            for c in range(self.dim):
                u_dev = u_dev.at[c].set(
                    self.constraints_u[c].distribute_values(u_dev[c])
                )
        self.solution[0] = u_dev
        if len(self.constraints_p.vslave):
            self.solution[1] = self.constraints_p.distribute_values(
                self.solution[1]
            )

        # open-boundary face integrals -> const_rhs (cc:1260-1317): natural
        # traction BC sigma.n = -pbar n gives rhs -(pbar, v.n)_dOmega
        const_u = np.zeros((self.dim, u_space.n_dofs_padded))
        for bid, fn in bd.open_conditions_p.items():
            if hasattr(u_space, "boundary_face_quadrature_normals"):
                # general (curved) faces: rhs_c = -(pbar, v_c n_c)_dOmega
                data = u_space.boundary_face_quadrature_normals(
                    bid, self.parameters.velocity_degree + 1
                )
                if data is None:
                    continue
                face_dofs, qcoords, V_face, jxw, normals = data
                pbar = np.asarray(
                    fn(qcoords.reshape(-1, self.dim), time)
                ).reshape(len(face_dofs), -1)
                for c in range(self.dim):
                    contrib = -np.einsum(
                        "fq,fq,qi,fq->fi", pbar, normals[..., c], V_face, jxw
                    )
                    np.add.at(
                        const_u[c], face_dofs.reshape(-1), contrib.reshape(-1)
                    )
                continue
            for axis, end, face_dofs, qcoords, V_face, jxw in (
                u_space.boundary_face_quadrature(bid, self.parameters.velocity_degree + 1)
            ):
                sign = -1.0 if end == 1 else 1.0
                pbar = np.asarray(
                    fn(qcoords.reshape(-1, self.dim), time)
                ).reshape(len(face_dofs), -1)
                # I[f, i] = sum_q pbar Vq_i jxw
                contrib = sign * np.einsum("fq,qi,q->fi", pbar, V_face, jxw)
                np.add.at(const_u[axis], face_dofs.reshape(-1), contrib.reshape(-1))
        # drop contributions on constrained rows (distribute_local_to_global)
        for c in range(self.dim):
            const_u[c, self.constraints_u[c].constrained_dofs] = 0.0
        n_p_pad = (
            self.operator.n_p_padded
            if self.parameters.augmented_taylor_hood
            else self.p_space.n_dofs_padded
        )
        self.const_rhs = [jnp.asarray(const_u), jnp.zeros(n_p_pad)]

    # ------------------------------------------------------------------
    def init_time_advance(self, print_time_info: bool = True) -> None:
        assert self.system_is_setup, "System has not yet been set up!"
        ts = self.time_stepping
        ts.next()

        f1, f2 = ts.extrapolation_factors
        n_blocks = 1 if self.parameters.linearization == Linearization.projection else 2
        cur = self.solution[:n_blocks]
        old = self.solution_old[:n_blocks]
        old_old = self.solution_old_old[:n_blocks]
        new_cur, new_old, new_old_old = self._extrapolate_fn(
            cur, old, old_old, jnp.float64(f1), jnp.float64(f2)
        )
        for b in range(n_blocks):
            self.solution[b] = new_cur[b]
            self.solution_old[b] = new_old[b]
            self.solution_old_old[b] = new_old_old[b]

        if self.parameters.linearization == Linearization.projection:
            self._projection_pressure_extrapolation()

        if print_time_info and self.parameters.output_verbosity > 0:
            self._p(
                f"\nTime step #{ts.step_no()}, advancing from t_n-1 = "
                f"{fmt_g(ts.previous())} to t = {fmt_g(ts.now())} "
                f"(dt = {fmt_g(ts.step_size())}). "
            )
        # section name matches the reference's TimerOutput scope
        # (navier_stokes.cc "NS apply boundary conditions.") so the
        # `output wall times` summary is comparable line-for-line
        with self.timer.section("NS apply boundary conditions."):
            self.apply_boundary_conditions()

    def _projection_pressure_extrapolation(self) -> None:
        """p* = p + 4/3 phi^n - 1/3 phi^{n-1} bookkeeping
        (navier_stokes.cc:688-719); solution_update[1] temporarily holds
        p^n."""
        ts = self.time_stepping
        if ts.step_no() > 1:
            w, wo, woo = ts.weight(), ts.weight_old(), ts.weight_old_old()
            cur = self.solution[1]
            old = self.solution_old[1]  # holds phi^n (the Poisson update)
            old_old = self.solution_old_old[1]  # phi^{n-1}
            tmp = cur - (wo / w) * old - (woo / w) * old_old
            self.solution_old_old[1] = old
            self.solution_update[1] = cur
            self.solution[1] = tmp
        elif ts.step_no() == 1:
            z = jnp.zeros_like(self.solution[1])
            self.solution_old[1] = z
            self.solution_old_old[1] = z
            self.solution_update[1] = self.solution[1]

    # ------------------------------------------------------------------
    def advance_time_step(self):
        self.init_time_advance()
        result = self.evaluate_time_step()
        # per-component statistics block every 10 steps under output_memory
        # (navier_stokes.cc:1081-1154; stripped from golden comparisons)
        if (
            self.parameters.output_memory
            and self.time_stepping.step_no() % 10 == 1
        ):
            self.measure_kernel_statistics()
            self.statistics.print_block(self.out or sys.stdout)
        return result

    def measure_kernel_statistics(self, reps: int = 3) -> dict:
        """Per-kernel wall-time counters (get_matvec_statistics +  the
        preconditioner's 5-slot timers, navier_stokes_matrix.cc:1194-1206,
        ns_prec.h:127-145). Jitted solver loops hide individual applies, so
        the compiled kernels are timed directly on the CURRENT state
        (block_until_ready, best of `reps`) and scaled by the recorded
        Krylov mat-vec counts — the TPU-native analog of the reference's
        accumulated timers. Feeds the '-- Statistics --' block."""
        import time as _time

        import jax as _jax

        if self._prec_state is None:
            self.build_preconditioner()
        op = self.operator
        st = self._prec_state
        tw = TimeWeights.from_time_stepping(self.time_stepping)
        lin = self._last_lin
        u = self.solution[0]
        p = self.solution[1]
        zp = jnp.zeros_like(p)
        prec = self.preconditioner
        u_robust = getattr(self, "_u_robust", False)

        kernels = {
            "mat-vec": _jax.jit(
                lambda u, p: op.vmult(u, p, tw, lin, st.coeffs)
            ),
            "velocity": _jax.jit(
                lambda u, p: op.velocity_vmult(u, tw, lin, st.coeffs)
            ),
            "div matrix": _jax.jit(
                lambda u, p: op.divergence_vmult_add(zp, u, coeffs=st.coeffs)
            ),
            "pres mass": _jax.jit(
                lambda u, p: op.pressure_mass_vmult(p, st.mass_coefficient)
            ),
            "pres Poiss": _jax.jit(
                lambda u, p: op.pressure_poisson_vmult(
                    p,
                    jnp.where(st.inv_rho_weight > 0, st.inv_rho_weight, 1.0),
                    Coefficients(),
                    self.constraints_schur,
                )
            ),
            "full prec": _jax.jit(
                lambda u, p: prec.apply(st, (u, p), tw, False, u_robust)
            ),
        }
        calls = max(self.statistics.counters["mat-vec"][0], 1)
        # chain many applies inside ONE jit and force a scalar readback:
        # dispatch overhead on tunneled TPU hosts is tens of ms per call and
        # block_until_ready alone does not reliably wait (see bench.py)
        chain = int(os.environ.get("ADAFLO_KERNEL_STAT_CHAIN", "20"))
        measured = {}
        if op.pr_active(lin, st.coeffs):
            # the production Krylov loop is parity-RESIDENT (solve_fn): time
            # the mat-vec the way the solver runs it — iterate packed across
            # applies, one fused kernel each, no per-apply relayout
            try:

                def chained_pr(u0, p0):
                    x = op.pr_pack(u0, p0)
                    ct, has = op.pr_coeff_stream(st.coeffs)

                    def body(i, x):
                        r = op.vmult_pr(x, tw, lin, ct=ct, has=has)
                        s = 1.0 / jnp.maximum(
                            jnp.sqrt(jnp.mean(r * r)), 1e-30
                        )
                        return r * s

                    x = _jax.lax.fori_loop(0, chain, body, x)
                    return jnp.sum(x)

                cfp = _jax.jit(chained_pr)
                float(cfp(u, p))
                best = float("inf")
                for _ in range(reps):
                    t0 = _time.perf_counter()
                    float(cfp(u, p))
                    best = min(best, _time.perf_counter() - t0)
                measured["mat-vec"] = best / chain
                rec = self.statistics.counters["mat-vec"]
                rec[0] = calls
                rec[1] = measured["mat-vec"] * calls
                del kernels["mat-vec"]
            except Exception:
                pass
        for name, fn in kernels.items():
            try:

                def chained(u0, p0, fn=fn):
                    def body(i, carry):
                        out = fn(carry[0], carry[1])
                        o = out[0] if isinstance(out, tuple) else out
                        s = 1.0 / jnp.maximum(
                            jnp.sqrt(jnp.mean(o * o)), 1e-30
                        )
                        if isinstance(out, tuple):
                            return (out[0] * s, out[1] * s)
                        ou = out * s
                        return (
                            (ou, carry[1]) if ou.shape == carry[0].shape
                            else (carry[0], ou)
                        )

                    ru, rp = _jax.lax.fori_loop(0, chain, body, (u0, p0))
                    return jnp.sum(ru) + jnp.sum(rp)

                cf = _jax.jit(chained)
                float(cf(u, p))  # compile + warmup
                best = float("inf")
                for _ in range(reps):
                    t0 = _time.perf_counter()
                    float(cf(u, p))
                    best = min(best, _time.perf_counter() - t0)
                measured[name] = best / chain
                rec = self.statistics.counters[name]
                rec[0] = calls
                rec[1] = measured[name] * calls
            except Exception:
                continue
        return measured

    def evaluate_time_step(self):
        initial_residual = self.compute_initial_residual()
        try:
            return self.solve_nonlinear_system(initial_residual)
        except ExcNavierStokesNoConvergence:
            self._p("Warning: nonlinear iteration did not converge!")
            return (0, 0)

    # ------------------------------------------------------------------
    def compute_residual(self, precomputed=None) -> float:
        par = self.parameters
        if precomputed is not None:
            # a caller (e.g. the fused two-phase force+residual dispatch)
            # already ran _residual_fn; keep the bookkeeping and printing
            ru, rp, lin, res_u, res_p = precomputed
        else:
            ex = self.time_stepping.extrapolation_factors
            tw = TimeWeights.from_time_stepping(self.time_stepping)
            ru, rp, lin, res_u, res_p = self._residual_fn(
                self.solution[0],
                self.solution[1],
                self.solution_old[0],
                self.solution_old_old[0],
                tw,
                self.const_rhs[0],
                self.const_rhs[1],
                self.user_rhs[0],
                self.user_rhs[1],
                self.coefficients,
                (jnp.float64(ex[0]), jnp.float64(ex[1])),
            )
        self.system_rhs = [ru, rp]
        self._last_lin = lin
        # one coalesced device->host round trip (the tunnel pays per
        # blocking readback, not per value)
        res_u, res_p = (float(v) for v in jax.device_get((res_u, res_p)))
        res = float(np.sqrt(res_u**2 + res_p**2))
        v = par.output_verbosity
        if v == 1:
            self._p(f"[{fmt_g(res)}", end="")
        elif v == 2:
            self._p(f"   {res:<12.3e} ", end="")
        elif v == 3:
            self._p(f"   {res_u:<11.3e} {res_p:<12.3e} ", end="")
        return res

    def compute_initial_residual(self, precomputed=None) -> float:
        v = self.parameters.output_verbosity
        if v == 1:
            self._p("  Residual/iterations: ", end="")
        elif v == 2:
            self._p(
                "\n   Nonlin Res     Prec Upd     Increment   Lin Iter     Lin Res"
                "\n   ____________________________________________________________"
            )
        elif v == 3:
            self._p(
                "\n   NL Resid u  NL Resid p     Prec Upd     Increm u   Increm p"
                "   Lin Iter     Lin Res"
                "\n   _______________________________________________________________"
                "___________________"
            )
        return self.compute_residual(precomputed)

    # ------------------------------------------------------------------
    def build_preconditioner(self) -> None:
        tw = TimeWeights.from_time_stepping(self.time_stepping)
        self._prec_state = self._compute_prec_fn(
            tw, self._last_lin, self.coefficients
        )
        # convection-dominated velocity blocks defeat the real-interval
        # Chebyshev; switch its apply to Jacobi-GMRES (the reference's ILU
        # keeps working there, ns_prec.cc:594-665 — this is our analog)
        growth = self._prec_state.u_cheb_growth
        self._u_robust = bool(float(growth) > 1.0) if growth is not None else False
        v = self.parameters.output_verbosity
        # label by the user's preconditioner selection, with the reference's
        # spelling (navier_stokes.cc:536-547) — the TPU-native realization
        # behind it (GMG / Chebyshev / Jacobi-GMRES) is an implementation
        # detail of the same prm option
        label = {
            VelocityPreconditioner.u_ilu: "ILU ",
            VelocityPreconditioner.u_ilu_scalar: "ILUs",
            VelocityPreconditioner.u_amg: "AMG ",
            VelocityPreconditioner.u_amg_linear: "AMGl",
        }[self.parameters.precondition_velocity]
        if v == 1:
            self._p(f"/{label.strip()}", end="")
        elif v >= 2:
            self._p(f"    {label}   ", end="")

    def solve_system(self, linear_tolerance: float, with_residual: bool = False):
        """Two-stage linear solve (navier_stokes.cc:559-653): cheap
        preconditioner first, then inner solves under FGMRES. The projection
        scheme dispatches to the fractional-step solve (cc:563-565).

        `with_residual` fuses the post-update nonlinear residual into the
        same dispatch (consumed via compute_residual(precomputed=...))."""
        import time as _time

        _t0 = _time.perf_counter()
        par = self.parameters
        tw = TimeWeights.from_time_stepping(self.time_stepping)
        rhs_u, rhs_p = self.system_rhs
        self._solved_residual = None
        self._solved_upd_norms = None
        if par.linearization == Linearization.projection:
            du, dp, phi, iters, res = self._solve_projection_fn(
                rhs_u, self.solution[0], tw, self._prec_state, self._last_lin
            )
            self.solution_update[0] = du
            self.solution_update[1] = dp
            # solution_old[1] stores phi^{n+1} for the next extrapolation
            # (the reference passes solution_old.block(1) as the projection
            # update buffer, navier_stokes.cc:563-565)
            self.solution_old[1] = phi
            self._solved_solution = None
            iters, res = jax.device_get((iters, res))
            return int(iters), float(res)
        tol = jnp.float64(linear_tolerance)
        cheap_iters = min(par.iterations_before_inner_solvers, par.max_lin_iteration)
        u_robust = getattr(self, "_u_robust", False)
        stage2 = max(
            par.max_lin_iteration - par.iterations_before_inner_solvers, 0
        ) or par.max_lin_iteration

        def _stage(do_inner, max_iter):
            if with_residual:
                ex = self.time_stepping.extrapolation_factors
                (du, dp, u_new, p_new, ru, rp, lin2, it, lr, conv, res_u,
                 res_p, upd_u, upd_p) = self._solve_res_fn(
                    rhs_u, rhs_p, self.solution[0], self.solution[1],
                    self.solution_old[0], self.solution_old_old[0], tw,
                    self._prec_state, self._last_lin, tol,
                    self.const_rhs[0], self.const_rhs[1],
                    self.user_rhs[0], self.user_rhs[1], self.coefficients,
                    (jnp.float64(ex[0]), jnp.float64(ex[1])),
                    do_inner, max_iter, u_robust,
                )
                it, lr, conv, res_u, res_p, upd_u, upd_p = jax.device_get(
                    (it, lr, conv, res_u, res_p, upd_u, upd_p)
                )
                self._solved_residual = (
                    ru, rp, lin2, float(res_u), float(res_p)
                )
                self._solved_upd_norms = (float(upd_u), float(upd_p))
            else:
                du, dp, u_new, p_new, it, lr, conv = self._solve_fn(
                    rhs_u, rhs_p, self.solution[0], self.solution[1], tw,
                    self._prec_state, self._last_lin, tol, do_inner,
                    max_iter, u_robust,
                )
                it, lr, conv = jax.device_get((it, lr, conv))
            return du, dp, u_new, p_new, int(it), float(lr), bool(conv)

        du, dp, u_new, p_new, iters, residual, conv = _stage(False, cheap_iters)
        if not conv:
            # second stage with inner solves (navier_stokes.cc:588-641). The
            # reference enters it after `iterations_before_inner_solvers`;
            # when the config leaves no room for it (its relies on ILU
            # strength we replace matrix-free), retry with inner solves for
            # the full budget — our analog of that ILU robustness.
            du, dp, u_new, p_new, it2, residual, conv = _stage(True, stage2)
            iters += it2
        self.solution_update[0] = du
        self.solution_update[1] = dp
        self._solved_solution = (u_new, p_new)
        self.statistics.add("lin solver", _time.perf_counter() - _t0)
        self.statistics.add("mat-vec", 0.0, max(iters, 1))
        return iters, residual

    # ------------------------------------------------------------------
    def solve_nonlinear_system(self, initial_residual: float):
        with self.timer.section("NS solve system."):
            return self._solve_nonlinear_system(initial_residual)

    def _solve_nonlinear_system(self, initial_residual: float):
        par = self.parameters
        ts = self.time_stepping
        step = 0
        n_tot_iterations = 0
        premature_update = False
        res = initial_residual

        if (
            self._newton_loop_fn is not None
            and par.physical_type != PhysicalType.incompressible_stationary
            and os.environ.get("ADAFLO_FUSED_NEWTON", "1") != "0"
        ):
            return self._solve_nonlinear_fused(initial_residual)

        if par.linearization == Linearization.projection:
            # restore the actual p^n (navier_stokes.cc:840-842)
            self.solution[1], self.solution_update[1] = (
                self.solution_update[1],
                self.solution[1],
            )

        coupled = par.linearization in (
            Linearization.coupled_implicit_newton,
            Linearization.coupled_implicit_picard,
        )

        while step < par.max_nl_iteration:
            # linear tolerance policy (cc:851-868)
            linear_tolerance = par.tol_lin_iteration
            if par.rel_lin_iteration:
                if (
                    res * par.tol_lin_iteration < 0.5 * par.tol_nl_iteration
                    or not coupled
                ):
                    linear_tolerance = 0.5 * par.tol_nl_iteration
                else:
                    linear_tolerance = min(
                        par.tol_lin_iteration * res, par.tol_lin_iteration
                    )

            if step == 0 and self.update_preconditioner:
                self.build_preconditioner()
            elif (
                not premature_update
                and ts.step_no() > 1
                and n_tot_iterations > 1.5 * self.n_iterations_last_prec_update
            ) or (
                par.physical_type == PhysicalType.incompressible_stationary
                and step % 6 == 1
            ):
                self.build_preconditioner()
                premature_update = True
            elif par.output_verbosity >= 2:
                self._p("    ---    ", end="")

            iters, lin_res = self.solve_system(
                linear_tolerance, with_residual=coupled
            )
            solved = getattr(self, "_solved_solution", None)
            if solved is not None:
                # standard path: the update was added in-solve
                self.solution[0], self.solution[1] = solved
                self._solved_solution = None
            else:
                self.solution[0] = self.solution[0] + self.solution_update[0]
                self.solution[1] = self.solution[1] + self.solution_update[1]
            n_tot_iterations += iters

            v = par.output_verbosity
            upd_norms = getattr(self, "_solved_upd_norms", None)
            if v == 1:
                self._p(f"/{iters}] ", end="")
            elif v == 2:
                if upd_norms is not None:
                    norm = float(np.sqrt(upd_norms[0] ** 2 + upd_norms[1] ** 2))
                else:
                    norm = float(
                        jnp.sqrt(
                            jnp.sum(self.solution_update[0] ** 2)
                            + jnp.sum(self.solution_update[1] ** 2)
                        )
                    )
                self._p(f"    {norm:<5.2e}     {iters:4d}       {lin_res:<5.2e}")
            elif v == 3:
                if upd_norms is not None:
                    iu, ip = upd_norms
                else:
                    iu, ip = (
                        float(x)
                        for x in jax.device_get(
                            (
                                jnp.sqrt(jnp.sum(self.solution_update[0] ** 2)),
                                jnp.sqrt(jnp.sum(self.solution_update[1] ** 2)),
                            )
                        )
                    )
                self._p(
                    f"    {iu:<5.2e}   {ip:<5.2e}    {iters:4d}       {lin_res:<5.2e}"
                )

            step += 1
            if not coupled:
                if v == 1:
                    self._p(f"[{fmt_g(lin_res)}/conv.]")
                elif v >= 2:
                    self._p("")
                break

            res = self.compute_residual(
                precomputed=getattr(self, "_solved_residual", None)
            )
            self._solved_residual = None
            if res < par.tol_nl_iteration:
                if v == 1:
                    self._p("/conv.]")
                elif v >= 2:
                    self._p(" converged.\n")
                break

        return self._newton_tail(step, n_tot_iterations, premature_update)

    def _newton_tail(
        self, step: int, n_tot_iterations: int, premature_update: bool
    ):
        """Shared post-Newton bookkeeping: preconditioner refresh policy
        (navier_stokes.cc:941-971), pressure fix shift, projection open-BC
        pressure values."""
        par = self.parameters
        ts = self.time_stepping
        # preconditioner refresh bookkeeping (cc:941-971)
        if (
            self.update_preconditioner_frequency > 0
            and ts.step_no() % (50 * self.update_preconditioner_frequency) == 0
        ):
            self.update_preconditioner_frequency = 0
        if self.update_preconditioner:
            self.n_iterations_last_prec_update = n_tot_iterations
            self.time_step_last_prec_update = ts.step_no()
            self.update_preconditioner = False
        if n_tot_iterations > 1.2 * self.n_iterations_last_prec_update:
            if (
                premature_update
                or n_tot_iterations > 2 * self.n_iterations_last_prec_update
            ):
                self.update_preconditioner_frequency = (
                    ts.step_no() - self.time_step_last_prec_update
                )
            self.update_preconditioner = True
        if (
            self.time_step_last_prec_update < 3 and ts.step_no() > 14
        ) or ts.step_no() < 2:
            self.update_preconditioner = True
        if (
            not self.update_preconditioner
            and not premature_update
            and self.update_preconditioner_frequency > 0
            and ts.step_no() + 1 - self.time_step_last_prec_update
            >= self.update_preconditioner_frequency
        ):
            self.update_preconditioner = True

        if step == par.max_nl_iteration and par.output_verbosity == 1:
            self._p("]")

        self._apply_pressure_fix_shift()

        # for projection, open boundaries carry pressure Dirichlet values
        # (navier_stokes.cc:1046-1076)
        if (
            self.boundary.open_conditions_p
            and par.linearization == Linearization.projection
        ):
            p = np.asarray(self.solution[1]).copy()
            for bid, fn in self.boundary.open_conditions_p.items():
                dofs = self.p_space.boundary_dofs(bid)
                if len(dofs):
                    p[dofs] = np.asarray(
                        fn(self.p_space.node_coords[dofs], ts.now())
                    )
            self.solution[1] = jnp.asarray(p)
        return (step, n_tot_iterations)

    def _solve_nonlinear_fused(self, initial_residual: float):
        """Coupled Newton/Picard via the fused on-device loop: ONE dispatch
        + one coalesced readback per preconditioner epoch (usually one per
        time step) instead of one per Newton iteration. The host only
        (re)builds the preconditioner between epochs, replays the residual
        table from the returned per-iteration history, and runs the same
        staleness bookkeeping as the step-by-step path
        (navier_stokes.cc:833-971)."""
        import time as _time

        par = self.parameters
        ts = self.time_stepping
        v = par.output_verbosity
        res = float(initial_residual)
        step = 0
        n_tot_iterations = 0
        premature_update = False

        if self.update_preconditioner:
            self.build_preconditioner()
        elif v >= 2:
            self._p("    ---    ", end="")

        tw = TimeWeights.from_time_stepping(ts)
        ex = ts.extrapolation_factors
        rdt = self.system_rhs[0].dtype

        def _res_fragment(r, r_u, r_p):
            if v == 1:
                self._p(f"[{fmt_g(r)}", end="")
            elif v == 2:
                self._p(f"   {r:<12.3e} ", end="")
            elif v == 3:
                self._p(f"   {r_u:<11.3e} {r_p:<12.3e} ", end="")

        while True:
            if premature_update or ts.step_no() <= 1:
                stale_budget = float("inf")
            else:
                stale_budget = (
                    1.5 * self.n_iterations_last_prec_update
                    - n_tot_iterations
                )
            remaining = par.max_nl_iteration - step
            _t0 = _time.perf_counter()
            (u_new, p_new, ru, rp, lin, res_dev, du, dp, k, tot, hist) = (
                self._newton_loop_fn(
                    self.solution[0], self.solution[1],
                    self.system_rhs[0], self.system_rhs[1], self._last_lin,
                    jnp.asarray(res, rdt), tw, self._prec_state,
                    self.const_rhs[0], self.const_rhs[1],
                    self.user_rhs[0], self.user_rhs[1], self.coefficients,
                    (jnp.float64(ex[0]), jnp.float64(ex[1])),
                    self.solution_old[0], self.solution_old_old[0],
                    jnp.asarray(stale_budget, rdt), jnp.int32(remaining),
                    u_robust=getattr(self, "_u_robust", False),
                )
            )
            # one coalesced readback per epoch
            k, tot, res, hist_h = jax.device_get((k, tot, res_dev, hist))
            self.statistics.add("lin solver", _time.perf_counter() - _t0)
            k, tot, res = int(k), int(tot), float(res)
            if k > 0:
                self.solution[0], self.solution[1] = u_new, p_new
                self.system_rhs = [ru, rp]
                self._last_lin = lin
                self.solution_update[0] = du
                self.solution_update[1] = dp
            its, lrs, upd_us, upd_ps, ress, res_us, res_ps = (
                np.asarray(h) for h in hist_h
            )
            for i in range(k):
                if i > 0:
                    _res_fragment(
                        float(ress[i - 1]),
                        float(res_us[i - 1]),
                        float(res_ps[i - 1]),
                    )
                    if v >= 2:
                        self._p("    ---    ", end="")
                self.statistics.add("mat-vec", 0.0, max(int(its[i]), 1))
                if v == 1:
                    self._p(f"/{int(its[i])}] ", end="")
                elif v == 2:
                    norm = float(np.sqrt(upd_us[i] ** 2 + upd_ps[i] ** 2))
                    self._p(
                        f"    {norm:<5.2e}     {int(its[i]):4d}       "
                        f"{float(lrs[i]):<5.2e}"
                    )
                elif v == 3:
                    self._p(
                        f"    {float(upd_us[i]):<5.2e}   "
                        f"{float(upd_ps[i]):<5.2e}    {int(its[i]):4d}       "
                        f"{float(lrs[i]):<5.2e}"
                    )
            step += k
            n_tot_iterations += tot
            if k > 0:
                _res_fragment(
                    float(ress[k - 1]),
                    float(res_us[k - 1]),
                    float(res_ps[k - 1]),
                )
            if k > 0 and res < par.tol_nl_iteration:
                if v == 1:
                    self._p("/conv.]")
                elif v >= 2:
                    self._p(" converged.\n")
                break
            if step >= par.max_nl_iteration:
                break
            # the staleness heuristic tripped (or the budget was already
            # exhausted): rebuild and re-enter, exactly the step-by-step
            # path's premature update (cc:869-880)
            self.build_preconditioner()
            premature_update = True

        return self._newton_tail(step, n_tot_iterations, premature_update)

    # ------------------------------------------------------------------
    def adapt_mesh(self, flags: np.ndarray) -> bool:
        """Adapt the forest (+1 refine / -1 coarsen / 0 keep per cell),
        rebuild the discretization and transfer all solution vectors by
        nodal interpolation — the counterpart of the reference's
        refine_grid + SolutionTransfer round-trip
        (two_phase_base_algorithm.cc / navier_stokes.cc refine_grid).
        Returns False if the flags change nothing."""
        assert self.is_forest, "adapt_mesh requires a ForestMesh"
        from adaflo_tpu.fe.forest_transfer import ForestFunction

        flags = np.asarray(flags, dtype=np.int8)
        if not flags.any():
            return False
        snap_u = ForestFunction(self.u_space)
        snap_p = ForestFunction(self.p_space)

        def _dist_u(v):
            v = np.asarray(v)
            return np.stack(
                [
                    np.asarray(
                        self.constraints_u[c].distribute_values(jnp.asarray(v[c]))
                    )
                    for c in range(self.dim)
                ]
            )

        augmented = self.parameters.augmented_taylor_hood
        n_p_q = self.p_space.n_dofs
        E_old = self.mesh.n_cells
        old_vectors = []
        for block in (
            self.solution,
            self.solution_old,
            self.solution_old_old,
        ):
            p = np.asarray(block[1])
            pc = p[n_p_q : n_p_q + E_old].copy() if augmented else None
            pq = jnp.asarray(
                np.concatenate(
                    [p[:n_p_q], np.zeros(self.p_space.n_dofs_padded - n_p_q)]
                )
                if augmented
                else p
            )
            old_vectors.append(
                (
                    _dist_u(block[0]),
                    np.asarray(self.constraints_p.distribute_values(pq)),
                    pc,
                )
            )
        # note: user_rhs is zeroed by the re-allocation; callers with
        # persistent body forces must reassemble it after adapt_mesh
        self.mesh.adapt(flags)
        self._setup_discretization()
        # re-allocate on the new sizes and interpolate
        self._allocate_vectors()
        # DG0 constants transfer by containment: each new cell takes the
        # old covering cell's constant (exact on keep + refine; on
        # coarsening, the child containing the new center — the constants
        # only seed the BDF extrapolation history)
        old_of_new = (
            snap_p.locate(self.mesh.cell_geometry()[0]) if augmented else None
        )
        for (u_old, p_old, pc_old), dst in zip(
            old_vectors,
            (self.solution, self.solution_old, self.solution_old_old),
        ):
            u_new = snap_u.evaluate(u_old, self.u_space.node_coords)
            p_new = snap_p.evaluate(p_old, self.p_space.node_coords)
            dst[0] = dst[0].at[:, : self.u_space.n_dofs].set(jnp.asarray(u_new))
            dst[1] = dst[1].at[: self.p_space.n_dofs].set(jnp.asarray(p_new))
            if augmented:
                dst[1] = dst[1].at[
                    self.p_space.n_dofs : self.p_space.n_dofs
                    + self.mesh.n_cells
                ].set(jnp.asarray(pc_old[old_of_new]))
        self._build_jitted()
        self._prec_state = None
        self._last_lin = None
        self.update_preconditioner = True
        return True

    # ------------------------------------------------------------------
    def refine_grid_pressure_based(
        self,
        max_grid_level: int,
        refine_fraction_of_cells: float,
        coarsen_fraction_of_cells: float,
    ) -> np.ndarray:
        """Kelly-style pressure-jump error indicators
        (navier_stokes.cc:1322-1369): per-cell estimate from the jump of the
        pressure normal gradient across interior faces. Returns the
        indicator array; on a forest mesh it marks cells
        (refine_and_coarsen_fixed_number semantics) and ADAPTS the mesh,
        transferring the solution — on the uniform lattice it records
        indicators for diagnostics and is otherwise a no-op."""
        if self.is_forest:
            from adaflo_tpu.fe.forest_estimate import (
                kelly_indicator,
                refine_and_coarsen_fixed_number,
            )

            p_con = self.constraints_p.distribute_values(self.solution[1])
            eta2 = kelly_indicator(
                self.p_space,
                np.asarray(p_con),
                self.parameters.velocity_degree + 2,
            )
            self.last_error_indicators = np.sqrt(eta2)
            flags = refine_and_coarsen_fixed_number(
                self.p_space,
                eta2,
                refine_fraction_of_cells,
                coarsen_fraction_of_cells,
                max_grid_level,
            )
            self.adapt_mesh(flags)
            return self.last_error_indicators
        p = np.asarray(self.solution[1])[: self.p_space.n_dofs]
        lat_shape = tuple(reversed(self.p_space.n_nodes_axis))
        P = p.reshape(lat_shape)
        deg = self.parameters.pressure_degree
        h = self.mesh.h
        cells_shape = tuple(reversed(self.mesh.n_cells_axis))
        eta2 = np.zeros(cells_shape)
        for a in range(self.dim):
            ax = self.dim - 1 - a  # array axis for physical axis a
            # one-sided normal derivatives at the lattice planes between cells
            dP = np.diff(P, axis=ax) / (h[a] / deg)
            # jump at interior cell boundaries: difference of adjacent
            # one-sided slopes at indices multiple of deg
            n_c = self.mesh.n_cells_axis[a]
            bnd = deg * np.arange(1, n_c)
            left = np.take(dP, bnd - 1, axis=ax)
            right = np.take(dP, bnd, axis=ax)
            jump = right - left
            # accumulate h * mean(jump^2) onto both adjacent cells:
            # project node values onto cells along the non-split axes
            red = jump**2
            for b in range(self.dim):
                bx = self.dim - 1 - b
                if b == a:
                    continue
                nb = self.mesh.n_cells_axis[b]
                acc = 0.0
                for j in range(deg + 1):
                    idx = deg * np.arange(nb) + j
                    acc = acc + np.take(red, idx, axis=bx)
                red = acc / (deg + 1)
            scale = h[a]
            contrib = np.zeros(cells_shape)
            sl_lo = [slice(None)] * self.dim
            sl_hi = [slice(None)] * self.dim
            sl_lo[ax] = slice(0, n_c - 1)
            sl_hi[ax] = slice(1, n_c)
            contrib[tuple(sl_lo)] += 0.5 * scale * red
            contrib[tuple(sl_hi)] += 0.5 * scale * red
            eta2 += contrib
        self.last_error_indicators = np.sqrt(eta2).reshape(-1)
        return self.last_error_indicators

    # ------------------------------------------------------------------
    def output_solution(self, filename: str, n_subdivisions: int = 0) -> None:
        """vtu/pvd time-series output (flow_base_algorithm.cc:222-279)."""
        if not filename or not self.parameters.print_solution_fields:
            return
        if not self.time_stepping.at_tick(self.parameters.output_frequency):
            return
        from adaflo_tpu.utils.output import TimeSeriesWriter

        if not hasattr(self, "_writer"):
            self._writer = TimeSeriesWriter(filename)
        fields = {
            "velocity": (self.u_space, np.asarray(self.solution[0]), self.dim),
            "pressure": (self.p_space, np.asarray(self.solution[1]), 1),
        }
        n_sub = n_subdivisions or self.parameters.velocity_degree
        self._writer.write(self.mesh, fields, self.time_stepping.now(), n_sub)

    # ------------------------------------------------------------------
    def compute_initial_stokes_field(self) -> None:
        """Divergence-free initial velocity via a Stokes solve when the
        boundary conditions are inconsistent with u = 0
        (navier_stokes.cc:1162-1210)."""
        self.apply_boundary_conditions()
        if float(jnp.linalg.norm(self.solution[0])) == 0:
            return
        par = self.parameters
        saved_type, saved_density = par.physical_type, par.density
        par.physical_type = PhysicalType.stokes
        par.density = 0.0
        saved_coeffs = self.coefficients
        self.coefficients = Coefficients()
        self._build_jitted()
        self.update_preconditioner = True
        if par.output_verbosity > 0:
            self._p("  Compute initial velocity field with Stokes")
        res = self.compute_initial_residual()
        self.solve_nonlinear_system(res)
        par.physical_type, par.density = saved_type, saved_density
        self.coefficients = saved_coeffs
        self._build_jitted()
        self.update_preconditioner = True

    # ------------------------------------------------------------------
    def _apply_pressure_fix_shift(self) -> None:
        """Shift the pressure so the first dof on the pressure-fix boundary
        matches the prescribed value (navier_stokes.cc:984-1044; nodal basis
        makes the FE value at a node equal the dof value)."""
        bd = self.boundary
        if not bd.pressure_fix:
            return
        for bid, fn in bd.pressure_fix.items():
            dofs = self.p_space.boundary_dofs(bid)
            # the shift mode is zero on constrained rows; anchor the shift
            # at an unconstrained dof (hanging slaves follow via distribute)
            dofs = dofs[~self.constraints_p.is_constrained[dofs]]
            if len(dofs) == 0:
                continue
            dof = int(dofs[0])
            x = self.p_space.node_coords[dof : dof + 1]
            target = (
                float(np.asarray(fn(x, self.time_stepping.now()))[0])
                if fn is not None
                else 0.0
            )
            shift = target - float(self.solution[1][dof])
            p = self.operator.apply_pressure_shift(
                jnp.float64(shift), self.solution[1]
            )
            if len(self.constraints_p.vslave):
                # restore hanging conformity: the shift mode excludes
                # constrained rows
                p = self.constraints_p.distribute_values(p)
            self.solution[1] = p
            return


def fmt_g(x: float) -> str:
    """C++ ostream precision(3) general formatting."""
    s = f"{x:.3g}"
    if "e" in s:
        mant, ex = s.split("e")
        return f"{mant}e{int(ex):+03d}"
    return s
