"""Matrix-BASED conservative level-set (OKZ) solver variant.

TPU-native counterpart of the reference's LevelSetOKZMatrixSolver
(/root/reference/source/level_set_okz_matrix.cc, selected with
`two-phase method = level set okz matrix`). The variant differs from the
matrix-free OKZ solver in its *numerics*, not just its data structures:

- advance_concentration (level_set_okz_matrix.cc:373-612): convection
  integrated by parts (-(u.grad eta, c)), stabilized ALWAYS — entropy
  viscosity (compute_viscosity, :320-368, the Guermond-Popov form with
  alpha=1) by default, SUPG (Bazilevs tau, :502-546) under
  `convection stabilization`; BiCGStab with tol max(1e-11 |rhs|,
  0.02 tol_nl) (:589-600).
- compute_normal (:613-713): damping 4 (eps_used/eps)^2 (NO mesh-size
  term), cached via `normal_calculated` — compute_normal(fast=True) is a
  no-op until a reinit step invalidates it (:618, :1105); CG tol
  1e-10 |rhs|.
- compute_curvature (:722-846): rhs (grad eta . n_hat) integrated by parts,
  q-point normalization with the 1e-8/x1e8 rule (:779-784), damping
  0.5 (eps_used/eps)^2, CG tol 1e-6 |rhs|.
- reinitialize (:909-1110): real pseudo-time stepping with
  dtau = 0.3 min(eps_used/eps, dt) (:931), the nodal normal re-evaluated
  at every step (not frozen) and refreshed by compute_normal(true) every
  8 stabilization steps (:936), per-cell diffusion
  max(eps_used, diameter/sqrt(dim)) (:976-977), per-cell compression
  disable when sum_q |phi^2-1| < 1e-10 (:988-1005), CG tol
  max(0.02 tol_nl, 1e-6 |rhs|) (:1083-1086), early exit |update| < 1e-6.
- compute_force (:97-302): Crank-Nicolson tau1/tau2 blending of the
  curvature and of the surface-tension gradient source with the old time
  level (:66-67, :135-189). For BDF-2 (tau2 = 0) this reduces to the
  matrix-free force.

The reference assembles Trilinos matrices + SSOR for each of these solves;
on TPU the same weak forms are applied matrix-free (the assembled-matrix
data structure is the anti-pattern here, not the math) with the lumped-mass
Jacobi / Chebyshev preconditioners standing in for SSOR — iteration counts
differ (and are scrubbed by the test normalizer), residuals and physics are
pinned by tests/golden/rising_bubble_ls_matrix_short.output.

Scope: uniform tensor-product lattices (the mesh family of every two-phase
reference golden); other mesh kinds raise with a clear message.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from adaflo_tpu.ops.navier_stokes import TimeWeights
from adaflo_tpu.parameters import FlowParameters, Scheme
from adaflo_tpu.solvers.krylov import bicgstab, cg
from adaflo_tpu.solvers.preconditioner import ChebyshevPreconditioner
from adaflo_tpu.twophase.level_set_okz import LevelSetOKZSolver, fmtg3


class LevelSetOKZMatrixSolver(LevelSetOKZSolver):
    def __init__(
        self, parameters: FlowParameters, mesh, out=None, pad_dofs_to: int = 1
    ) -> None:
        super().__init__(parameters, mesh, out=out, pad_dofs_to=pad_dofs_to)
        self.normal_calculated = False

    # ------------------------------------------------------------------
    def initialize_data_structures(self) -> None:
        super().initialize_data_structures()
        ops = self.ops
        if ops.is_forest or ops.is_mapped or ops.is_simplex or getattr(
            self.ls_space, "is_extruded", False
        ):
            raise NotImplementedError(
                "'level set okz matrix' is implemented for uniform lattice "
                "meshes; use 'level set okz' on adaptive/unstructured meshes"
            )
        par = self.parameters
        eps_ratio = self.epsilon_used / par.epsilon
        # variant dampings (level_set_okz_matrix.cc:646-649, 750-753); the
        # x16/x4 anisotropic-refinement factors are rejected at parse time
        self._damping_normal = 4.0 * eps_ratio**2
        self._damping_curv = 0.5 * eps_ratio**2
        # cell->diameter() of a uniform lattice cell = |h| (full diagonal)
        mesh = self.ls_space.mesh
        self._cell_diam = float(np.linalg.norm(np.asarray(mesh.h, np.float64)))
        self._omega_diam = float(
            np.linalg.norm(np.asarray(mesh.lengths, np.float64))
        )
        # reinit diffusion: max(eps_used, diameter/sqrt(dim)) (:976-977)
        self._reinit_diff = max(
            self.epsilon_used, self._cell_diam / np.sqrt(mesh.dim)
        )
        self.normal_calculated = False
        self._build_jitted_mx()

    # ------------------------------------------------------------------
    def _build_jitted_mx(self) -> None:
        ops = self.ops
        par = self.parameters
        dim = self.mesh.dim
        ev = ops.ev_ls
        evu = ops.ev_u_lsq
        con = ops.con_ls
        supg = bool(getattr(par, "convection_stabilization", False))
        inv_h2 = jnp.asarray(
            1.0 / np.asarray(self.ls_space.mesh.h, np.float64) ** 2
        )

        def gather_u(u):
            return jnp.stack(
                [ops.lat_u.gather(u[d]) for d in range(dim)], axis=1
            )

        # -- advance_concentration (:373-612) ---------------------------
        @jax.jit
        def advect_mx_fn(c, c_old, c_old_old, u, u_old, u_old_old, tw,
                         old_dt, gmax_vel):
            cc = ops._gather_ls(c)
            co = ops._gather_ls(c_old)
            coo = ops._gather_ls(c_old_old)
            c_val = ev.values(cc)
            c_grad = ev.gradients(cc)
            co_val = ev.values(co)
            coo_val = ev.values(coo)
            u_val = evu.values(gather_u(u))  # (E, dim, n_q)

            old_value = -tw.weight_old * co_val - tw.weight_old_old * coo_val

            if supg:
                # Bazilevs tau (:502-546); G = J^-T J^-1 = diag(1/h^2)
                uGu = jnp.einsum("edq,d,edq->eq", u_val, inv_h2, u_val)
                tau_stab = 1.0 / jnp.sqrt(4.0 * tw.weight**2 + uGu)
                nu_art = None
            else:
                # entropy viscosity (:320-368, alpha=1, beta=0.02 dim)
                co_grad = ev.gradients(co)
                coo_grad = ev.gradients(coo)
                uo_val = evu.values(gather_u(u_old))
                uoo_val = evu.values(gather_u(u_old_old))
                u_half = 0.5 * (uo_val + uoo_val)
                dt_safe = jnp.maximum(jnp.asarray(old_dt, c_val.dtype), 1e-30)
                resid = jnp.abs(
                    (co_val - coo_val) / dt_safe
                    + jnp.einsum(
                        "edq,edq->eq", u_half, 0.5 * (co_grad + coo_grad)
                    )
                )
                max_res = jnp.max(resid, axis=-1)  # (E,)
                max_vel = jnp.max(
                    jnp.sqrt(jnp.sum(u_half * u_half, axis=1)), axis=-1
                )
                c_R = 2.0 ** (2.0 / dim)
                global_scaling = (
                    c_R * gmax_vel * 2.0 / self._omega_diam
                )
                beta_ev = 0.02 * dim
                nu_cell = beta_ev * max_vel * jnp.minimum(
                    self._cell_diam,
                    self._cell_diam
                    * max_res
                    / jnp.maximum(global_scaling, 1e-300),
                )
                # degenerate-transport guard (:335-336)
                nu_art = jnp.where(
                    (gmax_vel < 1e-5) | (old_dt < 1e-10),
                    1e-2 * self._cell_diam * jnp.abs(gmax_vel),
                    nu_cell,
                )
                tau_stab = None

            # rhs (explicit residual): (eta, old_value - w c) + (u.grad eta) c
            # [+ SUPG test extension] (:529-545, :565-575)
            if supg:
                # SUPG rhs: (eta + tau u.grad eta, old_value); the reference
                # keeps the current-solution residual off the rhs (TODO in
                # :541) so the system solves for the full new value minus
                # the BDF history — reproduce exactly: solve for increment
                # against current c via the matrix form below
                r_cells = ev.integrate_values(
                    old_value - tw.weight * c_val
                    - jnp.einsum("edq,edq->eq", u_val, c_grad)
                ) + ev.integrate_gradients(
                    u_val
                    * (
                        tau_stab
                        * (
                            old_value
                            - tw.weight * c_val
                            - jnp.einsum("edq,edq->eq", u_val, c_grad)
                        )
                    )[:, None, :]
                )
            else:
                r_cells = ev.integrate_values(
                    old_value - tw.weight * c_val
                ) + ev.integrate_gradients(u_val * c_val[:, None, :])
            rhs = ops._scatter_ls(r_cells, con)
            rhs_norm = jnp.sqrt(jnp.vdot(rhs, rhs).real)
            abs_tol = jnp.maximum(
                1e-11 * rhs_norm, 0.02 * par.tol_nl_iteration
            )

            def A(dc):
                dcc = ops._gather_ls(dc, con)
                val = ev.values(dcc)
                grad = ev.gradients(dcc)
                if supg:
                    u_res = (
                        jnp.einsum("edq,edq->eq", u_val, grad)
                        + tw.weight * val
                    )
                    r = ev.integrate_values(tw.weight * val) + (
                        ev.integrate_gradients(
                            u_val * (-val + tau_stab * u_res)[:, None, :]
                        )
                    )
                else:
                    r = ev.integrate_values(tw.weight * val) + (
                        ev.integrate_gradients(
                            -u_val * val[:, None, :]
                            + nu_art[:, None, None] * grad
                        )
                    )
                out = ops._scatter_ls(r, con)
                cd = con.constrained_dofs
                if len(cd):
                    out = out.at[cd].set(self.mass_diag[cd] * dc[cd])
                return out

            M = lambda r: self.inv_mass_diag * r
            res = bicgstab(A, rhs, None, abs_tol, 600, M=M)
            return res.x, res.iterations, rhs_norm

        self._advect_mx_fn = advect_mx_fn

        # -- compute_normal (:613-713) -----------------------------------
        damping_n = self._damping_normal
        proj_diag_n = ops.projection_diagonal(damping=damping_n)
        from adaflo_tpu.solvers.preconditioner import (
            DiagonalPreconditioner,
            estimate_lambda_max,
        )

        A_n = lambda nv: ops.projection_vmult_block(nv, damping=damping_n)
        dinv_n = DiagonalPreconditioner(
            jnp.broadcast_to(proj_diag_n, (dim,) + proj_diag_n.shape)
        ).inverse
        lam_n = estimate_lambda_max(
            A_n, dinv_n, jnp.zeros((dim, len(proj_diag_n)))
        )

        @jax.jit
        def normal_mx_fn(c, nv0):
            rhs = ops.normal_rhs(c)
            rn = jnp.sqrt(jnp.vdot(rhs, rhs).real)
            cheb = ChebyshevPreconditioner(
                A_n,
                jnp.broadcast_to(proj_diag_n, (dim,) + proj_diag_n.shape),
                lam_n,
                degree=5,
            )
            res = cg(A_n, rhs, jnp.zeros_like(rhs), 1e-10 * rn, 400, M=cheb)
            nv = jnp.stack(
                [ops.con_nrm.distribute(res.x[d]) for d in range(dim)]
            )
            return nv, res.iterations

        self._normal_mx_fn = normal_mx_fn

        # -- compute_curvature (:722-846) ---------------------------------
        damping_c = self._damping_curv
        proj_diag_c = ops.projection_diagonal(damping=damping_c)
        A_c = lambda k: ops.projection_vmult_scalar(k, damping=damping_c)
        dinv_c = DiagonalPreconditioner(proj_diag_c).inverse
        lam_c = estimate_lambda_max(
            A_c, dinv_c, jnp.zeros_like(proj_diag_c)
        )

        @jax.jit
        def curvature_mx_fn(nv):
            nc = ops._gather_nrm(nv)
            n_val = ev.values(nc)  # (E, dim, n_q)
            norm = jnp.sqrt(jnp.sum(n_val * n_val, axis=1, keepdims=True))
            # :779-784: unit when |n| > 1e-8, else scaled by 1e8
            n_hat = jnp.where(norm > 1e-8, n_val / jnp.maximum(norm, 1e-300),
                              n_val * 1e8)
            rhs = ops._scatter_ls(ev.integrate_gradients(n_hat), ops.con_curv)
            rn = jnp.sqrt(jnp.vdot(rhs, rhs).real)
            cheb = ChebyshevPreconditioner(A_c, proj_diag_c, lam_c, degree=5)
            res = cg(A_c, rhs, jnp.zeros_like(rhs), 1e-6 * rn, 400, M=cheb)
            return ops.con_curv.distribute(res.x), res.iterations

        self._curvature_mx_fn = curvature_mx_fn

        # -- reinitialize step (:940-1095) ---------------------------------
        diffusion = self._reinit_diff

        def reinit_mx_step(c, nv, dtau_inv, diffuse_only):
            cc = ops._gather_ls(c)
            val = ev.values(cc)
            grad = ev.gradients(cc)
            if diffuse_only:
                g_rhs = -diffusion * grad
                compress = None
            else:
                # per-cell compression disable (:988-1005)
                active = (
                    jnp.sum(jnp.abs(val * val - 1.0), axis=-1) >= 1e-10
                )
                nc = ops._gather_nrm(nv)
                n_val = ev.values(nc)
                nn = jnp.sqrt(jnp.sum(n_val * n_val, axis=1, keepdims=True))
                n_hat = n_val / jnp.maximum(nn, 1e-300)
                ngrad = jnp.einsum("edq,edq->eq", n_hat, grad)
                coef = 0.5 * (1.0 - val * val) - diffusion * ngrad
                g_compress = n_hat * coef[:, None, :]
                g_diffuse = -diffusion * grad
                compress = active[:, None, None]
                g_rhs = jnp.where(compress, g_compress, g_diffuse)
            rhs = ops._scatter_ls(ev.integrate_gradients(g_rhs), con)
            rn = jnp.sqrt(jnp.vdot(rhs, rhs).real)
            abs_tol = jnp.maximum(0.02 * par.tol_nl_iteration, 1e-6 * rn)

            def A(dc):
                dcc = ops._gather_ls(dc, con)
                dval = ev.values(dcc)
                dgrad = ev.gradients(dcc)
                if diffuse_only:
                    g = diffusion * dgrad
                else:
                    dn = jnp.einsum("edq,edq->eq", n_hat, dgrad)
                    g = jnp.where(
                        compress,
                        n_hat * (diffusion * dn)[:, None, :],
                        diffusion * dgrad,
                    )
                r = ev.integrate_values(dtau_inv * dval) + (
                    ev.integrate_gradients(g)
                )
                out = ops._scatter_ls(r, con)
                cd = con.constrained_dofs
                if len(cd):
                    out = out.at[cd].set(self.mass_diag[cd] * dc[cd])
                return out

            M = lambda r: self.inv_mass_diag * r
            res = cg(A, rhs, jnp.zeros_like(rhs), abs_tol, 1000, M=M)
            inc = con.distribute(res.x)
            return c + inc, res.iterations, jnp.sqrt(
                jnp.vdot(inc, inc).real
            )

        self._reinit_mx_step_fn = jax.jit(
            reinit_mx_step, static_argnames=("diffuse_only",)
        )

    # -- overrides ---------------------------------------------------------
    def advance_concentration(self) -> None:
        ns = self.navier_stokes
        ts = self.time_stepping
        par = self.parameters
        if self.boundary.fluid_type:
            c = np.asarray(self.solution[0]).copy()
            for bid, fn in self.boundary.fluid_type.items():
                dofs = self.ls_space.boundary_dofs(bid)
                if len(dofs):
                    c[dofs] = np.asarray(
                        fn(self.ls_space.node_coords[dofs], ts.now())
                    )
            self.solution[0] = jnp.asarray(c)
        # built directly (from_time_stepping asserts tau2 == 0, but the LS
        # advance only consumes the BDF weights); old-old only for BDF-2
        # past the first step (:497-499)
        bdf2 = ts.scheme() == Scheme.bdf_2 and ts.step_no() > 1
        tw = TimeWeights(
            jnp.float64(ts.weight()),
            jnp.float64(ts.weight_old()),
            jnp.float64(ts.weight_old_old() if bdf2 else 0.0),
            jnp.float64(ts.tau1()),
        )
        gmax = self.get_maximal_velocity()
        inc, iters, rhs_norm = self._advect_mx_fn(
            self.solution[0],
            self.solution_old[0],
            self.solution_old_old[0],
            ns.solution[0],
            ns.solution_old[0],
            ns.solution_old_old[0],
            tw,
            jnp.float64(max(ts.old_step_size(), 0.0)),
            jnp.float64(gmax),
        )
        inc = self.constraints_ls.distribute(inc)
        self.solution[0] = self.solution[0] + inc
        if not par.do_iteration and par.output_verbosity > 0:
            iters = jax.device_get(iters)
            self._p(
                f"  Concentration advance: advect ({int(iters)})", end=""
            )

    def compute_normal(self, fast: bool) -> None:
        # :618: the nodal normal is cached until a reinit step invalidates it
        if fast and self.normal_calculated:
            return
        if getattr(self.parameters, "approximate_projections", False):
            raise NotImplementedError(
                "'approximate projections' is not implemented (the reference "
                "asserts ExcNotImplemented here too)"
            )
        nv, _ = self._normal_mx_fn(self.solution[0], self.normal_vector_field)
        self.normal_vector_field = nv
        self.normal_calculated = True

    def compute_curvature(self) -> None:
        self.compute_normal(False)
        kappa, _ = self._curvature_mx_fn(self.normal_vector_field)
        if self.parameters.curvature_correction:
            kappa = self._curvature_correction(kappa)
        self.solution[1] = kappa

    def reinitialize(self, stab_steps: int, diff_steps: int = 0) -> None:
        """Pseudo-time-stepping reinitialization (:909-1110)."""
        par = self.parameters
        ts = self.time_stepping
        dtau = 0.3 * min(
            self.epsilon_used / par.epsilon, max(ts.step_size(), 1e-30)
        )
        dtau_inv = 1.0 / dtau
        verbose = not par.do_iteration and par.output_verbosity > 0
        if verbose:
            lead = "  " if ts.now() == ts.start() else " and "
            self._p(f"{lead}reinitialize (", end="")
        first = True
        for tau in range(diff_steps + stab_steps):
            if tau >= diff_steps and (tau - diff_steps) % 8 == 0:
                self.compute_normal(True)
            diffuse_only = tau < diff_steps
            c_new, iters, update_norm = self._reinit_mx_step_fn(
                self.solution[0],
                self.normal_vector_field,
                jnp.float64(dtau_inv),
                diffuse_only,
            )
            self.solution[0] = c_new
            if verbose:
                iters, update_norm = jax.device_get((iters, update_norm))
                tag = f"d{int(iters)}" if diffuse_only else f"{int(iters)}"
                self._p(("" if first else " + ") + tag, end="")
            first = False
            self.normal_calculated = False
            if float(update_norm) < 1e-6:
                break
        if verbose:
            self._p(")")

    def compute_force(self) -> None:
        """Surface-tension force with Crank-Nicolson tau1/tau2 blending of
        the curvature and the gradient source (:66-67, :135-189); for BDF-2
        (tau2 = 0) identical to the matrix-free force."""
        ts = self.time_stepping
        tau1 = ts.tau1() if ts.step_no() > 1 else 1.0
        tau2 = ts.tau2() if ts.step_no() > 1 else 0.0
        if tau2 <= 1e-14:
            super().compute_force()
            return
        from adaflo_tpu.ops.navier_stokes import Coefficients

        self.compute_heaviside()
        self.compute_curvature()
        ns = self.navier_stokes
        from_h = getattr(
            self.parameters, "surface_tension_from_heaviside", True
        )
        if from_h:
            src = self.heaviside
            src_old = self._heaviside_fn(self.solution_old[0])
        else:
            src = 0.5 * (self.solution[0] + 1.0)
            src_old = 0.5 * (self.solution_old[0] + 1.0)
        kappa_blend = tau1 * self.solution[1] + tau2 * self.solution_old[1]
        src_blend = tau1 * src + tau2 * src_old
        user_u, rho_q, mu_q = self._force_fn(src_blend, kappa_blend)
        for c in range(self.mesh.dim):
            user_u = user_u.at[c].set(ns.constraints_u[c].condense(user_u[c]))
        ns.user_rhs[0] = user_u
        if rho_q is not None:
            ns.coefficients = Coefficients(rho_q, mu_q, None)

    # the fused single-dispatch paths encode the matrix-FREE numerics;
    # the variant runs its own sequential pipeline
    def _advance_concentration_and_reinit(self) -> None:
        self.advance_concentration()
        self.reinitialize(self.parameters.n_reinit_steps)

    def _fused_force_and_initial_residual(self) -> float:
        self.compute_force()
        return self.navier_stokes.compute_initial_residual()
