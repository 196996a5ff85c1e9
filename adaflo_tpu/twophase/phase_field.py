"""Cahn-Hilliard phase-field two-phase solver.

TPU-native counterpart of the reference's PhaseFieldSolver
(/root/reference/source/phase_field.cc, phase_field_local.cc): the coupled
2x2 block system for (concentration c, chemical potential w) on the
FE_Q_iso_Q1 space with matrix-free residual/vmult kernels (factors
mobility = delta^2/w_t, 1.5 sigma/eps, 0.75 sigma eps,
phase_field_local.cc:136-273), Newton iteration (phase_field.cc:334-369) and
GMRES on the block system with the Schur-like BlockPreconditionerSimple
(phase_field.cc:373-459) — with the reference's AMG of (M + sqrt(...) K)
replaced by matrix-free Chebyshev/Jacobi of the same operator. Surface
tension enters the momentum equation as w grad(c) interpolated onto the
pressure basis (phase_field_local.cc:49-131).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.basis import iterated_gauss_quadrature
from adaflo_tpu.ops.navier_stokes import Coefficients, TimeWeights
from adaflo_tpu.ops.tensor import CellEvaluator
from adaflo_tpu.parameters import FlowParameters, Scheme
from adaflo_tpu.solvers.krylov import gmres
from adaflo_tpu.solvers.preconditioner import (
    ChebyshevPreconditioner,
    DiagonalPreconditioner,
    estimate_lambda_max,
)
from adaflo_tpu.twophase.base import TwoPhaseBaseAlgorithm


class PhaseFieldSolver(TwoPhaseBaseAlgorithm):
    def __init__(self, parameters: FlowParameters, mesh, out=None) -> None:
        super().__init__(parameters, mesh, "iso_q1", out=out)
        self.curvature_name = "chemical_potential"

    def transform_distance_function(self, vector):
        """c = -tanh(d / eps_used) (phase_field.cc:102-109)."""
        return -jnp.tanh(vector / self.epsilon_used)

    def print_n_dofs(self) -> None:
        ns = self.navier_stokes
        nu, npp = ns.n_dofs
        n_ls = self.ls_space.n_dofs
        self._p("")
        self._p(f" Number of active cells: {self.mesh.n_cells}.")
        self._p(
            f" Number of Navier-Stokes degrees of freedom: "
            f"{nu + npp} ({nu} + {npp})."
        )
        self._p(
            f" Number of phase field degrees of freedom: "
            f"{2 * n_ls} ({n_ls} + {n_ls})."
        )

    # ------------------------------------------------------------------
    def initialize_data_structures(self) -> None:
        par = self.parameters
        mesh = self.mesh
        sub = par.concentration_subdivisions
        q_ls = iterated_gauss_quadrature(sub, 2)
        self.ev_c = CellEvaluator(mesh.dim, self.ls_space.basis, q_ls, mesh.h)
        self.ev_u_lsq = CellEvaluator(
            mesh.dim, self.navier_stokes.u_space.basis, q_ls, mesh.h
        )
        nq_ns = par.velocity_degree + 1
        self.ev_c_nsq = CellEvaluator(mesh.dim, self.ls_space.basis, nq_ns, mesh.h)
        self.ev_p_nsq = CellEvaluator(
            mesh.dim, self.navier_stokes.p_space.basis, nq_ns, mesh.h
        )
        self.ev_u_nsq = CellEvaluator(
            mesh.dim, self.navier_stokes.u_space.basis, nq_ns, mesh.h
        )
        self.cd_ls = jnp.asarray(self.ls_space.cell_dofs)
        self.cd_u = jnp.asarray(self.navier_stokes.u_space.cell_dofs)
        # ls -> pressure interpolation matrix
        Vp1, _ = self.ls_space.basis.tabulate(self.navier_stokes.p_space.basis.nodes)
        P = Vp1
        for _ in range(mesh.dim - 1):
            P = np.kron(Vp1, P)
        self.interp_ls_to_p = jnp.asarray(P)

        # lumped mass for helper preconditioners
        ones = jnp.ones((mesh.n_cells, self.ev_c.n_q))
        n_pad = self.ls_space.n_dofs_padded
        self.mass_diag = (
            jnp.zeros(n_pad).at[self.cd_ls.reshape(-1)].add(
                self.ev_c.integrate_values(ones).reshape(-1)
            )
        )
        self._prec_coeff = None  # rebuilt when the time weight changes
        self._setup_contact_angle()
        self._build_jitted_pf()

    def _setup_contact_angle(self) -> None:
        """Wetting boundary data: face dofs / basis / weights on no-slip and
        velocity-Dirichlet boundaries (phase_field.cc:140-177); the face rule
        is QIterated(Gauss 2, degree) like the reference."""
        self._contact_faces = None
        par = self.parameters
        if par.contact_angle == 0.0:
            return
        from adaflo_tpu.fe.basis import iterated_gauss_quadrature

        q1, w1 = iterated_gauss_quadrature(self.ls_space.degree, 2)
        Vq, _ = self.ls_space.basis.tabulate(q1)
        ids = set(self.boundary.no_slip) | set(self.boundary.dirichlet_conditions_u)
        fds, Vfs, jxws = [], [], []
        for bid in ids:
            for axis, end, fd in self.ls_space.boundary_faces(bid):
                rem = [a for a in range(self.mesh.dim) if a != axis]
                Vf = Vq
                jxw = w1 * self.mesh.h[rem[0]]
                if self.mesh.dim == 3:
                    Vf = np.kron(Vq, Vq)
                    jxw = np.kron(w1 * self.mesh.h[rem[1]], w1 * self.mesh.h[rem[0]])
                fds.append(fd)
                Vfs.append(Vf)
                jxws.append(jxw)
        if fds:
            import jax.numpy as jnp

            # all faces share the tensor basis on a uniform mesh
            self._contact_faces = (
                jnp.asarray(np.concatenate(fds)),
                jnp.asarray(Vfs[0]),
                jnp.asarray(jxws[0]),
            )

    def _apply_contact_bc_residual(self, c, rw):
        """+= theta sigma 0.75 (c^2-1) on the w equation over wetting faces
        (phase_field_local.cc:301-364). Returns (rw, frozen face values)."""
        if self._contact_faces is None:
            return rw, None
        fd, Vf, jxw = self._contact_faces
        par = self.parameters
        c_q = c[fd] @ Vf.T  # (F, n_qf)
        ev = par.contact_angle * par.surface_tension * 0.75 * (c_q * c_q - 1.0) * jxw
        contrib = ev @ Vf  # (F, n_fd)
        rw = rw.at[fd.reshape(-1)].add(contrib.reshape(-1))
        return rw, c_q

    def _apply_contact_bc_vmult(self, dc, rw, c_star_face):
        if self._contact_faces is None:
            return rw
        fd, Vf, jxw = self._contact_faces
        par = self.parameters
        dc_q = dc[fd] @ Vf.T
        ev = par.contact_angle * par.surface_tension * 1.5 * dc_q * c_star_face * jxw
        contrib = ev @ Vf
        return rw.at[fd.reshape(-1)].add(contrib.reshape(-1))

    # ------------------------------------------------------------------
    def _gather(self, v):
        return v[self.cd_ls]

    def _scatter(self, r_cells):
        n = self.ls_space.n_dofs_padded
        return jnp.zeros(n, r_cells.dtype).at[self.cd_ls.reshape(-1)].add(
            r_cells.reshape(-1)
        )

    def _build_jitted_pf(self) -> None:
        par = self.parameters
        ev = self.ev_c

        def factors(tw):
            inv_w = 1.0 / tw.weight
            f_mob = inv_w * par.diffusion_length**2
            f2 = 1.5 * par.surface_tension / self.epsilon_used
            f4 = 0.75 * par.surface_tension * self.epsilon_used
            return inv_w, f_mob, f2, f4

        def residual(c, w, c_old, c_old_old, u, tw, bdf2_flag):
            inv_w, f_mob, f2, f4 = factors(tw)
            # residual cell terms read PLAIN (read_dof_values_plain,
            # phase_field_local.cc:169-173); only the contact-angle face
            # term reads through the constraints (cc:348)
            cc = self._gather(c)
            wc = self._gather(w)
            c_val = ev.values(cc)
            c_grad = ev.gradients(cc)
            w_val = ev.values(wc)
            w_grad = ev.gradients(wc)
            co_val = ev.values(self._gather(c_old))
            coo_val = ev.values(self._gather(c_old_old))
            uc = jnp.transpose(u[:, self.cd_u], (1, 0, 2))
            u_val = self.ev_u_lsq.values(uc)

            val = c_val + tw.weight_old * inv_w * co_val
            val = jnp.where(
                bdf2_flag, val + tw.weight_old_old * inv_w * coo_val, val
            )
            val = val + jnp.einsum("edq,edq->eq", u_val, c_grad) * inv_w
            r_c = ev.integrate_values(val) + ev.integrate_gradients(f_mob * w_grad)
            r_w = ev.integrate_values(
                w_val - f2 * c_val * (c_val * c_val - 1.0)
            ) + ev.integrate_gradients(-f4 * c_grad)
            rw = self._scatter(r_w)
            rw, c_star_face = self._apply_contact_bc_residual(c, rw)
            rc_out = self._scatter(r_c)
            # fluid-type inflow boundaries carry Dirichlet rows (zero
            # residual, zero update), phase_field.cc:113-128
            cd_c = self.constraints_ls.constrained_dofs
            cd_w = self.constraints_curvature.constrained_dofs
            if len(cd_c):
                rc_out = rc_out.at[cd_c].set(0.0)
            if len(cd_w):
                rw = rw.at[cd_w].set(0.0)
            return (
                rc_out,
                rw,
                u_val,
                c_val,
                c_star_face,
            )

        def vmult(dc, dw, conv, c_star, c_star_face, tw):
            inv_w, f_mob, f2, f4 = factors(tw)
            # read_dof_values semantics: constrained (inflow Dirichlet) dofs
            # read zero inside the Krylov iteration
            cc = self._gather(self.constraints_ls.resolve(dc))
            wc = self._gather(self.constraints_curvature.resolve(dw))
            c_val = ev.values(cc)
            c_grad = ev.gradients(cc)
            w_val = ev.values(wc)
            w_grad = ev.gradients(wc)
            val = c_val + jnp.einsum("edq,edq->eq", conv, c_grad) * inv_w
            r_c = ev.integrate_values(val) + ev.integrate_gradients(f_mob * w_grad)
            r_w = ev.integrate_values(
                w_val - f2 * c_val * (3.0 * c_star * c_star - 1.0)
            ) + ev.integrate_gradients(-f4 * c_grad)
            rw = self._scatter(r_w)
            rw = self._apply_contact_bc_vmult(dc, rw, c_star_face)
            rc_out = self._scatter(r_c)
            cd_c = self.constraints_ls.constrained_dofs
            cd_w = self.constraints_curvature.constrained_dofs
            if len(cd_c):
                rc_out = rc_out.at[cd_c].set(dc[cd_c])
            if len(cd_w):
                rw = rw.at[cd_w].set(dw[cd_w])
            return rc_out, rw

        def mass_vmult(x):
            return self._scatter(ev.integrate_values(ev.values(self._gather(x))))

        def helper_vmult(x, coeff):
            """(M + coeff K), the preconditioner operator
            (phase_field.cc:260-300)."""
            cc = self._gather(x)
            r = ev.integrate_values(ev.values(cc)) + ev.integrate_gradients(
                coeff * ev.gradients(cc)
            )
            return self._scatter(r)

        @jax.jit
        def helper_diag(coeff):
            E = self.mesh.n_cells
            n_loc = self.ls_space.n_local
            units = jnp.eye(n_loc)

            def apply_unit(unit):
                pc = jnp.broadcast_to(unit[None], (E, n_loc))
                return ev.integrate_values(ev.values(pc)) + ev.integrate_gradients(
                    coeff * ev.gradients(pc)
                )

            out = jax.lax.map(apply_unit, units, batch_size=min(n_loc, 4))
            idx = jnp.arange(n_loc)
            diag_loc = jnp.transpose(out[idx, :, idx], (1, 0))
            d = jnp.zeros(self.ls_space.n_dofs_padded)
            d = d.at[self.cd_ls.reshape(-1)].add(diag_loc.reshape(-1))
            A = lambda x: helper_vmult(x, coeff)
            dinv = DiagonalPreconditioner(d).inverse
            lam = estimate_lambda_max(A, dinv, d)
            return d, lam

        self._helper_diag_fn = helper_diag

        # lattice GMG for the helper solves (M + coeff K on the Q1 dof
        # lattice) — the counterpart of the reference's AMG helper
        # preconditioner (phase_field.cc create_cahn_hilliard_preconditioner);
        # Chebyshev remains the fallback on periodic lattices
        self._ls_gmg = None
        if not any(self.mesh.periodic):
            from adaflo_tpu.solvers.multigrid import LatticeGMG

            self._ls_gmg = LatticeGMG(
                self.ls_space.n_nodes_axis,
                self.mesh.h / max(self.parameters.concentration_subdivisions, 1),
                self.constraints_ls.constrained_dofs,
                self.ls_space.n_dofs_padded,
            )
            self._helper_gmg_compute = jax.jit(
                lambda coeff: self._ls_gmg.compute(jnp.float64(1.0), coeff)
            )

        @jax.jit
        def residual_fn(c, w, c_old, c_old_old, u, tw, bdf2_flag):
            rc, rw, conv, c_star, c_star_face = residual(
                c, w, c_old, c_old_old, u, tw, bdf2_flag
            )
            res = jnp.sqrt(jnp.vdot(rc, rc).real + jnp.vdot(rw, rw).real)
            return rc, rw, conv, c_star, c_star_face, res

        self._residual_fn = residual_fn

        @jax.jit
        def solve_fn(rc, rw, conv, c_star, c_star_face, tw, helper_state, tol):
            _, f_mob, _, f4 = factors(tw)
            delta_eps = jnp.sqrt(f_mob / f4)
            A = lambda x: vmult(x[0], x[1], conv, c_star, c_star_face, tw)
            if self._ls_gmg is not None:
                helper = lambda r: self._ls_gmg.vmult(helper_state, r)
            else:
                helper_d, helper_lam = helper_state
                helper = ChebyshevPreconditioner(
                    lambda x: helper_vmult(x, jnp.sqrt(f_mob * f4)),
                    helper_d,
                    helper_lam,
                    degree=5,
                )

            def M2(src):
                """BlockPreconditionerSimple (phase_field.cc:373-404):
                dst1 = dst1/factor - dst0/factor after two helper solves."""
                t1 = src[0] + delta_eps * src[1]
                d1 = helper(t1)
                t2 = mass_vmult(d1) - delta_eps * src[1]
                d0 = helper(t2)
                d1f = d1 / delta_eps - d0 / delta_eps
                return (d0, d1f)

            res = gmres(
                A,
                (rc, rw),
                (jnp.zeros_like(rc), jnp.zeros_like(rw)),
                tol,
                self.parameters.max_lin_iteration,
                restart=50,
                M=M2,
            )
            return res.x[0], res.x[1], res.iterations

        self._solve_fn = solve_fn

        @jax.jit
        def force_fn(c, w):
            # plain reads: the stored solution carries the physical inflow
            # values. (The reference reads through its constraints here,
            # phase_field_local.cc:74,107, which zeroes the fluid-type
            # Dirichlet dofs and produces its slightly different
            # concentration extrema near the inflow; plain reads keep the
            # NS residual anchors and all interface diagnostics identical.)
            cc = self._gather(c)
            wv = self.ev_c_nsq.values(self._gather(w))
            use_var = par.density_diff != 0 or par.viscosity_diff != 0
            rho_q = mu_q = None
            if use_var:
                c_nsq = self.ev_c_nsq.values(cc)
                h = jnp.clip(0.5 * (c_nsq + 1.0), 0.0, 1.0)
                rho_q = par.density + par.density_diff * h
                mu_q = par.viscosity + par.viscosity_diff * h
            cp = jnp.einsum("ij,ej->ei", self.interp_ls_to_p, cc)
            grad_c = self.ev_p_nsq.gradients(cp)
            force = wv[:, None, :] * grad_c
            rho_for_g = rho_q if use_var else par.density
            force = force.at[:, self.mesh.dim - 1, :].add(-par.gravity * rho_for_g)
            r = self.ev_u_nsq.integrate_values(force)
            n = self.navier_stokes.u_space.n_dofs_padded
            flat = self.cd_u.reshape(-1)
            rows = [
                jnp.zeros(n).at[flat].add(r[:, d, :].reshape(-1))
                for d in range(self.mesh.dim)
            ]
            return jnp.stack(rows), rho_q, mu_q

        self._force_fn = force_fn

    # ------------------------------------------------------------------
    def compute_residual(self, tw, bdf2_flag):
        rc, rw, conv, c_star, c_star_face, res = self._residual_fn(
            self.solution[0],
            self.solution[1],
            self.solution_old[0],
            self.solution_old_old[0],
            self.navier_stokes.solution[0],
            tw,
            bdf2_flag,
        )
        self._rhs = (rc, rw)
        self._conv = conv
        self._c_star = c_star
        self._c_star_face = c_star_face
        return float(res)

    def advance_cahn_hilliard(self) -> None:
        """Newton loop (phase_field.cc:337-369)."""
        par = self.parameters
        ts = self.time_stepping
        tw = TimeWeights.from_time_stepping(ts)
        bdf2_flag = jnp.bool_(ts.scheme() == Scheme.bdf_2 and ts.step_no() > 1)
        if par.output_verbosity > 0:
            self._p("  Advance Cahn-Hilliard: ", end="")
        if self._prec_coeff is None or ts.weight_has_changed():
            # sqrt(0.75 sigma eps delta^2 / w_t) (phase_field.cc:274-278)
            f_mob = par.diffusion_length**2 / ts.weight()
            f4 = 0.75 * par.surface_tension * self.epsilon_used
            coeff = np.sqrt(f_mob * f4)
            if self._ls_gmg is not None:
                self._helper_state = self._helper_gmg_compute(jnp.float64(coeff))
            else:
                self._helper_state = self._helper_diag_fn(jnp.float64(coeff))
            self._prec_coeff = coeff
        assert par.ch_do_newton, "Eyre convexity splitting not implemented"
        for i in range(par.max_nl_iteration):
            residual = self.compute_residual(tw, bdf2_flag)
            if par.output_verbosity > 0:
                self._p(f"[{fmtg(residual)}/", end="")
            if i > 0 and residual < 0.001 * par.tol_nl_iteration:
                if par.output_verbosity > 0:
                    self._p("conv.]", end="")
                break
            rc, rw = self._rhs
            tol = max(
                0.001 * par.tol_nl_iteration,
                0.1 * par.tol_lin_iteration * residual,
            )
            dc, dw, iters = self._solve_fn(
                rc,
                rw,
                self._conv,
                self._c_star,
                self._c_star_face,
                tw,
                self._helper_state,
                jnp.float64(tol),
            )
            dc = self.constraints_ls.distribute(dc)
            dw = self.constraints_curvature.distribute(dw)
            self.solution[0] = self.solution[0] - dc
            self.solution[1] = self.solution[1] - dw
            if par.output_verbosity > 0:
                self._p(f"{int(iters)}] ", end="")
        if par.output_verbosity > 0:
            self._p("")

    def compute_force(self) -> None:
        ns = self.navier_stokes
        user_u, rho_q, mu_q = self._force_fn(self.solution[0], self.solution[1])
        for c in range(self.mesh.dim):
            cd = ns.constraints_u[c].constrained_dofs
            if len(cd):
                user_u = user_u.at[c, cd].set(0.0)
        ns.user_rhs[0] = user_u
        if rho_q is not None:
            ns.coefficients = Coefficients(rho_q, mu_q, None)

    # ------------------------------------------------------------------
    def advance_time_step(self):
        """phase_field.cc:462-470."""
        self.init_time_advance()
        self.advance_cahn_hilliard()
        self.compute_force()
        return self.navier_stokes.evaluate_time_step()

    def get_time_stepping(self):
        return self.time_stepping



def fmtg(x: float) -> str:
    s = f"{x:.3g}"
    if "e" in s:
        mant, ex = s.split("e")
        return f"{mant}e{int(ex):+03d}"
    return s
