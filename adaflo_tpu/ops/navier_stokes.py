"""Matrix-free Navier-Stokes operator (the hot operator of the framework).

TPU-native re-design of the reference's NavierStokesMatrix
(/root/reference/source/navier_stokes_matrix.cc:601-916 `local_operation` plus
the auxiliary ops at cc:920-1140): one fused kernel implements the nonlinear
residual, the coupled-system mat-vec and the velocity-block mat-vec on
cell-batched arrays. Terms:

- BDF time derivative with density rho,
- convective term in beta-weighted skew/conservative/convective form with the
  reference's five linearizations (Newton / Picard / semi-implicit /
  explicit / projection) via per-q-point frozen `linearized` fields,
- damping, symmetric viscous stress 2 mu sym(grad u), grad-div stabilization,
- pressure-divergence coupling, and the pressure null-space projection for
  pressure-fix problems (cc:110-168, 191-217).

Layout: velocity (dim, n_dofs_u), pressure (n_dofs_p,); cell batches
(E, comp, n_local). All methods are pure jax functions closed over static
index maps; scalars that change per time step (BDF weights) are traced
arguments so one compiled kernel serves the whole run.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.ops.lattice import LatticeOps
from adaflo_tpu.ops.tensor import CellEvaluator
from adaflo_tpu.parameters import FlowParameters, Linearization, PhysicalType


class TimeWeights(NamedTuple):
    """Per-step scalars entering the kernels (traced, not baked in)."""

    weight: jnp.ndarray  # BDF weight of the new value
    weight_old: jnp.ndarray
    weight_old_old: jnp.ndarray
    tau1: jnp.ndarray  # implicit weight of the spatial terms

    @classmethod
    def from_time_stepping(cls, ts) -> "TimeWeights":
        assert ts.tau2() == 0.0, "schemes with tau2 != 0 not supported in NS"
        return cls(
            jnp.float64(ts.weight()),
            jnp.float64(ts.weight_old()),
            jnp.float64(ts.weight_old_old()),
            jnp.float64(ts.tau1()),
        )


class Linearized(NamedTuple):
    """Frozen linearization state at quadrature points (the reference's
    `linearized_velocities`, navier_stokes_matrix.h:264-283)."""

    val: jnp.ndarray  # (E, dim, n_q) linearization velocity u*
    grad: Optional[jnp.ndarray]  # (E, dim, dim, n_q) full gradient (Newton)
    div: jnp.ndarray  # (E, n_q) divergence of u*
    # cell-local dofs of u* (E, dim, n_loc)
    dofs: Optional[jnp.ndarray] = None
    # (324, E) kernel-order relayout of (val, grad) for the fused Pallas
    # mat-vec, materialized ONCE per Newton step (pallas_matvec.qfields_t)
    # and streamed per apply instead of re-evaluated
    qt: Optional[jnp.ndarray] = None


class Coefficients(NamedTuple):
    """Optional variable coefficients at quadrature points (two-phase)."""

    rho: Optional[jnp.ndarray] = None  # (E, n_q)
    mu: Optional[jnp.ndarray] = None  # (E, n_q)
    damping: Optional[jnp.ndarray] = None  # (E, n_q)


class NavierStokesOperator:
    def __init__(
        self,
        parameters: FlowParameters,
        u_space: ScalarSpace,
        p_space: ScalarSpace,
        constraints_u: list[Constraints],
        constraints_p: Constraints,
        dtype=None,
    ) -> None:
        self.parameters = parameters
        self.dim = u_space.dim
        self.u_space = u_space
        self.p_space = p_space
        self.constraints_u = constraints_u
        self.constraints_p = constraints_p
        mesh = u_space.mesh
        deg_p = p_space.degree
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        self.is_forest = getattr(u_space, "is_forest", False) or getattr(
            u_space, "is_mapped", False
        )
        # quadrature with p+2 points: exact enough for the convective term
        # (mirrors FEEvaluation<dim, degree_p+1, degree_p+2>)
        if self.is_forest:
            # general index-map path: adaptive forests (per-cell Cartesian
            # geometry) and unstructured/curved meshes (full Jacobians)
            # forests expose face_neighbors for the DG0 interior-penalty
            # graph (and cannot be periodic); curved/simplex meshes stay
            # gated — no reference configuration combines them with augp
            if parameters.augmented_taylor_hood and not hasattr(
                mesh, "face_neighbors"
            ):
                raise NotImplementedError(
                    "augmented Taylor-Hood on this mesh type is not "
                    "supported (adaptive forests and lattice meshes only)"
                )
            from adaflo_tpu.ops.forest_ops import evaluator_for

            self.ev_u = evaluator_for(u_space, deg_p + 2, dtype)
            self.ev_p = evaluator_for(p_space, deg_p + 2, dtype)
            self.ev_p_low = evaluator_for(p_space, deg_p + 1, dtype)
            from adaflo_tpu.ops.lattice import IndexMapOps

            self.lat_u = IndexMapOps.for_space(u_space)
            self.lat_p = IndexMapOps.for_space(p_space)
        elif getattr(mesh, "is_graded", False):
            # graded tensor mesh (wall clustering): per-cell Cartesian
            # geometry, but the strided-lattice gather/scatter still applies
            from adaflo_tpu.ops.tensor import VariableCellEvaluator

            if parameters.augmented_taylor_hood and any(mesh.periodic):
                raise NotImplementedError(
                    "augmented Taylor-Hood on periodic graded meshes is "
                    "not supported"
                )
            hc = mesh.cell_widths()
            self.ev_u = VariableCellEvaluator(
                self.dim, u_space.basis, deg_p + 2, hc, dtype
            )
            self.ev_p = VariableCellEvaluator(
                self.dim, p_space.basis, deg_p + 2, hc, dtype
            )
            self.ev_p_low = VariableCellEvaluator(
                self.dim, p_space.basis, deg_p + 1, hc, dtype
            )
            self.lat_u = LatticeOps.for_space(u_space)
            self.lat_p = LatticeOps.for_space(p_space)
        else:
            self.ev_u = CellEvaluator(
                self.dim, u_space.basis, deg_p + 2, mesh.h, dtype
            )
            self.ev_p = CellEvaluator(
                self.dim, p_space.basis, deg_p + 2, mesh.h, dtype
            )
            # reduced quadrature (p+1 points) for pressure-only operators
            self.ev_p_low = CellEvaluator(
                self.dim, p_space.basis, deg_p + 1, mesh.h, dtype
            )
            # structured-lattice fast path (strided slices instead of gather /
            # irregular scatter; see ops/lattice.py)
            self.lat_u = LatticeOps.for_space(u_space)
            self.lat_p = LatticeOps.for_space(p_space)
        self.cd_u = jnp.asarray(u_space.cell_dofs)
        self.cd_p = jnp.asarray(p_space.cell_dofs)
        self.n_q = self.ev_u.n_q

        # augmented Taylor-Hood: the pressure space is FE_Q_DG0 = Q_p plus a
        # per-cell constant; the combined dof vector is [Q dofs, cell
        # constants] (+ padding). All exact operators are cell-local in the
        # DG0 part; the Schur Poisson adds an interior-penalty graph
        # Laplacian between the constants (ns_prec.cc:1636-1684, 2248-2342).
        self.augmented = parameters.augmented_taylor_hood
        E = mesh.n_cells
        self.n_p_q = p_space.n_dofs
        self.n_p_total = p_space.n_dofs + (E if self.augmented else 0)
        pad = p_space.n_dofs_padded - p_space.n_dofs
        self.n_p_padded = self.n_p_total + pad

        # pressure constant modes for pure-Dirichlet problems: lumped
        # pressure mass as weights (navier_stokes_matrix.cc:110-168)
        self.pressure_fix_mode = None  # set by enable_pressure_fix()
        self.pressure_dg0_mode = None  # augmented TH second mode

        # fused Pallas mat-vec (ops/pallas_matvec.py): Q2/Q1 3D Newton on
        # the uniform lattice. TPU f32 by default (the bench/deployment
        # precision; f64 stays on the einsum path for bit-stable goldens);
        # ADAFLO_PALLAS_MATVEC=1 forces it on (interpreted off-TPU),
        # =0 disables.
        import os

        self._pallas_tables = None
        self._pallas_interpret = False
        flag = os.environ.get("ADAFLO_PALLAS_MATVEC", "")
        eligible = (
            not self.is_forest
            and not getattr(mesh, "is_graded", False)
            and self.dim in (2, 3)
            and parameters.velocity_degree in (2, 3)
            and not self.augmented
            and parameters.linearization
            == Linearization.coupled_implicit_newton
            and parameters.physical_type == PhysicalType.incompressible
            and flag != "0"
            # below ~32k cells the per-apply fixed costs (kernel launch,
            # pack-boundary preconditioner relayouts) outweigh the fusion
            # win — measured round 5: beltrami_3d (4096 cells) runs 0.61
            # s/step resident vs 0.49 on the einsum path, so the gate
            # stays at 32k; force with ADAFLO_PALLAS_MATVEC=1
            and (mesh.n_cells >= 32768 or flag == "1")
        )
        if eligible:
            on_tpu = jax.default_backend() == "tpu"
            if (self.dtype == jnp.float32 and on_tpu) or flag == "1":
                from adaflo_tpu.ops.pallas_matvec import build_tables

                self._pallas_tables = build_tables(
                    self.ev_u, self.ev_p, np.dtype(self.dtype)
                )
                self._pallas_interpret = not on_tpu
        # default HBM layout for the fused apply: the parity-resident "pr"
        # variant whenever the mesh supports it (measured 3.3x faster than
        # "t" at 2.86M DoF, BENCH_r03 layout_ms) — production solves get the
        # fast path with NO env vars; ADAFLO_PALLAS_LAYOUT still overrides
        self._layout_default = "pr" if self.pr_supported() else "t"

    # ------------------------------------------------------------------
    # gather / scatter helpers
    def _gather_u(self, u, resolve: bool):
        """(dim, n_u) -> (E, dim, n_loc_u)"""
        if resolve:
            u = jnp.stack([c.resolve(u[i]) for i, c in enumerate(self.constraints_u)])
        return jnp.stack([self.lat_u.gather(u[c]) for c in range(self.dim)], axis=1)

    def _gather_p(self, p, resolve: bool):
        if resolve:
            p = self.constraints_p.resolve(p)
        return self.lat_p.gather(p)

    def _split_p(self, p):
        """(n_p_padded,) -> (Q part (n_q_padded,), cell constants (E,))"""
        if not self.augmented:
            return p, None
        E = self.u_space.mesh.n_cells
        pq = jnp.concatenate(
            [p[: self.n_p_q], jnp.zeros(self.p_space.n_dofs_padded - self.n_p_q, p.dtype)]
        )
        pc = p[self.n_p_q : self.n_p_q + E]
        return pq, pc

    def _join_p(self, rq, rc):
        """inverse of _split_p (padding at the tail)"""
        if not self.augmented:
            return rq
        tail = rq[self.n_p_q :]
        return jnp.concatenate([rq[: self.n_p_q], rc, tail])

    # -- generic per-cell geometry for the DG0 augmentation ---------------
    def _cell_volumes(self):
        """(E,) cell volumes: sum of jxw over the low-order quadrature —
        exact for the Cartesian/affine cells of every augp-eligible mesh."""
        jxw = getattr(self.ev_p_low, "jxw_cells", None)
        if jxw is not None:
            return jnp.sum(jxw, axis=-1)
        # uniform lattice: host value (this runs inside jit traces, so a
        # float() readback of a traced jxw sum is not an option)
        mesh = self.u_space.mesh
        return jnp.full(mesh.n_cells, float(np.prod(mesh.h)))

    def _dg0_integrate(self, ev, val):
        """(E,) cell integrals of a (E, n_q) q-point field — the DG0 test
        row — for uniform (shared jxw) and per-cell-geometry evaluators."""
        jxw = getattr(ev, "jxw_cells", None)
        if jxw is not None:
            return jnp.sum(val * jxw, axis=-1)
        return val @ ev.jxw

    def _dg0_faces(self):
        """Static interior-face list (i, j, coeff) of the DG0 interior
        penalty graph for non-uniform meshes (graded lattices: per-axis
        widths; forests: face_neighbors incl. 2:1 hanging subfaces, each
        subface weighted by the finer cell's face area — the reference
        assembles the same subface terms, ns_prec.cc:2248-2342). None on
        the uniform lattice, where the banded diff path is faster."""
        if hasattr(self, "_dg0_face_cache"):
            return self._dg0_face_cache
        mesh = self.u_space.mesh
        dim = self.dim
        deg = self.p_space.degree
        pen = deg * (deg + 1)
        faces = None
        if hasattr(mesh, "face_neighbors"):  # adaptive forest
            _, h = mesh.cell_geometry()
            ii, jj, cc = [], [], []
            for i in range(mesh.n_cells):
                for axis in range(dim):
                    nbrs, _rel = mesh.face_neighbors(i, axis, 1)
                    for j in nbrs:
                        hmin = np.minimum(h[i], h[j])
                        area = float(np.prod(np.delete(hmin, axis)))
                        dist = 0.5 * (h[i, axis] + h[j, axis])
                        ii.append(i)
                        jj.append(int(j))
                        cc.append(pen * area / dist)
            # cache HOST arrays: this is first reached inside jit traces
            # (preconditioner compute), and caching traced constants would
            # leak tracers across traces
            faces = (
                np.asarray(ii, np.int32),
                np.asarray(jj, np.int32),
                np.asarray(cc),
            )
        elif getattr(mesh, "is_graded", False):
            ncs = mesh.n_cells_axis  # physical (x, y[, z]) order
            widths = [np.diff(mesh.axis_nodes(a)) for a in range(dim)]
            raster = tuple(reversed(ncs))  # (z, y, x)
            idx = np.indices(raster)  # coords[d] in raster order
            strides = np.array(
                [int(np.prod(raster[a + 1 :])) for a in range(dim)]
            )
            flat = sum(idx[a] * strides[a] for a in range(dim))
            ii, jj, cc = [], [], []
            for a in range(dim):  # physical axis a = raster axis dim-1-a
                ax = dim - 1 - a
                sel = tuple(
                    slice(0, -1) if d == ax else slice(None)
                    for d in range(dim)
                )
                i_f = flat[sel].reshape(-1)
                j_f = (flat[sel] + strides[ax]).reshape(-1)
                ca = idx[ax][sel]  # cell index along axis a
                w_a = widths[a]
                dist = 0.5 * (w_a[ca] + w_a[ca + 1])
                area = np.ones_like(dist)
                for b in range(dim):
                    if b == a:
                        continue
                    area = area * widths[b][idx[dim - 1 - b][sel]]
                ii.append(i_f)
                jj.append(j_f)
                cc.append((pen * area / dist).reshape(-1))
            faces = (
                np.concatenate(ii).astype(np.int32),
                np.concatenate(jj).astype(np.int32),
                np.concatenate(cc),
            )
        self._dg0_face_cache = faces
        return faces

    def pressure_values_q(self, p, ev, resolve: bool):
        """pressure values at quadrature points incl. the DG0 constant"""
        pq, pc = self._split_p(p)
        vals = ev.values(self._gather_p(pq, resolve))
        if pc is not None:
            vals = vals + pc[:, None]
        return vals

    def _scatter_u(self, r_cells):
        """(E, dim, n_loc_u) -> (dim, n_u), with condense."""
        out = []
        for c in range(self.dim):
            r = self.lat_u.scatter_add(r_cells[:, c, :])
            out.append(self.constraints_u[c].condense(r))
        return jnp.stack(out)

    def _scatter_p(self, r_cells):
        return self.constraints_p.condense(self.lat_p.scatter_add(r_cells))

    # ------------------------------------------------------------------
    def enable_pressure_fix(self) -> None:
        """Project the constant pressure mode(s) out of residual and vmult
        (navier_stokes_matrix.cc:110-168): mode 0 spans the FE_Q part,
        mode 1 (augmented TH) the DG0 constants; weights are the lumped
        pressure mass restricted to each mode."""
        E = self.u_space.mesh.n_cells
        ones = jnp.ones((E, self.ev_p_low.n_q))
        lumped_q = self._scatter_p_plain(self.ev_p_low.integrate_values(ones))
        n, npad = self.p_space.n_dofs, self.p_space.n_dofs_padded
        mode0_q = jnp.zeros(npad).at[:n].set(1.0)
        if len(self.constraints_p.constrained_dofs):
            mode0_q = mode0_q.at[self.constraints_p.constrained_dofs].set(0.0)
            lumped_q = lumped_q.at[self.constraints_p.constrained_dofs].set(0.0)
        if self.augmented:
            cell_vol = self._cell_volumes()
            mode0 = self._join_p(mode0_q, jnp.zeros(E))
            w0 = self._join_p(lumped_q * mode0_q, jnp.zeros(E))
            mode1 = self._join_p(jnp.zeros_like(mode0_q), jnp.ones(E))
            w1 = self._join_p(jnp.zeros_like(mode0_q), cell_vol)
            self.pressure_fix_mode = (mode0, w0, 1.0 / float(mode0 @ w0))
            self.pressure_dg0_mode = (mode1, w1, 1.0 / float(mode1 @ w1))
        else:
            self.pressure_fix_mode = (
                mode0_q,
                lumped_q * mode0_q,
                1.0 / float(mode0_q @ (lumped_q * mode0_q)),
            )

    def _scatter_p_plain(self, r_cells):
        return self.lat_p.scatter_add(r_cells)

    def _integrate_pressure_row(self, f_q):
        """Integrate a q-point field against the pressure test space
        (Q part + DG0 constants for augmented TH)."""
        rq = self._scatter_p(self.ev_p.integrate_values(f_q))
        if not self.augmented:
            return rq
        rc = self._dg0_integrate(self.ev_p, f_q)
        return self._join_p(rq, rc)

    def apply_pressure_average_projection(self, rp):
        """(navier_stokes_matrix.cc:191-205)"""
        if self.pressure_fix_mode is None:
            return rp
        par = self.parameters
        if (
            par.linearization == Linearization.projection
            or par.physical_type == PhysicalType.incompressible_stationary
        ):
            return rp
        mode, weights, inv = self.pressure_fix_mode
        rp = rp - (weights @ rp) * inv * mode
        if self.pressure_dg0_mode is not None:
            m1, w1, i1 = self.pressure_dg0_mode
            rp = rp - (w1 @ rp) * i1 * m1
        return rp

    def apply_pressure_shift(self, shift, p):
        if self.pressure_fix_mode is None:
            return p
        mode, _, _ = self.pressure_fix_mode
        return p + shift * mode

    # ------------------------------------------------------------------
    # the fused local kernel (reference local_operation, nsm.cc:601-916)
    def _q_point_terms(
        self,
        op: str,
        tw: TimeWeights,
        val_u,  # (E, dim, n_q) or None (stokes)
        grad_u,  # (E, dim, dim, n_q): [., comp, deriv, q]
        p_q,  # (E, n_q) or None
        old_val,
        old_old_val,
        lin: Optional[Linearized],
        coeffs: Coefficients,
    ):
        par = self.parameters
        dim = self.dim
        beta = par.beta_convective_term_momentum_balance
        div = jnp.trace(grad_u, axis1=1, axis2=2)  # (E, n_q)

        submit_val = None
        new_lin = None
        if par.physical_type != PhysicalType.stokes:
            rho = coeffs.rho if coeffs.rho is not None else par.density
            if par.physical_type == PhysicalType.incompressible:
                conv = val_u * tw.weight
            else:  # stationary: no time derivative
                conv = jnp.zeros_like(val_u)

            if op == "residual":
                if par.physical_type != PhysicalType.incompressible_stationary:
                    conv = conv + old_val * tw.weight_old + old_old_val * tw.weight_old_old
                if par.linearization in (
                    Linearization.projection,
                    Linearization.coupled_velocity_semi_implicit,
                    Linearization.coupled_velocity_explicit,
                ):
                    # lin.val/div hold the *extrapolated* old velocity here
                    if par.linearization == Linearization.coupled_velocity_explicit:
                        res = beta * lin.div[:, None, :] * lin.val + jnp.einsum(
                            "edq,ecdq->ecq", lin.val, lin.grad
                        )
                        conv = conv + tw.tau1 * res
                        new_lin = lin
                    else:
                        res = beta * lin.div[:, None, :] * val_u + jnp.einsum(
                            "edq,ecdq->ecq", lin.val, grad_u
                        )
                        conv = conv + tw.tau1 * res
                        new_lin = Linearized(lin.val, None, lin.div)
                else:
                    # Newton / Picard: linearize around the current iterate
                    res = beta * div[:, None, :] * val_u + jnp.einsum(
                        "edq,ecdq->ecq", val_u, grad_u
                    )
                    conv = conv + tw.tau1 * res
                    if par.linearization == Linearization.coupled_implicit_newton:
                        new_lin = Linearized(val_u, grad_u, div)
                    else:
                        new_lin = Linearized(val_u, None, div)
            else:  # vmult / vmult_velocity
                if par.linearization == Linearization.coupled_implicit_newton:
                    res = (
                        beta * div[:, None, :] * lin.val
                        + beta
                        * jnp.trace(lin.grad, axis1=1, axis2=2)[:, None, :]
                        * val_u
                        + jnp.einsum("edq,ecdq->ecq", lin.val, grad_u)
                        + jnp.einsum("edq,ecdq->ecq", val_u, lin.grad)
                    )
                    conv = conv + tw.tau1 * res
                elif par.linearization != Linearization.coupled_velocity_explicit:
                    res = beta * lin.div[:, None, :] * val_u + jnp.einsum(
                        "edq,ecdq->ecq", lin.val, grad_u
                    )
                    conv = conv + tw.tau1 * res
            conv = conv * (rho if np.isscalar(rho) else rho[:, None, :])
            damping = (
                coeffs.damping if coeffs.damping is not None else par.damping
            )
            conv = conv - (
                damping if np.isscalar(damping) else damping[:, None, :]
            ) * val_u
            submit_val = conv

        # viscous + grad-div + pressure (all ops)
        mu = coeffs.mu if coeffs.mu is not None else par.viscosity
        tmu = (mu if np.isscalar(mu) else mu[:, None, None, :]) * tw.tau1
        sym = grad_u + jnp.swapaxes(grad_u, 1, 2)
        stress = tmu * sym
        eye = jnp.eye(dim)[None, :, :, None]
        stress = stress + par.tau_grad_div * div[:, None, None, :] * eye
        if op != "vmult_velocity":
            stress = stress - p_q[:, None, None, :] * eye
        return submit_val, stress, div, new_lin

    # ------------------------------------------------------------------
    def residual_assemble(
        self,
        u,
        p,
        u_old,
        u_old_old,
        tw: TimeWeights,
        coeffs: Coefficients = Coefficients(),
        extrapolation: tuple = (1.0, 0.0),
    ):
        """Assemble the positive operator terms A(u) at the current state
        (plain reads honoring inhomogeneous BCs) and freeze the linearization.
        Returns (r_u, r_p, Linearized). The caller forms
        rhs = user_rhs + const_rhs - A(u) (navier_stokes_matrix.cc:266-293)."""
        par = self.parameters
        uc = self._gather_u(u, resolve=False)
        val_u = self.ev_u.values(uc)
        grad_u = self.ev_u.gradients(uc)
        p_q = self.pressure_values_q(p, self.ev_p, resolve=False)

        old_val = old_old_val = None
        lin = None
        if par.physical_type == PhysicalType.incompressible:
            oc = self._gather_u(u_old, resolve=False)
            ooc = self._gather_u(u_old_old, resolve=False)
            old_val = self.ev_u.values(oc)
            old_old_val = self.ev_u.values(ooc)
            if par.linearization in (
                Linearization.projection,
                Linearization.coupled_velocity_semi_implicit,
                Linearization.coupled_velocity_explicit,
            ):
                # extrapolate old velocities to the new time
                # (navier_stokes_matrix.cc:740-781)
                f1, f2 = extrapolation
                old_grad = self.ev_u.gradients(oc)
                old_old_grad = self.ev_u.gradients(ooc)
                ex_val = f1 * old_val + f2 * old_old_val
                ex_grad = f1 * old_grad + f2 * old_old_grad
                lin = Linearized(
                    ex_val, ex_grad, jnp.trace(ex_grad, axis1=1, axis2=2)
                )

        submit_val, stress, div, new_lin = self._q_point_terms(
            "residual", tw, val_u, grad_u, p_q, old_val, old_old_val, lin, coeffs
        )
        if new_lin is not None and par.linearization in (
            Linearization.coupled_implicit_newton,
            Linearization.coupled_implicit_picard,
        ):
            # carry the linearization-point dofs for the fused Pallas mat-vec
            new_lin = new_lin._replace(dofs=uc)
            if self._pallas_tables is not None and new_lin.grad is not None:
                from adaflo_tpu.ops.pallas_matvec import stream_t

                qt = stream_t(new_lin)
                if (
                    os.environ.get(
                        "ADAFLO_PALLAS_LAYOUT", self._layout_default
                    )
                    in ("pe", "pi", "pr")
                    and isinstance(self.lat_u, LatticeOps)
                    and not any(self.u_space.mesh.periodic)
                ):
                    # parity layout: pre-raster the stream onto the anchor
                    # raster once per Newton step (not per Krylov apply)
                    qt = self.lat_u.cells_to_anchors(qt)
                new_lin = new_lin._replace(qt=qt)

        # stress is (E, comp, deriv, n_q): batch (E, comp), deriv axis at -2
        # exactly as integrate_gradients expects
        r_u = self.ev_u.integrate_gradients(stress)
        if submit_val is not None:
            r_u = r_u + self.ev_u.integrate_values(submit_val)
        ru = self._scatter_u(r_u)
        if par.linearization == Linearization.projection:
            # the pressure block is not assembled for the fractional-step
            # scheme (navier_stokes_matrix.cc:902-907)
            rp = jnp.zeros(self.n_p_padded if self.augmented else self.p_space.n_dofs_padded)
        else:
            rp = self._integrate_pressure_row(-div)
        return ru, rp, new_lin

    def vmult(
        self,
        du,
        dp,
        tw: TimeWeights,
        lin: Optional[Linearized],
        coeffs: Coefficients = Coefficients(),
    ):
        """Coupled-system mat-vec (navier_stokes_matrix.cc:221-262)."""
        use_pallas = (
            self._pallas_tables is not None
            and lin is not None
            and lin.grad is not None
            and coeffs.rho is None
            and coeffs.mu is None
            and coeffs.damping is None
        )
        if use_pallas:
            ru, rp = self._pallas_coupled_apply(du, dp, tw, lin)
        else:
            uc = self._gather_u(du, resolve=True)
            val_u = self.ev_u.values(uc)
            grad_u = self.ev_u.gradients(uc)
            p_q = self.pressure_values_q(dp, self.ev_p, resolve=True)
            submit_val, stress, div, _ = self._q_point_terms(
                "vmult", tw, val_u, grad_u, p_q, None, None, lin, coeffs
            )
            r_u = self.ev_u.integrate_gradients(stress)
            if submit_val is not None:
                r_u = r_u + self.ev_u.integrate_values(submit_val)
            ru = self._scatter_u(r_u)
            rp = self._integrate_pressure_row(-div)
        # identity on constrained rows (pressure with sign -1, cc:247-256)
        for c in range(self.dim):
            ru = ru.at[c].set(self.constraints_u[c].set_identity(ru[c], du[c]))
        cp = self.constraints_p.constrained_dofs
        if len(cp):
            rp = rp.at[cp].set(-dp[cp])
        rp = self.apply_pressure_average_projection(rp)
        return ru, rp

    def _pallas_coupled_apply(self, du, dp, tw: TimeWeights, lin: Linearized):
        """Shared fused-Pallas coupled apply for vmult / velocity_vmult
        (dp=None streams a zero pressure block and returns rp=None).

        ADAFLO_PALLAS_LAYOUT selects the HBM layout of the cell blocks:
        "t" (default) = (89, E) via gather_t/scatter_add_t; "n" = (E, 89)
        cell-major via gather/scatter_add — contiguous HBM tiles, with the
        layout change absorbed by the kernel's dot_general contractions;
        "pe" = (89, EA) parity-packed with cells on the extended anchor
        raster — every row is one contiguous shifted slice (no transpose
        passes at all), phantom anchors masked at scatter."""
        from adaflo_tpu.ops.pallas_matvec import (
            coupled_vmult_cells,
            stream_t,
        )

        par = self.parameters
        layout = os.environ.get("ADAFLO_PALLAS_LAYOUT", self._layout_default)
        if layout in ("pe", "pi", "pr") and (
            any(self.u_space.mesh.periodic)
            or not isinstance(self.lat_u, LatticeOps)
        ):
            layout = "t"
        if layout in ("pi", "pr"):
            # the in-kernel-gather variant streams dofs only: whatever s_t
            # resolves to below must be the (dim n_u_loc, ·) dof stream
            n_su = self.dim * self.u_space.n_local
            dof_stream = (
                lin.qt.shape[0] == n_su
                if lin.qt is not None
                else (
                    os.environ.get("ADAFLO_PALLAS_STREAM", "dofs") == "dofs"
                    and lin.dofs is not None
                )
            )
            if not dof_stream:
                layout = "pe"
        E = self.u_space.mesh.n_cells
        u_res = [
            self.constraints_u[c].resolve(du[c]) for c in range(self.dim)
        ]
        p_res = None if dp is None else self.constraints_p.resolve(dp)
        nl = self.u_space.n_local
        if layout == "n":
            zp = jnp.zeros((E, self.p_space.n_local), du.dtype)
            x = jnp.concatenate(
                [self.lat_u.gather(u_res[c]) for c in range(self.dim)]
                + [zp if p_res is None else self.lat_p.gather(p_res)],
                axis=1,
            )
        elif layout == "pe":
            EA = self.lat_u.n_anchors
            zp = jnp.zeros((self.p_space.n_local, EA), du.dtype)
            x = jnp.concatenate(
                [self.lat_u.gather_pe(u_res[c]) for c in range(self.dim)]
                + [zp if p_res is None else self.lat_p.gather_pe(p_res)],
                axis=0,
            )
        elif layout in ("pi", "pr"):
            # in-kernel gather: only the parity sub-lattices ride HBM
            EA = self.lat_u.n_anchors
            n_sub_u = self.lat_u.deg ** self.dim
            subs = [self.lat_u._parity_subs(u_res[c]) for c in range(self.dim)]
            subs.append(
                jnp.zeros((self.lat_p.deg ** self.dim, EA), du.dtype)
                if p_res is None
                else self.lat_p._parity_subs(p_res)
            )
            x = jnp.concatenate(subs, axis=0)
        else:
            zp = jnp.zeros((self.p_space.n_local, E), du.dtype)
            x = jnp.concatenate(
                [self.lat_u.gather_t(u_res[c]) for c in range(self.dim)]
                + [zp if p_res is None else self.lat_p.gather_t(p_res)],
                axis=0,
            )
        s_t = lin.qt if lin.qt is not None else stream_t(lin)
        if layout in ("pe", "pi", "pr") and s_t.shape[-1] == E:
            # stream built on the cell raster (e.g. by a caller unaware of
            # the layout): re-raster per apply as a fallback; the residual
            # hook pre-rasters qt once per Newton step on this path
            s_t = self.lat_u.cells_to_anchors(s_t)
        scalars = (
            tw.weight * par.density - par.damping,
            tw.tau1 * par.density,
            par.beta_convective_term_momentum_balance,
            tw.tau1 * par.viscosity,
            par.tau_grad_div,
        )
        if layout == "pi":
            from adaflo_tpu.ops.pallas_matvec import coupled_vmult_parity

            out = coupled_vmult_parity(
                x,
                s_t,
                self._pallas_tables,
                scalars,
                self._pr_rows_table(),
                EA,
                interpret=self._pallas_interpret,
            )
        elif layout == "pr":
            from adaflo_tpu.ops.pallas_matvec import coupled_vmult_pr

            out = coupled_vmult_pr(
                x,
                s_t,
                self._pallas_tables,
                scalars,
                self._pr_rows_table(),
                EA,
                self.lat_u.anchor_mask_dev(x.dtype),
                interpret=self._pallas_interpret,
            )[:, :EA]
        else:
            out = coupled_vmult_cells(
                x,
                s_t,
                self._pallas_tables,
                scalars,
                interpret=self._pallas_interpret,
                # "pe" keeps the kernel's transposed (rows, cells)
                # orientation; only the cell enumeration (anchor raster)
                # differs
                layout="t" if layout == "pe" else layout,
            )
        if layout == "pr":
            # the kernel already performed the overlap-add scatter; rows are
            # the RESULT parity sub-lattices — only re-interleave
            n_sub_u = self.lat_u.deg**self.dim
            ru = jnp.stack(
                [
                    self.constraints_u[c].condense(
                        self.lat_u.subs_to_nodal(
                            out[c * n_sub_u : (c + 1) * n_sub_u]
                        )
                    )
                    for c in range(self.dim)
                ]
            )
            rp = (
                None
                if dp is None
                else self.constraints_p.condense(
                    self.lat_p.subs_to_nodal(out[self.dim * n_sub_u :])
                )
            )
        elif layout in ("pe", "pi"):
            ru = jnp.stack(
                [
                    self.constraints_u[c].condense(
                        self.lat_u.scatter_add_pe(out[c * nl : (c + 1) * nl])
                    )
                    for c in range(self.dim)
                ]
            )
            rp = (
                None
                if dp is None
                else self.constraints_p.condense(
                    self.lat_p.scatter_add_pe(out[self.dim * nl :])
                )
            )
        elif layout == "n":
            ru = jnp.stack(
                [
                    self.constraints_u[c].condense(
                        self.lat_u.scatter_add(out[:, c * nl : (c + 1) * nl])
                    )
                    for c in range(self.dim)
                ]
            )
            rp = (
                None
                if dp is None
                else self.constraints_p.condense(
                    self.lat_p.scatter_add(out[:, self.dim * nl :])
                )
            )
        else:
            ru = jnp.stack(
                [
                    self.constraints_u[c].condense(
                        self.lat_u.scatter_add_t(out[c * nl : (c + 1) * nl])
                    )
                    for c in range(self.dim)
                ]
            )
            rp = (
                None
                if dp is None
                else self.constraints_p.condense(
                    self.lat_p.scatter_add_t(out[self.dim * nl :])
                )
            )
        return ru, rp

    def _pr_rows_table(self):
        """Static (sub-lattice row, anchor offset) per kernel x row for the
        parity layouts: the velocity components' deg^dim sub-lattices
        stacked first, then the pressure sub-lattices."""
        rows = getattr(self, "_pr_rows", None)
        if rows is None:
            n_sub_u = self.lat_u.deg**self.dim
            rows = []
            for c in range(self.dim):
                rows += [
                    (c * n_sub_u + s, off)
                    for s, off in self.lat_u._parity_rows()
                ]
            rows += [
                (self.dim * n_sub_u + s, off)
                for s, off in self.lat_p._parity_rows()
            ]
            rows = self._pr_rows = tuple(rows)
        return rows

    # ------------------------------------------------------------------
    # Parity-RESIDENT coupled apply: the Krylov iterate lives in the packed
    # parity layout across the whole solve, so a mat-vec is ONE fused Pallas
    # kernel with no XLA-side gather/scatter passes at all (the round-2
    # VERDICT's top item; the reference pays only ghost exchange per apply,
    # navier_stokes.cc:1255-1317). Phantom positions are zero by
    # construction, so elementwise ops and dot products on packed vectors
    # equal their nodal counterparts — Krylov iterations compose freely.
    # ------------------------------------------------------------------
    def pr_supported(self) -> bool:
        from adaflo_tpu.ops.lattice import LatticeOps

        return (
            self._pallas_tables is not None
            and isinstance(self.lat_u, LatticeOps)
            and not any(self.u_space.mesh.periodic)
            and not self.augmented
        )

    def pr_active(self, lin, coeffs: "Coefficients") -> bool:
        """True when a Krylov solve should run parity-RESIDENT: pack the
        iterate once, apply vmult_pr per iteration, unpack once at exit
        (with preconditioner applies at the pack boundary). Trace-time
        static: depends only on mesh/table eligibility, the pytree
        structure of lin/coeffs, and the layout selection."""
        layout = os.environ.get("ADAFLO_PALLAS_LAYOUT", self._layout_default)
        return (
            layout == "pr"
            and self.pr_supported()
            and lin is not None
            and getattr(lin, "grad", None) is not None
            and (
                getattr(lin, "qt", None) is not None
                or getattr(lin, "dofs", None) is not None
            )
            # variable rho/mu/damping (two-phase) now ride the resident
            # kernel as a streamed bf16 coefficient block (pr_coeff_stream)
            # — the reference's own hot kernel streams the same per-q-point
            # arrays (navier_stokes_matrix.cc:740-890)
        )

    def pr_pack(self, u, p=None):
        """(u (dim, n), p (n_p)) -> packed parity vector (R_pad, L): the
        per-component parity sub-lattices stacked (then pressure), rows
        padded to a sublane multiple and columns to the pr2 resident
        length (a whole number of kernel blocks, so apply in/out shapes
        are identical and the iterate never re-pads)."""
        from adaflo_tpu.ops.pallas_matvec import pr2_params

        EA = self.lat_u.n_anchors
        rows = [self.lat_u._parity_subs(u[c]) for c in range(self.dim)]
        rows.append(
            jnp.zeros((self.lat_p.deg**self.dim, EA), u.dtype)
            if p is None
            else self.lat_p._parity_subs(p)
        )
        x = jnp.concatenate(rows, axis=0)
        R_pad = -(-x.shape[0] // 8) * 8
        _, _, _, L = pr2_params(self._pr_rows_table(), EA)
        return jnp.pad(x, ((0, R_pad - x.shape[0]), (0, L - x.shape[1])))

    def pr_unpack(self, x):
        """Packed parity vector -> (u (dim, n_padded), p (n_p_padded))."""
        n_sub_u = self.lat_u.deg**self.dim
        EA = self.lat_u.n_anchors
        u = jnp.stack(
            [
                self.lat_u.subs_to_nodal(
                    x[c * n_sub_u : (c + 1) * n_sub_u, :EA]
                )
                for c in range(self.dim)
            ]
        )
        p = self.lat_p.subs_to_nodal(
            x[self.dim * n_sub_u : self.dim * n_sub_u
              + self.lat_p.deg**self.dim, :EA]
        )
        return u, p

    def _pr_constants(self, dtype):
        """Packed constraint masks and pressure-projection vectors (built
        once; traced as constants inside jit)."""
        cache = getattr(self, "_pr_cache", None)
        if cache is not None:
            return cache
        import numpy as np

        def pack_np(u_rows, p_row):
            u = jnp.asarray(np.stack(u_rows), dtype)
            p = jnp.asarray(p_row, dtype)
            return self.pr_pack(u, p)

        n_u = self.u_space.n_dofs_padded
        n_p = self.p_space.n_dofs_padded
        id_u = []
        for c in range(self.dim):
            m = np.zeros(n_u, np.float64)
            cd = self.constraints_u[c].constrained_dofs
            if len(cd):
                m[np.asarray(cd)] = 1.0
            id_u.append(m)
        mp = np.zeros(n_p, np.float64)
        cp = self.constraints_p.constrained_dofs
        if len(cp):
            mp[np.asarray(cp)] = 1.0
        m_id = pack_np(id_u, mp)
        # identity signs: +1 velocity rows, -1 pressure rows (cc:247-256)
        m_signed = pack_np(id_u, -mp)
        has_con = bool(max(len(self.constraints_p.constrained_dofs), *(
            len(self.constraints_u[c].constrained_dofs)
            for c in range(self.dim)
        )))
        proj = None
        if self.pressure_fix_mode is not None:
            # pressure-rows-only storage: the full packed (R_pad, L) form
            # would be captured as two O(32 EA) literals in every trace
            mode, weights, inv = self.pressure_fix_mode
            proj = (
                self.lat_p._parity_subs(jnp.asarray(mode, dtype)),
                self.lat_p._parity_subs(jnp.asarray(weights, dtype)),
                jnp.asarray(inv, dtype),
            )
        cache = self._pr_cache = (m_id, m_signed, has_con, proj)
        return cache

    def pr_coeff_stream(self, coeffs: "Coefficients"):
        """(ct, has) for the variable-coefficient resident kernel: the
        (3g, L) bf16 per-q-point [rho | mu | damping] stream on the anchor
        raster (None when all coefficients are constant). Build ONCE per
        time step (coefficients are frozen across a nonlinear solve)."""
        if (
            coeffs.rho is None
            and coeffs.mu is None
            and coeffs.damping is None
        ):
            return None, (False, False, False)
        from adaflo_tpu.ops.pallas_matvec import qcoeff_t

        g = self._pallas_tables.g
        ct = qcoeff_t(coeffs, self.n_q, g)
        ct = self.lat_u.cells_to_anchors(ct)
        has = (
            coeffs.rho is not None,
            coeffs.mu is not None,
            coeffs.damping is not None,
        )
        return ct, has

    def vmult_pr(
        self,
        x,
        tw: TimeWeights,
        lin: Linearized,
        ct=None,
        has=(False, False, False),
        scale=None,
        want_norm: bool = False,
    ):
        """Coupled mat-vec on packed parity vectors (pr_pack layout in and
        out) — the parity-resident fast path of vmult. Semantics match
        vmult exactly for lattice meshes without hanging nodes: constraint
        resolution/condensation reduce to elementwise masks, the identity
        rows fold into the kernel as a signed ids stream, and the
        pressure-average projection is applied in packed space.

        ct/has: optional variable-coefficient stream from pr_coeff_stream
        (two-phase rho/mu/damping per q point). scale: optional scalar
        folded into the output. want_norm: additionally return
        sum(out^2) (fused in-kernel; only exact when no pressure-fix
        projection applies afterwards)."""
        from adaflo_tpu.ops.pallas_matvec import (
            coupled_vmult_pr2,
            prepare_ig,
        )

        par = self.parameters
        m_id, m_signed, has_con, proj = self._pr_constants(x.dtype)
        s_t = lin.qt
        if s_t is None or s_t.shape[0] != self.dim * self.u_space.n_local:
            from adaflo_tpu.ops.pallas_matvec import qdofs_t

            s_t = qdofs_t(lin)
        if s_t.shape[-1] == self.u_space.mesh.n_cells:
            s_t = self.lat_u.cells_to_anchors(s_t)
        if ct is not None:
            prepare_ig(self._pallas_tables, self.ev_u)
        scalars = (
            par.beta_convective_term_momentum_balance,
            1.0,
            tw.weight,
            tw.tau1,
            par.density,
            par.viscosity,
            par.damping,
            par.tau_grad_div,
        )
        ids_t = None
        if has_con:
            ids_t = self._pr_ids_stream(x.dtype)
        r = coupled_vmult_pr2(
            x,
            s_t,
            self._pallas_tables,
            scalars,
            self._pr_rows_table(),
            self.lat_u.n_anchors,
            self.lat_u.anchor_shape,
            c_t=ct,
            has=has,
            ids_t=ids_t,
            scale=scale,
            want_norm=want_norm,
            interpret=self._pallas_interpret,
        )
        if want_norm:
            r, norm = r
        if proj is not None and not (
            par.linearization == Linearization.projection
            or par.physical_type == PhysicalType.incompressible_stationary
        ):
            mode_p, w_p, inv = proj
            p0 = self.dim * (self.lat_u.deg**self.dim)
            p1 = p0 + self.lat_p.deg**self.dim
            EA = self.lat_u.n_anchors
            s = jnp.vdot(w_p, r[p0:p1, :EA])
            r = r.at[p0:p1, :EA].add(-(s * inv) * mode_p)
        return (r, norm) if want_norm else r

    def _pr_ids_stream(self, dtype):
        """Signed constraint-identity stream for the pr2 kernel: the packed
        m_signed mask (+1 velocity / -1 pressure on constrained rows, 0
        elsewhere) in bf16, cached per operator."""
        cached = getattr(self, "_pr_ids_cache", None)
        if cached is None:
            _, m_signed, _, _ = self._pr_constants(dtype)
            cached = self._pr_ids_cache = m_signed.astype(
                jnp.bfloat16 if dtype == jnp.float32 else dtype
            )
        return cached

    def local_velocity_apply(
        self,
        uc,  # (E, dim, n_loc_u) cell-local velocity dofs
        tw: TimeWeights,
        lin: Optional[Linearized],
        coeffs: Coefficients = Coefficients(),
    ):
        """Cell-local velocity-block application (no gather/scatter); also
        used to extract the matrix diagonal for Jacobi/Chebyshev smoothing."""
        val_u = self.ev_u.values(uc)
        grad_u = self.ev_u.gradients(uc)
        submit_val, stress, _, _ = self._q_point_terms(
            "vmult_velocity", tw, val_u, grad_u, None, None, None, lin, coeffs
        )
        r_u = self.ev_u.integrate_gradients(stress)
        if submit_val is not None:
            r_u = r_u + self.ev_u.integrate_values(submit_val)
        return r_u

    def velocity_vmult(
        self,
        du,
        tw: TimeWeights,
        lin: Optional[Linearized],
        coeffs: Coefficients = Coefficients(),
    ):
        """(0,0)-block mat-vec (navier_stokes_matrix.cc:337-382)."""
        use_pallas = (
            self._pallas_tables is not None
            and lin is not None
            and lin.grad is not None
            and coeffs.rho is None
            and coeffs.mu is None
            and coeffs.damping is None
        )
        if use_pallas:
            # same fused kernel as the coupled vmult with zero pressure
            # input; the pressure output rows are discarded
            ru, _ = self._pallas_coupled_apply(du, None, tw, lin)
        else:
            uc = self._gather_u(du, resolve=True)
            r_u = self.local_velocity_apply(uc, tw, lin, coeffs)
            ru = self._scatter_u(r_u)
        for c in range(self.dim):
            ru = ru.at[c].set(self.constraints_u[c].set_identity(ru[c], du[c]))
        return ru

    def velocity_block_diagonal(
        self,
        tw: TimeWeights,
        lin: Optional[Linearized],
        coeffs: Coefficients = Coefficients(),
    ):
        """Exact matrix diagonal of the velocity block, assembled matrix-free
        by applying the cell-local kernel to unit local vectors (the standard
        matrix-free diagonal trick; serves the role of the reference's
        assembled preconditioner matrices for Jacobi/Chebyshev smoothing).
        Returns (dim, n_dofs_u) with 1.0 on constrained rows."""
        E = self.u_space.mesh.n_cells
        dim, n_loc = self.dim, self.u_space.n_local
        units = jnp.eye(dim * n_loc).reshape(dim * n_loc, dim, n_loc)

        def apply_unit(unit):
            uc = jnp.broadcast_to(unit[None], (E, dim, n_loc))
            return self.local_velocity_apply(uc, tw, lin, coeffs)

        # batch 4, not 16: each batched apply materializes (B, E, dim, n1^dim)
        # gradient intermediates whose (3, 3) minor dims tile-pad to
        # (8, 128) on TPU (~10x memory) — batch 16 held three ~6.6 GB
        # buffers at 128k cells and OOMed the 16 GB chip during the
        # flagship 3D two-phase setup
        out = jax.lax.map(apply_unit, units, batch_size=min(dim * n_loc, 4))
        # out: (dim*n_loc, E, dim, n_loc); take the matching entry
        out = out.reshape(dim, n_loc, E, dim, n_loc)
        idx_c = jnp.arange(dim)[:, None]
        idx_i = jnp.arange(n_loc)[None, :]
        diag_loc = out[idx_c, idx_i, :, idx_c, idx_i]  # (dim, n_loc, E)
        diag_loc = jnp.transpose(diag_loc, (2, 0, 1))  # (E, dim, n_loc)
        rows = []
        for c in range(dim):
            d = self.lat_u.scatter_add(diag_loc[:, c, :])
            cd = self.constraints_u[c].constrained_dofs
            if len(cd):
                d = d.at[cd].set(1.0)
            rows.append(d)
        return jnp.stack(rows)

    # ------------------------------------------------------------------
    def divergence_vmult_add(
        self, dst_p, u, weight_by_viscosity=False, coeffs: Coefficients = Coefficients(),
        plain=False,
    ):
        """dst_p += -(q, w * div u) (navier_stokes_matrix.cc:920-961)."""
        par = self.parameters
        uc = self._gather_u(u, resolve=not plain)
        grad_u = self.ev_u.gradients(uc)
        div = jnp.trace(grad_u, axis1=1, axis2=2)
        if weight_by_viscosity:
            mu = coeffs.mu if coeffs.mu is not None else par.viscosity
            w = -(mu if np.isscalar(mu) else mu)
        else:
            w = -1.0
        return dst_p + self._integrate_pressure_row(w * div)

    def pressure_poisson_vmult(
        self,
        p,
        inv_rho_weight,
        coeffs: Coefficients = Coefficients(),
        constraints: Optional[Constraints] = None,
    ):
        """(grad q, 1/(rho*weight) grad p) (navier_stokes_matrix.cc:965-1032).

        inv_rho_weight: traced scalar 1/(time_weight * rho_min), or 1.0 for
        the stationary case; the variable-coefficient branch passes per-q
        rho via coeffs (then inv_rho_weight is the 1/weight factor).
        `constraints` selects the Schur-complement constraint set when used
        inside the preconditioner (ns_prec.cc:386-415)."""
        con = constraints if constraints is not None else self.constraints_p
        ev = self.ev_p_low if coeffs.rho is None else self.ev_p
        pq, pcst = self._split_p(p)
        gc = self.lat_p.gather(con.resolve(pq))
        grad_p = ev.gradients(gc)
        if coeffs.rho is not None:
            grad_p = grad_p * (inv_rho_weight / coeffs.rho)[:, None, :]
        else:
            grad_p = grad_p * inv_rho_weight
        r = ev.integrate_gradients(grad_p)
        rq = con.condense(self.lat_p.scatter_add(r))
        if pcst is not None:
            # interior-penalty graph Laplacian between the cell constants
            # (ns_prec.cc:1649-1683; Q<->DG0 coupling dropped: this operator
            # only preconditions the Schur complement)
            rc = self._dg0_graph_laplacian(pcst) * inv_rho_weight
            rp = self._join_p(rq, rc)
        else:
            rp = rq
        cp = con.constrained_dofs
        if len(cp):
            rp = rp.at[cp].set(p[cp])
        return rp

    def _dg0_graph_laplacian(self, pc):
        """sum_faces penalty * |F| * (p_K - p_K') over interior faces; the
        penalty deg(deg+1)/h matches the reference's IP parameter. Uniform
        lattices use banded diffs; graded lattices and adaptive forests a
        static face list."""
        faces = self._dg0_faces()
        if faces is not None:
            fi, fj = jnp.asarray(faces[0]), jnp.asarray(faces[1])
            fc = jnp.asarray(faces[2], pc.dtype)
            d = fc * (pc[fi] - pc[fj])
            return jnp.zeros_like(pc).at[fi].add(d).at[fj].add(-d)
        mesh = self.u_space.mesh
        dim = self.dim
        deg = self.p_space.degree
        vol = float(np.prod(mesh.h))
        P = pc.reshape(tuple(reversed(mesh.n_cells_axis)))
        out = jnp.zeros_like(P)
        for a in range(dim):
            ax = dim - 1 - a
            coeff = (deg * (deg + 1) / mesh.h[a]) * (vol / mesh.h[a])
            d = jnp.diff(P, axis=ax)  # p_{i+1} - p_i
            pad = [(0, 0)] * dim
            lo = [(0, 0)] * dim
            lo[ax] = (0, 1)
            hi = [(0, 0)] * dim
            hi[ax] = (1, 0)
            out = out + coeff * (
                jnp.pad(-d, lo) + jnp.pad(d, hi)
            )
        return out.reshape(-1)

    def pressure_convdiff_vmult(
        self, p, coeffs: Coefficients = Coefficients(),
        constraints: Optional[Constraints] = None,
    ):
        """mu-weighted pressure Laplacian for the Kay-Loghin-Wathen
        stationary Schur complement (navier_stokes_matrix.cc:1099-1140; the
        convective part is disabled in the reference as well)."""
        con = constraints if constraints is not None else self.constraints_p
        ev = self.ev_p
        pc = self._gather_p_con(p, con)
        grad_p = ev.gradients(pc)
        mu = coeffs.mu if coeffs.mu is not None else self.parameters.viscosity
        grad_p = grad_p * (mu if np.isscalar(mu) else mu[:, None, :])
        rp = self._scatter_p_con(ev.integrate_gradients(grad_p), con)
        cp = con.constrained_dofs
        if len(cp):
            rp = rp.at[cp].set(p[cp])
        return rp

    def pressure_mass_vmult(
        self, p, coefficient, coeffs: Coefficients = Coefficients(),
        constraints: Optional[Constraints] = None,
    ):
        """(q, c p) with c = 1/(mu + tau_gd) or 1 (cc:1036-1071). `coefficient`
        is a scalar or a per-cell (E,) array (the reference reads the
        cell-center viscosity per cell, nsm.cc:1050-1056)."""
        con = constraints if constraints is not None else self.constraints_p
        ev = self.ev_p_low
        pq, pcst = self._split_p(p)
        val = ev.values(self.lat_p.gather(con.resolve(pq)))
        if pcst is not None:
            val = val + pcst[:, None]
        coefficient = jnp.asarray(coefficient)
        val = val * (
            coefficient if coefficient.ndim == 0 else coefficient[:, None]
        )
        rq = con.condense(self.lat_p.scatter_add(ev.integrate_values(val)))
        if pcst is not None:
            rc = self._dg0_integrate(ev, val)
            rp = self._join_p(rq, rc)
        else:
            rp = rq
        cp = con.constrained_dofs
        if len(cp):
            rp = rp.at[cp].set(p[cp])
        # project the DG0 constant mode (cc:449-454)
        if (
            self.pressure_dg0_mode is not None
            and self.parameters.linearization != Linearization.projection
        ):
            m1, w1, i1 = self.pressure_dg0_mode
            rp = rp - (w1 @ rp) * i1 * m1
        return rp

    def _gather_p_con(self, p, con: Constraints):
        return self.lat_p.gather(con.resolve(p))

    def _scatter_p_con(self, r_cells, con: Constraints):
        return con.condense(self.lat_p.scatter_add(r_cells))

    def pressure_poisson_diagonal(
        self, inv_rho_weight, constraints=None, coeffs: Coefficients = Coefficients()
    ):
        """Exact diagonal of the pressure Poisson operator (unit-vector
        trick), for Jacobi/Chebyshev smoothing. With variable density the
        per-q 1/rho enters like in pressure_poisson_vmult (then
        inv_rho_weight is the 1/weight factor)."""
        con = constraints if constraints is not None else self.constraints_p
        ev = self.ev_p_low if coeffs.rho is None else self.ev_p
        E = self.u_space.mesh.n_cells
        n_loc = self.p_space.n_local
        units = jnp.eye(n_loc)

        def apply_unit(unit):
            pc = jnp.broadcast_to(unit[None], (E, n_loc))
            g = ev.gradients(pc)
            if coeffs.rho is not None:
                g = g * (inv_rho_weight / coeffs.rho)[:, None, :]
            else:
                g = g * inv_rho_weight
            return ev.integrate_gradients(g)

        out = jax.lax.map(apply_unit, units, batch_size=min(n_loc, 4))
        idx = jnp.arange(n_loc)
        diag_loc = jnp.transpose(out[idx, :, idx], (1, 0))  # (E, n_loc)
        d = self.lat_p.scatter_add(diag_loc)
        if self.augmented:
            d = self._join_p(d, self.dg0_diagonal() * inv_rho_weight)
        if len(con.constrained_dofs):
            d = d.at[con.constrained_dofs].set(1.0)
        return d

    def pressure_lumped_mass(self, coefficient=None):
        """Lumped pressure mass diagonal (for the diagonal preconditioner of
        the mass solves, diagonal_preconditioner.cc); includes the DG0 cell
        volumes for augmented TH. `coefficient`: optional per-cell (E,)
        weight (the variable-viscosity 1/(mu+tau) of the scaled mass)."""
        E = self.u_space.mesh.n_cells
        ones = jnp.ones((E, self.ev_p_low.n_q))
        if coefficient is not None:
            coefficient = jnp.asarray(coefficient)
            ones = ones * (
                coefficient
                if coefficient.ndim == 0
                else coefficient[:, None]
            )
        lumped = self._scatter_p_plain(self.ev_p_low.integrate_values(ones))
        if not self.augmented:
            return lumped
        cvol = self._cell_volumes()
        if coefficient is not None:
            cvol = cvol * coefficient
        return self._join_p(lumped, cvol)

    def dg0_diagonal(self):
        """Diagonal of the DG0 interior-penalty graph Laplacian."""
        faces = self._dg0_faces()
        if faces is not None:
            fi, fj = jnp.asarray(faces[0]), jnp.asarray(faces[1])
            fc = jnp.asarray(faces[2])
            E = self.u_space.mesh.n_cells
            return (
                jnp.zeros(E, fc.dtype).at[fi].add(fc).at[fj].add(fc)
            )
        mesh = self.u_space.mesh
        deg = self.p_space.degree
        vol = float(np.prod(mesh.h))
        diag = np.zeros(tuple(reversed(mesh.n_cells_axis)))
        for a in range(self.dim):
            ax = self.dim - 1 - a
            coeff = (deg * (deg + 1) / mesh.h[a]) * (vol / mesh.h[a])
            n_faces = np.full(mesh.n_cells_axis[a], 2)
            n_faces[0] = n_faces[-1] = 1
            shape = [1] * self.dim
            shape[ax] = -1
            diag = diag + coeff * n_faces.reshape(shape)
        return jnp.asarray(diag.reshape(-1))
