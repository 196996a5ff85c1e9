"""Shared two-phase infrastructure.

TPU-native counterpart of the reference's TwoPhaseBaseAlgorithm
(/root/reference/source/two_phase_base.cc): owns the Navier-Stokes solver and
the FE_Q_iso_Q1 concentration space, concentration extrapolation, adaptive
time step from the CFL + capillary limit (cc:596-617), maximal velocity /
concentration range diagnostics, and the 2D bubble statistics with explicit
zero-contour reconstruction (cc:621-968).
"""

from __future__ import annotations

import sys
from typing import Optional

import jax.numpy as jnp
import numpy as np

from adaflo_tpu.fe.basis import equidistant_points
from adaflo_tpu.fe.constraints import Constraints
from adaflo_tpu.fe.space import ScalarSpace
from adaflo_tpu.mesh.structured import StructuredMesh
from adaflo_tpu.ops.tensor import CellEvaluator
from adaflo_tpu.parameters import FlowParameters
from adaflo_tpu.solvers.navier_stokes_solver import NavierStokes, fmt_g


class TwoPhaseBaseAlgorithm:
    def __init__(
        self,
        parameters: FlowParameters,
        mesh: StructuredMesh,
        concentration_support: str = "iso_q1",
        out=None,
        pad_dofs_to: int = 1,
    ) -> None:
        self.parameters = parameters
        self.mesh = mesh
        self.out = out
        self.pad_dofs_to = pad_dofs_to
        self.navier_stokes = NavierStokes(
            parameters, mesh, out=out, pad_dofs_to=pad_dofs_to
        )
        self.boundary = self.navier_stokes.boundary
        self.time_stepping = self.navier_stokes.time_stepping
        self.concentration_support = concentration_support
        self.curvature_name = "curvature"
        self.last_concentration_range = (-1.0, 1.0)
        self.global_omega_diameter = 0.0
        self.last_refine_step = 0
        self.refine_lower_level_limit = 0
        # jitted single-readback diagnostics (built lazily on first use)
        self._maxvel_fn = None
        self._crange_fn = None
        self._ls_extrapolate_fn = None

    # -- BC setter API delegated to the NS solver (the reference inherits
    # FlowBaseAlgorithm on both; here the descriptor lives on the NS solver)
    def __getattr__(self, name):
        if name.startswith("set_") or name == "fix_pressure_constant":
            return getattr(self.navier_stokes, name)
        raise AttributeError(name)

    def _p(self, *a, **k):
        print(*a, **k, file=self.out or sys.stdout)

    @property
    def is_forest(self) -> bool:
        from adaflo_tpu.mesh.forest import ForestMesh

        return isinstance(self.mesh, ForestMesh)

    @property
    def is_mapped(self) -> bool:
        from adaflo_tpu.mesh.extruded import ExtrudedMesh
        from adaflo_tpu.mesh.unstructured import QuadMesh

        return isinstance(self.mesh, (QuadMesh, ExtrudedMesh))

    @property
    def is_extruded(self) -> bool:
        from adaflo_tpu.mesh.extruded import ExtrudedMesh

        return isinstance(self.mesh, ExtrudedMesh)

    @property
    def is_simplex(self) -> bool:
        from adaflo_tpu.mesh.unstructured import TriMesh

        return isinstance(self.mesh, TriMesh)

    # ------------------------------------------------------------------
    def setup_problem(self, initial_velocity_fn, initial_distance_fn) -> None:
        par = self.parameters
        mesh = self.mesh
        if hasattr(mesh, "lengths"):
            self.global_omega_diameter = float(np.linalg.norm(mesh.lengths))
        else:
            # unstructured: bounding-box diagonal (GridTools::diameter)
            span = mesh.vertices.max(axis=0) - mesh.vertices.min(axis=0)
            self.global_omega_diameter = float(np.linalg.norm(span))
        if par.global_refinements < 15:
            mesh.refine_global(par.global_refinements)

        # the NS solver must not refine again
        saved = par.global_refinements
        par.global_refinements = 0
        self.navier_stokes.setup_problem(initial_velocity_fn)
        par.global_refinements = saved

        self._setup_ls_discretization()
        self._apply_initial_distance(initial_distance_fn)

        # AMR warm-up: refine towards the interface, re-interpolating the
        # initial conditions after every adaptation (two_phase_base.cc:161-188)
        self.refine_lower_level_limit = (
            mesh.max_level if self.is_forest else 0
        )
        if self.is_forest and par.adaptive_refinements > 0:
            for _ in range(par.adaptive_refinements + 1):
                self.refine_grid()
                vals = np.asarray(
                    initial_velocity_fn(
                        self.navier_stokes.u_space.node_coords, 0.0
                    )
                )
                ns = self.navier_stokes
                ns.solution[0] = (
                    jnp.zeros_like(ns.solution[0])
                    .at[:, : vals.shape[1]]
                    .set(jnp.asarray(vals))
                )
                self._apply_initial_distance(initial_distance_fn)

        # divergence-free initial velocity if starting from zero
        if float(jnp.linalg.norm(self.navier_stokes.solution[0])) == 0:
            self.navier_stokes.compute_initial_stokes_field()

    def _setup_ls_discretization(self) -> None:
        """Build the concentration space, constraints, epsilon and vectors
        for the current mesh; prints the dof/mesh-size block
        (two_phase_base.cc:229-304). Re-entered after forest adaptation."""
        par = self.parameters
        mesh = self.mesh
        if self.is_forest:
            from adaflo_tpu.fe.forest_space import ForestSpace

            self.ls_space = ForestSpace(
                mesh, par.concentration_subdivisions, self.concentration_support
            )
        elif self.is_simplex:
            # FE_SimplexP(concentration subdivisions) (level_set_base.cc:54-60)
            from adaflo_tpu.fe.simplex import SimplexSpace

            self.ls_space = SimplexSpace(mesh, par.concentration_subdivisions)
        elif self.is_extruded:
            from adaflo_tpu.fe.extruded_space import ExtrudedSpace

            self.ls_space = ExtrudedSpace(
                mesh,
                par.concentration_subdivisions,
                self.navier_stokes.cell_mapping,
                self.concentration_support,
            )
        elif self.is_mapped:
            from adaflo_tpu.fe.mapped_space import MappedSpace

            self.ls_space = MappedSpace(
                mesh,
                par.concentration_subdivisions,
                self.navier_stokes.cell_mapping,
                self.concentration_support,
            )
        else:
            self.ls_space = ScalarSpace(
                mesh, par.concentration_subdivisions, self.concentration_support
            )
        if self.pad_dofs_to > 1:
            self.ls_space.set_padding(self.pad_dofs_to)
        self._build_ls_constraints()
        self.print_n_dofs()

        # epsilon for interface smoothing (two_phase_base.cc:280-291):
        # largest diameter among FINEST-level cells / smallest edge overall
        if self.is_forest:
            h_cells = self.ls_space.h_cells
            levels = self.ls_space.levels
            finest = levels == levels.max()
            self.cell_diameter = float(np.max(h_cells[finest]))
            self.minimal_edge_length = float(np.min(h_cells))
        elif self.is_simplex:
            from adaflo_tpu.fe.simplex import simplex_cell_diameters

            _, gmin, gmax = simplex_cell_diameters(mesh)
            self.cell_diameter = gmax
            self.minimal_edge_length = gmin
        elif self.is_extruded:
            _, gmin, gmax = mesh.diameters()
            self.cell_diameter = gmax
            self.minimal_edge_length = gmin
        elif self.is_mapped:
            _, gmin, gmax = self.navier_stokes.cell_mapping.cell_diameters()
            self.cell_diameter = gmax
            self.minimal_edge_length = gmin
        else:
            self.cell_diameter = float(np.max(mesh.h))
            self.minimal_edge_length = float(np.min(mesh.h))
        self._p(
            "Mesh size (largest/smallest element length at finest level): "
            f"{self.cell_diameter:.6g} / {self.minimal_edge_length:.6g}"
        )
        self.epsilon_used = (
            par.epsilon / par.concentration_subdivisions * self.cell_diameter
        )

        n = self.ls_space.n_dofs_padded
        self.solution = [jnp.zeros(n), jnp.zeros(n)]  # (concentration, curvature)
        self.solution_old = [jnp.zeros(n), jnp.zeros(n)]
        self.solution_old_old = [jnp.zeros(n), jnp.zeros(n)]
        self.heaviside = jnp.zeros(n)
        self.normal_vector_field = jnp.zeros((mesh.dim, n))

        self.initialize_data_structures()

    def _apply_initial_distance(self, initial_distance_fn) -> None:
        n = self.ls_space.n_dofs_padded
        dist = np.asarray(initial_distance_fn(self.ls_space.node_coords, 0.0))
        c0 = jnp.zeros(n).at[: len(dist)].set(jnp.asarray(dist))
        c0 = self.transform_distance_function(c0)
        c0 = self.hanging_constraints_ls.distribute_values(c0)
        self.solution[0] = c0

    def _build_ls_constraints(self) -> None:
        """Concentration constraints: inflow (fluid-type) Dirichlet plus
        hanging nodes; normals and curvature carry the hanging constraints
        only (two_phase_base.cc:200-224)."""
        n = self.ls_space.n_dofs
        hang = getattr(self.ls_space, "hanging_slave", None)

        def add_hanging(con: Constraints) -> None:
            if hang is not None and len(hang):
                con.add_affine(
                    self.ls_space.hanging_slave,
                    self.ls_space.hanging_master,
                    self.ls_space.hanging_weight,
                )

        con = Constraints(n)
        for bid in self.boundary.fluid_type:
            con.add_dirichlet(self.ls_space.boundary_dofs(bid))
        add_hanging(con)
        con.close()
        self.constraints_ls = con
        cn = Constraints(n)
        add_hanging(cn)
        cn.close()
        self.constraints_normals = cn
        ck = Constraints(n)
        add_hanging(ck)
        ck.close()
        self.constraints_curvature = ck
        ch = Constraints(n)
        add_hanging(ch)
        ch.close()
        self.hanging_constraints_ls = ch

    def initialize_data_structures(self) -> None:
        """Overridden by concrete solvers (OKZ adds preconditioners)."""

    def transform_distance_function(self, vector):
        raise NotImplementedError

    def print_n_dofs(self) -> None:
        ns = self.navier_stokes
        nu, npp = ns.n_dofs
        self._p("")
        self._p(f"Number of active cells: {self.mesh.n_cells}.")
        self._p(
            f"Number of Navier-Stokes degrees of freedom: "
            f"{nu + npp} ({nu} + {npp})."
        )
        self._p(
            f"Number of level set degrees of freedom: {self.ls_space.n_dofs}."
        )

    # ------------------------------------------------------------------
    def init_time_advance(self) -> None:
        """NS extrapolation + concentration extrapolation with step-size
        ratios (two_phase_base.cc:441-475)."""
        self.navier_stokes.init_time_advance(self.parameters.output_verbosity > 0)
        ts = self.time_stepping
        k, ko = ts.step_size(), ts.old_step_size()
        sol, old = self.solution, self.solution_old
        if ko > 0:
            if self._ls_extrapolate_fn is None:
                import jax

                self._ls_extrapolate_fn = jax.jit(
                    lambda s, o, a, b: [a * si + b * oi for si, oi in zip(s, o)]
                )
            a, b = (k + ko) / ko, -k / ko
            upd = self._ls_extrapolate_fn(
                sol, old, jnp.float64(a), jnp.float64(b)
            )
        else:
            upd = list(sol)
        self.solution_old_old = list(old)
        self.solution_old = list(sol)
        self.solution = upd

        if self.parameters.output_verbosity == 0:
            ts_ = self.time_stepping
            freq = self.parameters.output_frequency
            time = ts_.now()
            position = int(time * 1.0000000001 / freq)
            slot = position * freq
            if (time - slot) < ts_.step_size() * 0.95:
                self._p(f"{fmt_g(time)} ", end="", flush=True)

    # ------------------------------------------------------------------
    def _unit_h(self):
        """Geometry placeholder for values-only evaluations (values never
        touch the cell extents, so unit h serves any mesh type)."""
        return (
            (1.0,) * self.mesh.dim
            if (self.is_forest or self.is_mapped or self.is_simplex)
            else self.mesh.h
        )

    @staticmethod
    def _simplex_value_table(space, n_points: int):
        """Dense (n_pts, n_local) value tabulation of a SimplexSpace element
        at the equidistant barycentric lattice (incl. vertices/edges — so
        min/max diagnostics see the extremal boundary values, matching the
        reference's equidistant point sets, two_phase_base.cc:487).

        `n_points` counts POINTS per edge (like the quad path's
        equidistant_points argument), i.e. n_points-1 subdivisions — the
        reference's QIterated(deg+1 / deg+2 subdivisions) point-set parity."""
        n_sub = max(n_points - 1, 1)
        ij = [
            (i, j)
            for i in range(n_sub + 1)
            for j in range(n_sub + 1 - i)
        ]
        pts = np.asarray(ij, dtype=float) / n_sub
        V, _ = space.element.tabulate(pts)
        return jnp.asarray(V)

    def get_maximal_velocity(self) -> float:
        """Max |u| over an equidistant point lattice per cell
        (two_phase_base.cc:479-509)."""
        ns = self.navier_stokes
        # fully on-device: gather, evaluate, reduce — ONE scalar readback
        # (the previous host pull of the full velocity vector cost a
        # multi-MB device->host transfer per step through the TPU tunnel)
        cd = jnp.asarray(ns.u_space.cell_dofs)
        if self.is_simplex:
            V = self._simplex_value_table(
                ns.u_space, self.parameters.velocity_degree + 2
            )

            def _maxvel(u):
                cells = jnp.transpose(u[:, cd], (1, 0, 2))
                vals = jnp.einsum("qi,eci->ecq", V, cells)
                return jnp.sqrt((vals**2).sum(axis=1)).max()

        else:
            pts = equidistant_points(self.parameters.velocity_degree + 2)
            ev = CellEvaluator(
                self.mesh.dim,
                ns.u_space.basis,
                (pts, np.zeros_like(pts)),
                self._unit_h(),
            )

            def _maxvel(u):
                cells = jnp.transpose(u[:, cd], (1, 0, 2))
                vals = ev.values(cells)
                return jnp.sqrt((vals**2).sum(axis=1)).max()

        if self._maxvel_fn is None:
            import jax

            self._maxvel_fn = jax.jit(_maxvel)
        return float(self._maxvel_fn(ns.solution[0]))

    def get_concentration_range(self) -> tuple[float, float]:
        """Range over an equidistant lattice (two_phase_base.cc:513-545)."""
        cd = jnp.asarray(self.ls_space.cell_dofs)
        if self.is_simplex:
            V = self._simplex_value_table(self.ls_space, self.ls_space.degree + 3)

            def _crange(c):
                vals = jnp.einsum("qi,ei->eq", V, c[cd])
                return vals.min(), vals.max()

        else:
            pts = equidistant_points(self.ls_space.degree + 3)
            ev = CellEvaluator(
                self.mesh.dim,
                self.ls_space.basis,
                (pts, np.zeros_like(pts)),
                self._unit_h(),
            )

            def _crange(c):
                vals = ev.values(c[cd])
                return vals.min(), vals.max()

        if self._crange_fn is None:
            import jax

            self._crange_fn = jax.jit(_crange)
        import jax

        lo, hi = jax.device_get(self._crange_fn(self.solution[0]))
        self.last_concentration_range = (float(lo), float(hi))
        return self.last_concentration_range

    def set_adaptive_time_step(self, norm_velocity: float) -> None:
        """CFL + capillary limit (two_phase_base.cc:596-617; note the
        reference uses the viscosity pair in the capillary term)."""
        par = self.parameters
        cfl = par.time_stepping_cfl
        rho_2 = par.viscosity_diff + par.viscosity
        coef_2 = par.time_stepping_coef2
        sigma = par.surface_tension
        h = self.minimal_edge_length
        denom = 1.0 / (cfl * h / max(norm_velocity, 1e-300)) + 1.0 / (
            coef_2 * np.sqrt(rho_2 / sigma) * h**1.5
        )
        self.time_stepping.set_desired_time_step(1.0 / denom)

    # ------------------------------------------------------------------
    def compute_bubble_statistics(
        self, sub_refinements: Optional[int] = None
    ) -> list[float]:
        """2D bubble diagnostics with explicit sub-cell interface
        reconstruction (two_phase_base.cc:621-968): area, perimeter,
        circularity, mean velocity, center of mass; also sets the adaptive
        time step and prints the diagnostics block. The 3D variant uses the
        smeared heaviside/delta form (two_phase_base.cc:972-1091)."""
        if self.mesh.dim == 3:
            return self._compute_bubble_statistics_3d()
        if self.is_simplex:
            raise NotImplementedError(
                "bubble statistics on simplex meshes: triangle sub-cell "
                "contouring is not implemented (quad/forest meshes only)"
            )
        if self.is_forest or self.is_mapped:
            return self._compute_bubble_statistics_forest(sub_refinements)
        par = self.parameters
        ns = self.navier_stokes
        sub = (
            par.velocity_degree + 3 if sub_refinements in (None, 0) else sub_refinements
        ) or par.velocity_degree + 3

        # evaluate c and u on the (sub+1)^2 equidistant lattice of every cell
        pts = equidistant_points(sub + 1)
        ev_c = CellEvaluator(
            2, self.ls_space.basis, (pts, np.zeros_like(pts)), self.mesh.h
        )
        ev_u = CellEvaluator(2, ns.u_space.basis, (pts, np.zeros_like(pts)), self.mesh.h)
        c = np.asarray(self.solution[0])
        u = np.asarray(ns.solution[0])
        c_vals = np.asarray(
            ev_c.values(jnp.asarray(c[self.ls_space.cell_dofs]))
        )  # (E, (sub+1)^2)
        u_cells = jnp.asarray(np.transpose(u[:, ns.u_space.cell_dofs], (1, 0, 2)))
        u_vals = np.asarray(ev_u.values(u_cells))  # (E, 2, (sub+1)^2)
        qc = ev_c.quad_coords(self.mesh)  # (E, (sub+1)^2, 2)

        # interface cells: sign change among concentration dofs
        c_dof_vals = c[self.ls_space.cell_dofs]
        crosses = (c_dof_vals * c_dof_vals[:, :1] <= 0).any(axis=1)

        area = 0.0
        perimeter = 0.0
        com = np.zeros(2)
        vel = np.zeros(2)

        # -- interior cells: plain Gauss quadrature ----------------------
        inside = (~crosses) & (c_dof_vals[:, 0] > 0)
        if inside.any():
            evg = CellEvaluator(2, ns.u_space.basis, par.velocity_degree, self.mesh.h)
            qg = evg.quad_coords(self.mesh)[inside]
            ug = np.asarray(ev_values(evg, u, ns.u_space, inside))
            jxw = np.asarray(evg.jxw)
            area += jxw.sum() * inside.sum()
            com += np.einsum("eqd,q->d", qg, jxw)
            vel += np.einsum("edq,q->d", ug, jxw)

        # -- interface cells: subdivided patches -------------------------
        idx = np.flatnonzero(crosses)
        if len(idx):
            n1 = sub + 1
            cv = c_vals[idx].reshape(-1, n1, n1) + 1e-22
            uv = u_vals[idx].reshape(-1, 2, n1, n1)
            qq = qc[idx].reshape(-1, n1, n1, 2)
            subcell_area = float(np.prod(self.mesh.h)) / (sub * sub)
            w4 = subcell_area / 4.0

            # corners of each subcell: [y, x] patches
            c00 = cv[:, :-1, :-1].reshape(-1)
            c01 = cv[:, :-1, 1:].reshape(-1)
            c10 = cv[:, 1:, :-1].reshape(-1)
            c11 = cv[:, 1:, 1:].reshape(-1)
            p00 = qq[:, :-1, :-1, :].reshape(-1, 2)
            p01 = qq[:, :-1, 1:, :].reshape(-1, 2)
            p10 = qq[:, 1:, :-1, :].reshape(-1, 2)
            p11 = qq[:, 1:, 1:, :].reshape(-1, 2)
            v00 = uv[:, :, :-1, :-1].reshape(len(idx), 2, -1)
            v01 = uv[:, :, :-1, 1:].reshape(len(idx), 2, -1)
            v10 = uv[:, :, 1:, :-1].reshape(len(idx), 2, -1)
            v11 = uv[:, :, 1:, 1:].reshape(len(idx), 2, -1)
            v00 = np.moveaxis(v00, 1, 2).reshape(-1, 2)
            v01 = np.moveaxis(v01, 1, 2).reshape(-1, 2)
            v10 = np.moveaxis(v10, 1, 2).reshape(-1, 2)
            v11 = np.moveaxis(v11, 1, 2).reshape(-1, 2)

            a_frac, per = _patch_area_perimeter(c00, c01, c10, c11, p00, p01, p10, p11)
            perimeter += per.sum()
            w = a_frac[:, None] * w4
            area += 4.0 * (a_frac * w4).sum()
            com += (w * (p00 + p01 + p10 + p11)).sum(axis=0)
            vel += (w * (v00 + v01 + v10 + v11)).sum(axis=0)

        norm_v = np.linalg.norm(vel)
        self.set_adaptive_time_step(norm_v / area)
        circularity = 2.0 * np.sqrt(area * np.pi) / perimeter if perimeter > 0 else 0.0

        if par.output_verbosity > 0:
            self._p(f"  Degree of circularity: {fmt8(circularity)}")
            vstr = "  ".join(
                fmt8(0.0 if abs(vel[d]) < 1e-7 * norm_v else vel[d] / area)
                for d in range(2)
            )
            self._p(f"  Mean bubble velocity: {vstr}  ")
            cstr = "  ".join(
                fmt8(
                    0.0
                    if abs(com[d]) < 1e-7 * self.global_omega_diameter
                    else com[d] / area
                )
                for d in range(2)
            )
            self._p(f"  Position of the center of mass:  {cstr}  ")
            lo, hi = self.get_concentration_range()
            self._p(f"  Range of level set values: {fmt8(lo)} / {fmt8(hi)}")

        data = [self.time_stepping.now(), area, perimeter, circularity]
        data += [vel[d] / area for d in range(2)]
        data += [com[d] / area for d in range(2)]
        return data

    def _compute_bubble_statistics_forest(
        self, sub_refinements: Optional[int] = None
    ) -> list[float]:
        """2D bubble diagnostics on the adaptive forest: the same sub-cell
        interface reconstruction as the uniform path, with per-cell geometry
        (quad coordinates, JxW and patch areas vary per cell)."""
        from adaflo_tpu.ops.tensor import VariableCellEvaluator

        par = self.parameters
        ns = self.navier_stokes
        sp = self.ls_space
        usp = ns.u_space
        sub = (
            par.velocity_degree + 3 if sub_refinements in (None, 0) else sub_refinements
        ) or par.velocity_degree + 3

        pts = equidistant_points(sub + 1)
        if self.is_forest:
            ev_c = VariableCellEvaluator(
                2, sp.basis, (pts, np.zeros_like(pts)), sp.h_cells
            )
            ev_u = VariableCellEvaluator(
                2, usp.basis, (pts, np.zeros_like(pts)), sp.h_cells
            )
            evg = VariableCellEvaluator(
                2, usp.basis, par.velocity_degree, sp.h_cells
            )
            cell_area = np.prod(sp.h_cells, axis=1)
            # Cartesian cells: uniform sub-patch areas are exact
            patch_areas = np.broadcast_to(
                (cell_area / (sub * sub))[:, None], (len(cell_area), sub * sub)
            )
        else:
            from adaflo_tpu.ops.mapped import MappedEvaluator

            mp = ns.cell_mapping
            ev_c = MappedEvaluator(2, sp.basis, (pts, np.zeros_like(pts)), mp)
            ev_u = MappedEvaluator(2, usp.basis, (pts, np.zeros_like(pts)), mp)
            evg = MappedEvaluator(2, usp.basis, par.velocity_degree, mp)
            # curved cells: per-patch area = |det J| at the patch center times
            # the reference patch area, honoring intra-cell Jacobian variation
            cc = (np.arange(sub) + 0.5) / sub
            pyg, pxg = np.meshgrid(cc, cc, indexing="ij")
            probes = np.stack([pxg.ravel(), pyg.ravel()], axis=1)
            Jp, _ = mp.jacobians(probes)  # (E, sub*sub, 2, 2)
            detp = np.abs(
                Jp[..., 0, 0] * Jp[..., 1, 1] - Jp[..., 0, 1] * Jp[..., 1, 0]
            )
            patch_areas = detp / (sub * sub)
        c = np.asarray(self.hanging_constraints_ls.distribute_values(self.solution[0]))
        u = np.asarray(ns.solution[0])
        c_vals = np.asarray(ev_c.values(jnp.asarray(c)[sp.cell_dofs]))
        u_cells = jnp.asarray(np.transpose(u[:, usp.cell_dofs], (1, 0, 2)))
        u_vals = np.asarray(ev_u.values(u_cells))  # (E, 2, (sub+1)^2)
        qc = ev_c.quad_coords(sp)  # (E, (sub+1)^2, 2)

        c_dof_vals = c[sp.cell_dofs]
        crosses = (c_dof_vals * c_dof_vals[:, :1] <= 0).any(axis=1)

        area = 0.0
        perimeter = 0.0
        com = np.zeros(2)
        vel = np.zeros(2)

        # interior cells: per-cell Gauss quadrature
        inside = (~crosses) & (c_dof_vals[:, 0] > 0)
        if inside.any():
            qg = evg.quad_coords(sp)[inside]
            ug = np.asarray(ev_values(evg, u, usp, inside))
            jxw = np.asarray(evg.jxw_cells)[inside]
            area += jxw.sum()
            com += np.einsum("eqd,eq->d", qg, jxw)
            vel += np.einsum("edq,eq->d", ug, jxw)

        # interface cells: subdivided patches with per-cell patch areas
        idx = np.flatnonzero(crosses)
        if len(idx):
            n1 = sub + 1
            cv = c_vals[idx].reshape(-1, n1, n1) + 1e-22
            uv = u_vals[idx].reshape(-1, 2, n1, n1)
            qq = qc[idx].reshape(-1, n1, n1, 2)
            w4 = patch_areas[idx].reshape(-1) / 4.0  # per patch

            c00 = cv[:, :-1, :-1].reshape(-1)
            c01 = cv[:, :-1, 1:].reshape(-1)
            c10 = cv[:, 1:, :-1].reshape(-1)
            c11 = cv[:, 1:, 1:].reshape(-1)
            p00 = qq[:, :-1, :-1, :].reshape(-1, 2)
            p01 = qq[:, :-1, 1:, :].reshape(-1, 2)
            p10 = qq[:, 1:, :-1, :].reshape(-1, 2)
            p11 = qq[:, 1:, 1:, :].reshape(-1, 2)
            v00 = np.moveaxis(uv[:, :, :-1, :-1].reshape(len(idx), 2, -1), 1, 2).reshape(-1, 2)
            v01 = np.moveaxis(uv[:, :, :-1, 1:].reshape(len(idx), 2, -1), 1, 2).reshape(-1, 2)
            v10 = np.moveaxis(uv[:, :, 1:, :-1].reshape(len(idx), 2, -1), 1, 2).reshape(-1, 2)
            v11 = np.moveaxis(uv[:, :, 1:, 1:].reshape(len(idx), 2, -1), 1, 2).reshape(-1, 2)

            a_frac, per = _patch_area_perimeter(c00, c01, c10, c11, p00, p01, p10, p11)
            perimeter += per.sum()
            w = a_frac[:, None] * w4[:, None]
            area += 4.0 * (a_frac * w4).sum()
            com += (w * (p00 + p01 + p10 + p11)).sum(axis=0)
            vel += (w * (v00 + v01 + v10 + v11)).sum(axis=0)

        norm_v = np.linalg.norm(vel)
        self.set_adaptive_time_step(norm_v / area)
        circularity = 2.0 * np.sqrt(area * np.pi) / perimeter if perimeter > 0 else 0.0

        if par.output_verbosity > 0:
            self._p(f"  Degree of circularity: {fmt8(circularity)}")
            vstr = "  ".join(
                fmt8(0.0 if abs(vel[d]) < 1e-7 * norm_v else vel[d] / area)
                for d in range(2)
            )
            self._p(f"  Mean bubble velocity: {vstr}  ")
            cstr = "  ".join(
                fmt8(
                    0.0
                    if abs(com[d]) < 1e-7 * self.global_omega_diameter
                    else com[d] / area
                )
                for d in range(2)
            )
            self._p(f"  Position of the center of mass:  {cstr}  ")
            lo, hi = self.get_concentration_range()
            self._p(f"  Range of level set values: {fmt8(lo)} / {fmt8(hi)}")

        data = [self.time_stepping.now(), area, perimeter, circularity]
        data += [vel[d] / area for d in range(2)]
        data += [com[d] / area for d in range(2)]
        return data

    def _compute_bubble_statistics_3d(self) -> list[float]:
        """Smeared heaviside-delta 3D bubble diagnostics
        (two_phase_base.cc:972-1091): volume = int H, surface area =
        0.5 int |grad c|, velocity/center weighted by H, sphericity."""
        import jax.numpy as jnp

        from adaflo_tpu.fe.basis import iterated_gauss_quadrature
        from adaflo_tpu.ops.tensor import CellEvaluator

        par = self.parameters
        ns = self.navier_stokes
        sub = par.concentration_subdivisions
        q_ls = iterated_gauss_quadrature(sub, 2)
        if self.is_extruded:
            from adaflo_tpu.ops.mapped import Extruded3DEvaluator

            ev_c = Extruded3DEvaluator(self.ls_space, q_ls)
            ev_u = Extruded3DEvaluator(ns.u_space, q_ls)
            jxw = np.asarray(ev_c.jxw_cells)  # (E, n_q): per-cell geometry
        else:
            ev_c = CellEvaluator(3, self.ls_space.basis, q_ls, self.mesh.h)
            ev_u = CellEvaluator(3, ns.u_space.basis, q_ls, self.mesh.h)
            jxw = np.broadcast_to(
                np.asarray(ev_c.jxw)[None, :],
                (self.ls_space.cell_dofs.shape[0], ev_c.n_q),
            )
        cd = self.ls_space.cell_dofs
        hv = jnp.asarray(np.asarray(self.heaviside)[cd])
        H = np.asarray(ev_c.values(hv))
        # delta = grad H at the quadrature points (the reference's
        # evaluate_heaviside_function fills cell_delta_val with the heaviside
        # gradient, two_phase_base.cc:1016-1023)
        delta = np.moveaxis(np.asarray(ev_c.gradients(hv)), 1, 0)  # (3, E, n_q)
        u = np.asarray(ns.solution[0])
        uc = jnp.asarray(np.transpose(u[:, ns.u_space.cell_dofs], (1, 0, 2)))
        uv = np.asarray(ev_u.values(uc))  # (E, 3, n_q)
        qp = ev_c.quad_coords(self.mesh)  # (E, n_q, 3)

        volume = float((H * jxw).sum())
        area = float((0.5 * np.sqrt((delta**2).sum(axis=0)) * jxw).sum())
        vel = np.einsum("edq,eq,eq->d", uv, H, jxw)
        com = np.einsum("eqd,eq,eq->d", qp, H, jxw)
        norm_v = float(np.linalg.norm(vel))
        self.set_adaptive_time_step(norm_v / volume)
        pi = np.pi
        sphericity = (
            (pi ** (1.0 / 3.0)) * (6 * volume) ** (2.0 / 3.0) / area
            if area > 0
            else 0.0
        )

        if par.output_verbosity > 0:
            self._p(f"  Volume of the particle: {fmt8(volume)}")
            self._p(f"  Surface area of the particle: {fmt8(area)}")
            vstr = "  ".join(fmt8(vel[d] / volume) for d in range(3))
            self._p(f"  Mean bubble velocity: {vstr}  ")
            cstr = "  ".join(fmt8(com[d] / volume) for d in range(3))
            self._p(f"  Position of the center of mass:  {cstr}  ")
            self._p(f"  Sphericity of the particle: {fmt8(sphericity)}")
            lo, hi = self.get_concentration_range()
            self._p(f"  Range of level set values: {fmt8(lo)} / {fmt8(hi)}")

        data = [self.time_stepping.now(), volume, area]
        data += [vel[d] / volume for d in range(3)]
        data += [com[d] / volume for d in range(3)]
        data.append(sphericity)
        return data

    # -- AMR ------------------------------------------------------------
    def mark_cells_for_refinement(self):
        """Base criterion (two_phase_base.cc:325-390): per-cell L2 norm of
        1 - c^2 against 0.3/0.1 x h^dim-of-last-cell thresholds, at most
        every fifth step; boundary cells never refine. Returns int8 flags
        (+1 refine / -1 coarsen) or None."""
        par = self.parameters
        if par.adaptive_refinements == 0 or self.time_stepping.step_no() % 5 != 0:
            return None
        from adaflo_tpu.ops.forest_ops import evaluator_for

        sp = self.ls_space
        ev = evaluator_for(sp, sp.degree + 1)
        c = np.asarray(self.hanging_constraints_ls.distribute_values(self.solution[0]))
        vals = np.asarray(ev.values(jnp.asarray(c)[sp.cell_dofs]))
        err2 = (((1.0 - vals**2) ** 2) * np.asarray(ev.jxw_cells)).sum(axis=1)
        err = np.sqrt(err2)
        h_last = float(np.linalg.norm(sp.h_cells[-1]))
        h_to_3 = h_last**2 * (h_last if self.mesh.dim == 3 else 1.0)
        levels = sp.levels
        upper = par.adaptive_refinements + self.refine_lower_level_limit
        flags = np.zeros(len(levels), dtype=np.int8)
        flags[(levels < upper) & (err > 0.3 * h_to_3)] = 1
        flags[(levels > self.refine_lower_level_limit) & (err < 0.1 * h_to_3)] = -1
        # do not refine boundary cells
        flags[(flags == 1) & self._boundary_cell_mask()] = 0
        if not flags.any():
            return None
        return flags

    def _boundary_cell_mask(self) -> np.ndarray:
        """Cells with at least one face on the domain boundary."""
        forest = self.mesh
        E = forest.n_cells
        mask = np.zeros(E, dtype=bool)
        for i in range(E):
            for axis in range(forest.dim):
                for side in (0, 1):
                    nbr, _ = forest.face_neighbors(i, axis, side)
                    if len(nbr) == 0:
                        mask[i] = True
                        break
                if mask[i]:
                    break
        return mask

    def refine_grid(self) -> None:
        """Adapt the forest by the marking criterion, transferring the NS
        vectors (via NavierStokes.adapt_mesh) and the concentration/curvature
        vectors by nodal interpolation, then rebuild the level-set
        discretization (two_phase_base.cc:394-437)."""
        if not self.is_forest:
            return
        flags = self.mark_cells_for_refinement()
        if flags is None:
            return
        from adaflo_tpu.fe.forest_transfer import ForestFunction

        snap = ForestFunction(self.ls_space)
        dist = self.hanging_constraints_ls.distribute_values
        old_fields = np.stack(
            [
                np.asarray(dist(v))[: self.ls_space.n_dofs]
                for v in (
                    self.solution[0],
                    self.solution[1],
                    self.solution_old[0],
                    self.solution_old[1],
                )
            ]
        )
        if not self.navier_stokes.adapt_mesh(flags):
            return
        self._setup_ls_discretization()
        new_vals = snap.evaluate(old_fields, self.ls_space.node_coords)
        n = self.ls_space.n_dofs
        pads = self.ls_space.n_dofs_padded
        def vec(row):
            v = jnp.zeros(pads).at[:n].set(jnp.asarray(row))
            return self.hanging_constraints_ls.distribute_values(v)

        self.solution[0] = vec(new_vals[0])
        self.solution[1] = vec(new_vals[1])
        self.solution_old[0] = vec(new_vals[2])
        self.solution_old[1] = vec(new_vals[3])
        self.last_refine_step = self.time_stepping.step_no()

    def output_solution(self, filename: str, n_subdivisions: int = 0) -> None:
        """Joint vtu output: velocity, pressure, concentration and the
        curvature-like field (two_phase_base.cc:550-592)."""
        par = self.parameters
        if not filename or not par.print_solution_fields:
            return
        if not self.time_stepping.at_tick(par.output_frequency):
            return
        from adaflo_tpu.utils.output import TimeSeriesWriter

        if not hasattr(self, "_writer"):
            self._writer = TimeSeriesWriter(filename)
        ns = self.navier_stokes
        fields = {
            "velocity": (ns.u_space, np.asarray(ns.solution[0]), self.mesh.dim),
            "pressure": (ns.p_space, np.asarray(ns.solution[1]), 1),
            "concentration": (self.ls_space, np.asarray(self.solution[0]), 1),
            self.curvature_name: (self.ls_space, np.asarray(self.solution[1]), 1),
        }
        if hasattr(self, "heaviside"):
            fields["heaviside"] = (self.ls_space, np.asarray(self.heaviside), 1)
        n_sub = n_subdivisions or min(
            par.velocity_degree, par.concentration_subdivisions
        )
        self._writer.write(self.mesh, fields, self.time_stepping.now(), n_sub)


def ev_values(ev: CellEvaluator, u: np.ndarray, space, mask):
    cells = np.transpose(u[:, space.cell_dofs[mask]], (1, 0, 2))
    return ev.values(jnp.asarray(cells))


def _patch_area_perimeter(c0, c1, c2, c3, p0, p1, p2, p3):
    """Vectorized port of the reference's per-patch interface logic
    (two_phase_base.cc:735-845): corners ordered (x0y0, x1y0, x0y1, x1y1);
    returns (area fraction in the positive phase, interface length)."""
    n = len(c0)
    local_area = np.ones(n)
    per = np.zeros(n)

    def crossing(a, b):
        has = a * b <= 0
        r = np.where(has, a / np.where(has, a - b, 1.0), -1.0)
        return r

    rx0 = crossing(c0, c1)
    rx1 = crossing(c2, c3)
    ry0 = crossing(c0, c2)
    ry1 = crossing(c1, c3)
    pos_x0 = p0 + (p1 - p0) * rx0[:, None]
    pos_x1 = p2 + (p3 - p2) * rx1[:, None]
    pos_y0 = p0 + (p2 - p0) * ry0[:, None]
    pos_y1 = p1 + (p3 - p1) * ry1[:, None]

    def seg(a, b):
        return np.linalg.norm(a - b, axis=1)

    m = (rx0 > 0) & (ry0 > 0)
    my_area = 0.5 * rx0 * ry0
    local_area -= np.where(m, np.where(c0 < 0, my_area, 1 - my_area), 0.0)
    per += np.where(m, seg(pos_x0, pos_y0), 0.0)

    m = (rx0 > 0) & (ry1 > 0)
    my_area = 0.5 * (1 - rx0) * ry1
    local_area -= np.where(m, np.where(c1 < 0, my_area, 1 - my_area), 0.0)
    per += np.where(m, seg(pos_x0, pos_y1), 0.0)

    m = (rx0 > 0) & (rx1 > 0) & (ry0 < 0) & (ry1 < 0)
    my_area = 0.5 * (rx0 + rx1)
    local_area -= np.where(m, np.where(c0 < 0, my_area, 1 - my_area), 0.0)
    per += np.where(m, seg(pos_x0, pos_x1), 0.0)

    m = (rx1 > 0) & (ry0 > 0)
    my_area = 0.5 * rx1 * (1 - ry0)
    local_area -= np.where(m, np.where(c2 < 0, my_area, 1 - my_area), 0.0)
    per += np.where(m, seg(pos_x1, pos_y0), 0.0)

    m = (rx1 > 0) & (ry1 > 0)
    my_area = 0.5 * (1 - rx1) * (1 - ry1)
    local_area -= np.where(m, np.where(c3 < 0, my_area, 1 - my_area), 0.0)
    per += np.where(m, seg(pos_x1, pos_y1), 0.0)

    m = (ry0 > 0) & (ry1 > 0) & (rx0 < 0) & (rx1 < 0)
    my_area = 0.5 * (ry0 + ry1)
    local_area -= np.where(m, np.where(c0 < 0, my_area, 1 - my_area), 0.0)
    per += np.where(m, seg(pos_y0, pos_y1), 0.0)

    none = (rx0 <= 0) & (rx1 <= 0) & (ry0 <= 0) & (ry1 <= 0) & (c0 <= 0)
    local_area = np.where(none, 0.0, local_area)
    return local_area, per


def fmt8(x: float) -> str:
    """C++ ostream precision(8) general format."""
    s = f"{x:.8g}"
    if "e" in s:
        mant, ex = s.split("e")
        return f"{mant}e{int(ex):+03d}"
    return s
