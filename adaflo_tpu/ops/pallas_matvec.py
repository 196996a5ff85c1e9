"""Fused Pallas TPU kernel for the coupled Navier-Stokes mat-vec.

The hot operator of the framework (the reference's local_operation,
navier_stokes_matrix.cc:601-916) as ONE layout-conscious kernel: cells ride
the 128-wide lane axis, and the cell-local work per apply is

    r   = A_evg @ x        (324 x 89) @ (89 x B)    u values+gradients (MXU)
    n_c = convective Newton rows from (r, S)        (81, B) rows     (VPU)
    out = M89 @ x + A_ic @ n                        (89 x 89) + (89 x 81)

where M89 folds EVERY term that is linear in x with constant coefficients
(BDF mass + damping, viscous stress, grad-div, pressure gradient and
divergence rows) into one per-step 89x89 matrix combined at trace time from
four constant matrices — so the MXU never re-derives the bilinear forms,
and S = the frozen linearization's q-point fields (u* values + gradients,
(324, E)), computed ONCE per Newton step (the reference stores the same
`linearized_velocities` per q point, navier_stokes_matrix.h:264-283) and
streamed instead of re-evaluated per apply.

Round-2 layout upgrade: inputs/outputs live in (rows, cells) layout
produced directly by LatticeOps.gather_t / consumed by scatter_add_t —
the old (E, 89) materialize-then-transpose passes (~1.1 ms of the round-1
2.66 ms apply) are gone.

Scope: Q2/Q1 3D coupled Newton vmult with constant rho/mu/damping on the
uniform-lattice path — the benchmark configuration and the dominant kernel
of large 3D runs. The einsum path remains the reference implementation and
handles every other configuration.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tensor_nd(mats):
    """Tensor-product matrix of per-axis 1D matrices (z..x order, x
    fastest)."""
    out = mats[0]
    for m in mats[1:]:
        out = np.einsum("ai,bj->abij", out, m).reshape(
            out.shape[0] * m.shape[0], out.shape[1] * m.shape[1]
        )
    return out


class MatvecTables(NamedTuple):
    # Shapes quoted for the 3D Q2/Q1 flagship set (n_cols = 3*27+8 = 89);
    # the builder is dim- and degree-generic (2D Q2/Q1: n_cols = 22,
    # 3D Q3/Q2: n_cols = 219).
    A_evg: np.ndarray  # (12G, 89) values+physical gradients of u (p cols 0)
    M_mass: np.ndarray  # (89, 89) sum_c V^T W V
    M_visc: np.ndarray  # (89, 89) symmetric-gradient stress
    M_gd: np.ndarray  # (89, 89) grad-div
    M_pdiv: np.ndarray  # (89, 89) -grad p test + (-div u) pressure row
    A_ic: np.ndarray  # (89, 3G) convective integration (V^T W per comp)
    n_u_loc: int
    n_p_loc: int
    n_q: int
    # q-point row groups are padded from n_q to this stride so every in-kernel
    # row slice starts on a multiple of the f32 sublane tile (8) — unaligned
    # 27-row slices cost a Mosaic relayout per slice, which dominated the
    # unpadded kernel
    g: int
    dim: int


def build_tables(ev_u, ev_p, dtype=np.float64) -> MatvecTables:
    """Constant matrices from the (uniform-geometry) evaluators of the NS
    operator. Dim- and degree-generic: Qk velocity / Q(k-1) pressure with
    (k+1)-point Gauss per axis."""
    Vu = np.asarray(ev_u.V, np.float64)
    Du = np.asarray(ev_u.D, np.float64)
    Vp = np.asarray(ev_p.V, np.float64)
    inv_h = np.asarray(ev_u.h, np.float64) ** -1
    jxw = np.asarray(ev_u.jxw, np.float64)
    dim = len(inv_h)

    Vq = _tensor_nd([Vu] * dim)
    # G[a] = physical derivative along axis a (a = 0 is x, matching the
    # evaluator's gradient component order)
    G = [
        _tensor_nd([Du if dim - 1 - ax == a else Vu for ax in range(dim)])
        * inv_h[a]
        for a in range(dim)
    ]
    Vpq = _tensor_nd([Vp] * dim)

    n_u = Vq.shape[1]
    n_p = Vpq.shape[1]
    n_q = Vq.shape[0]
    n_cols = dim * n_u + n_p
    W = np.diag(jxw)
    g = -(-n_q // 8) * 8  # aligned group stride (32 for n_q=27)
    parts = dim + 1  # values + dim derivatives per component

    # evaluation: rows [per c: values, d/dx, d/dy(, d/dz)] at stride g
    A_evg = np.zeros((dim * parts * g, n_cols))
    for c in range(dim):
        r0 = c * parts * g
        c0 = c * n_u
        A_evg[r0 : r0 + n_q, c0 : c0 + n_u] = Vq
        for d in range(dim):
            A_evg[r0 + (1 + d) * g : r0 + (1 + d) * g + n_q, c0 : c0 + n_u] = G[d]

    # constant linear-term matrices (combined per step with the traced
    # scalars rho_w / mu*tau1 / tau_grad_div — see combine_linear)
    M_mass = np.zeros((n_cols, n_cols))
    M_visc = np.zeros((n_cols, n_cols))
    M_gd = np.zeros((n_cols, n_cols))
    M_pdiv = np.zeros((n_cols, n_cols))
    VtWV = Vq.T @ W @ Vq
    GtWG = [[G[a].T @ W @ G[b] for b in range(dim)] for a in range(dim)]
    sum_GtWG = GtWG[0][0]
    for a in range(1, dim):
        sum_GtWG = sum_GtWG + GtWG[a][a]
    for c in range(dim):
        c0 = c * n_u
        M_mass[c0 : c0 + n_u, c0 : c0 + n_u] = VtWV
        for e in range(dim):
            e0 = e * n_u
            # viscous: out_c = sum_d G_d^T W (G_d u_c + G_c u_d)
            blk = GtWG[e][c]
            if c == e:
                blk = blk + sum_GtWG
            M_visc[c0 : c0 + n_u, e0 : e0 + n_u] = blk
            # grad-div: out_c = G_c^T W sum_e G_e u_e
            M_gd[c0 : c0 + n_u, e0 : e0 + n_u] = GtWG[c][e]  # G_c^T W G_e
            # divergence row: out_p = -Vp^T W sum_e G_e u_e
        M_pdiv[dim * n_u :, c0 : c0 + n_u] = -Vpq.T @ W @ G[c]
        # pressure gradient: out_c = -G_c^T W Vp p
        M_pdiv[c0 : c0 + n_u, dim * n_u :] = -G[c].T @ W @ Vpq

    # convective integration: out_c = V^T W n_c (n rows at stride g)
    A_ic = np.zeros((n_cols, dim * g))
    for c in range(dim):
        A_ic[c * n_u : (c + 1) * n_u, c * g : c * g + n_q] = Vq.T @ W

    return MatvecTables(
        A_evg.astype(dtype),
        M_mass.astype(dtype),
        M_visc.astype(dtype),
        M_gd.astype(dtype),
        M_pdiv.astype(dtype),
        A_ic.astype(dtype),
        n_u,
        n_p,
        n_q,
        g,
        dim,
    )


def combine_linear(tables: MatvecTables, scalars, dtype):
    """Per-step traced combination of the linear-term matrices.

    scalars = (rho_w, tau1_rho, beta, mut, tgd) with rho_w carrying
    rho*weight - damping (folded by the callers), mut = tau1*mu."""
    rho_w, tau1_rho, beta, mut, tgd = (jnp.asarray(s, dtype) for s in scalars)
    M89 = (
        rho_w * jnp.asarray(tables.M_mass, dtype)
        + mut * jnp.asarray(tables.M_visc, dtype)
        + tgd * jnp.asarray(tables.M_gd, dtype)
        + jnp.asarray(tables.M_pdiv, dtype)
    )
    A_ics = tau1_rho * jnp.asarray(tables.A_ic, dtype)
    return M89, A_ics, beta


def build_tables_ig(tables: MatvecTables, ev_u, dtype=np.float64):
    """Symmetric-stress integration matrix for the VARIABLE-coefficient
    kernel: out_c = sum_d G_d^T W st_(cd) with st the 6 (3 in 2D) upper
    symmetric stress row groups ordered (0,0),(0,1),(0,2),(1,1),(1,2),(2,2)
    at stride g. The reference streams per-q-point rho/mu/damping through
    the same hot kernel (navier_stokes_matrix.cc:740-890); this matrix is
    the constant integration factor of the mu-dependent stress."""
    Vu = np.asarray(ev_u.V, np.float64)
    Du = np.asarray(ev_u.D, np.float64)
    inv_h = np.asarray(ev_u.h, np.float64) ** -1
    jxw = np.asarray(ev_u.jxw, np.float64)
    dim = len(inv_h)
    G = [
        _tensor_nd([Du if dim - 1 - ax == a else Vu for ax in range(dim)])
        * inv_h[a]
        for a in range(dim)
    ]
    W = np.diag(jxw)
    n_u = tables.n_u_loc
    n_q = tables.n_q
    g = tables.g
    n_cols = dim * n_u + tables.n_p_loc
    pairs = [(a, b) for a in range(dim) for b in range(a, dim)]
    A_ig = np.zeros((n_cols, len(pairs) * g))
    for k, (a, b) in enumerate(pairs):
        # st_(ab) contributes to out_a via G_b^T W and (a != b) to out_b
        # via G_a^T W
        A_ig[a * n_u : (a + 1) * n_u, k * g : k * g + n_q] += G[b].T @ W
        if a != b:
            A_ig[b * n_u : (b + 1) * n_u, k * g : k * g + n_q] += G[a].T @ W
    return A_ig.astype(dtype)


def qcoeff_t(coeffs, n_q: int, g: int | None = None, dtype=jnp.bfloat16):
    """(3g, E) per-q-point coefficient stream for the variable-coefficient
    kernel: rows [rho (g) | mu (g) | damping (g)], each zero-padded from
    n_q to the aligned stride g. Missing coefficients stream as zeros and
    are substituted by the scalar parameters in-kernel (rho/mu) or dropped
    (damping). bf16: the coefficients multiply the (already bf16-streamed)
    frozen-linearization accuracy class."""
    if g is None:
        g = -(-n_q // 8) * 8
    parts = []
    for field in (coeffs.rho, coeffs.mu, coeffs.damping):
        if field is None:
            parts.append(None)
            continue
        parts.append(jnp.pad(field, ((0, 0), (0, g - n_q))).T)
    E = next(p.shape[1] for p in parts if p is not None)
    out = jnp.concatenate(
        [
            (p if p is not None else jnp.zeros((g, E)))
            for p in parts
        ],
        axis=0,
    )
    return out.astype(dtype)


def qfields_t(lin, g: int | None = None) -> jnp.ndarray:
    """(12g, E) frozen-linearization stream in kernel row order
    [per c: values, d/dx, d/dy, d/dz], each group zero-padded from n_q to
    the aligned stride g: a pure relayout of the Linearized val/grad fields
    already computed at Newton-step freeze time.

    In f32 deployment the stream is stored bf16: it is the dominant HBM
    traffic of the apply (12g of 13g+2*89 rows) and only perturbs the frozen
    Jacobian coefficients (consistently across Krylov iterations), not the
    solution — the kernel upconverts after load."""
    n_q = lin.val.shape[-1]
    dim = lin.val.shape[1]
    if g is None:
        g = -(-n_q // 8) * 8
    pad = ((0, 0), (0, g - n_q))
    parts = []
    for c in range(dim):
        parts.append(jnp.pad(lin.val[:, c, :], pad).T)
        for d in range(dim):
            parts.append(jnp.pad(lin.grad[:, c, d, :], pad).T)
    out = jnp.concatenate(parts, axis=0)
    if out.dtype == jnp.float32 and os.environ.get("ADAFLO_PALLAS_S_F32") != "1":
        out = out.astype(jnp.bfloat16)
    return out


def qdofs_t(lin, dtype=None) -> jnp.ndarray:
    """(3 n_u, E) frozen-linearization *dof* stream: the cell-local dofs of
    u* in kernel column order [c0 | c1 | c2]. The ADAFLO_PALLAS_STREAM=dofs
    alternative to qfields_t: stream 81 rows/cell instead of 12g=384 and
    re-evaluate the q-point fields on the MXU inside the kernel (one extra
    (12g, 3 n_u) matmul against A_evg's velocity columns). Cuts the dominant
    HBM traffic of the apply ~4.7x at the cost of MXU work that overlaps the
    streaming. bf16 on the f32 path (same frozen-Jacobian argument as
    qfields_t)."""
    E, dim, n_u = lin.dofs.shape
    out = jnp.transpose(lin.dofs, (1, 2, 0)).reshape(dim * n_u, E)
    if dtype is not None:
        out = out.astype(dtype)
    elif out.dtype == jnp.float32 and os.environ.get("ADAFLO_PALLAS_S_F32") != "1":
        out = out.astype(jnp.bfloat16)
    return out


def stream_t(lin) -> jnp.ndarray:
    """The per-Newton-step kernel stream, by ADAFLO_PALLAS_STREAM:
    'dofs' (default) = qdofs_t, 'qfields' = qfields_t."""
    if os.environ.get("ADAFLO_PALLAS_STREAM", "dofs") == "dofs" and (
        lin.dofs is not None
    ):
        return qdofs_t(lin)
    return qfields_t(lin)


def _block_core(g, dim, natural, beta, x, r, s, M_ref, Ai_ref, n_ref, out_ref):
    """Shared per-block math: convective Newton rows from (r, s) into n_ref,
    final out = M x + A_ic n. r/s: (dim(dim+1)g, B) u/u* values+gradients.

    ADAFLO_PALLAS_PR_BF16 selects the convective-path precision:
    'conv' integrates the convective rows in pure bf16 (the rows already
    carry bf16 accuracy — one factor of every product is the bf16-streamed
    frozen linearization — so a bf16 A_ic pass changes nothing of their
    accuracy class while running the MXU at full bf16 rate); 'all'
    additionally drops the stiff linear terms M89 to bf16 (probe only —
    NOT production precision)."""
    pt = dict(preferred_element_type=jnp.float32 if x.dtype != jnp.float64
              else x.dtype)
    # pin DEFAULT (bf16-pass) precision explicitly: the package sets the
    # GLOBAL matmul precision to `highest` for the einsum path's Newton
    # accuracy (beltrami_3d f32 stalled at the bf16 residual floor), but
    # the resident kernel's accuracy class is bf16 by design (streamed
    # linearization) and tripling its MXU passes would cost the headline
    pt["precision"] = jax.lax.Precision.DEFAULT
    prec = os.environ.get("ADAFLO_PALLAS_PR_PREC")
    if prec:
        pt["precision"] = getattr(jax.lax.Precision, prec.upper())
    bf_mode = os.environ.get("ADAFLO_PALLAS_PR_BF16", "")
    bf16_ok = x.dtype == jnp.float32 and bf_mode in ("conv", "all")
    parts = dim + 1

    def rows(block, part, c):
        i0 = (c * parts + part) * g
        return block[i0 : i0 + g]

    val_u = [rows(r, 0, c) for c in range(dim)]
    g_u = [[rows(r, 1 + d, c) for d in range(dim)] for c in range(dim)]
    val_s = [rows(s, 0, c) for c in range(dim)]
    g_s = [[rows(s, 1 + d, c) for d in range(dim)] for c in range(dim)]

    div = g_u[0][0]
    div_s = g_s[0][0]
    for a in range(1, dim):
        div = div + g_u[a][a]
        div_s = div_s + g_s[a][a]

    for c in range(dim):
        # Newton convective linearization (nsm.cc:802-826); the mass /
        # stress / pressure / divergence terms all live in M_ref
        res = beta * (div * val_s[c] + div_s * val_u[c])
        for e in range(dim):
            # u*_e d_e du_c + du_e d_e u*_c (g[c][d] = d-th deriv of comp c)
            res = res + val_s[e] * g_u[c][e] + val_u[e] * g_s[c][e]
        n_ref[c * g : (c + 1) * g] = res
    if natural:
        # out^T = x @ M^T + n^T @ A_ic^T, both directly in (B, 89)
        out_ref[:] = jax.lax.dot_general(
            x, M_ref[:], dimension_numbers=(((1,), (1,)), ((), ())), **pt
        ) + jax.lax.dot_general(
            n_ref[:],
            Ai_ref[:],
            dimension_numbers=(((0,), (1,)), ((), ())),
            **pt,
        )
    else:
        Mx, nn = M_ref[:], n_ref[:]
        Ai = Ai_ref[:]
        if bf16_ok:
            Ai = Ai.astype(jnp.bfloat16)
            nn = nn.astype(jnp.bfloat16)
            if bf_mode == "all":
                Mx = Mx.astype(jnp.bfloat16)
                x = x.astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(Mx, x, **pt) + jnp.dot(Ai, nn, **pt)


def _kernel_su(
    g,
    dim,
    natural,
    beta_ref,
    Ae_ref,
    Aev_ref,
    M_ref,
    Ai_ref,
    x_ref,
    su_ref,
    out_ref,
    n_ref,
):
    """Dof-stream variant of _kernel: su_ref (dim n_u, B) holds the frozen
    linearization dofs; the q-point fields are re-evaluated in-register via
    Aev_ref (dim(dim+1)g, dim n_u) — same row layout as the streamed s of
    _kernel.

    natural=True selects the (B, n_cols) cell-major x/out layout: the HBM
    tiles are then contiguous (no XLA transpose passes around the kernel)
    and the MXU absorbs the layout difference through dot_general dimension
    numbers — the VPU work stays in the q-rows-on-sublanes orientation
    either way."""
    beta = beta_ref[0]
    x = x_ref[:]
    pt = dict(preferred_element_type=x.dtype,
              precision=jax.lax.Precision.DEFAULT)
    # r = A_evg @ x^T when natural (contract x's dof axis 1), else A_evg @ x
    cdim = ((1,), (1,)) if natural else ((1,), (0,))
    r = jax.lax.dot_general(
        Ae_ref[:], x, dimension_numbers=(cdim, ((), ())), **pt
    )  # (dim(dim+1)g, B)
    s = jnp.dot(Aev_ref[:], su_ref[:], **pt)
    _block_core(g, dim, natural, beta, x, r, s, M_ref, Ai_ref, n_ref, out_ref)


def _kernel_pi(
    g,
    dim,
    rows_table,
    win,
    block,
    beta_ref,
    Ae_ref,
    Aev_ref,
    M_ref,
    Ai_ref,
    subs_ref,
    su_ref,
    out_ref,
    win_ref,
    x_ref,
    n_ref,
    sem,
):
    """Parity in-kernel-gather variant: subs_ref (R, L) holds the parity
    sub-lattices in HBM; each grid step DMAs one (R, win) slab into VMEM
    and assembles the (n_cols, B) cell block by static shifted slices —
    the gather never materializes in HBM (the XLA-side 'pe' layout writes
    and re-reads the (89, EA) block; this variant streams ~n_dofs instead).
    rows_table: static (sub-lattice row, anchor offset) per x row.

    Two-slot double buffering: block i+1's slab copy is started before
    block i's compute, so the HBM latency hides behind the MXU/VPU work
    (TPU grids run sequentially, making the slot reuse race-free)."""
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

    def copy_in(blk, s):
        return pltpu.make_async_copy(
            subs_ref.at[:, pl.ds(blk * block, win)],
            win_ref.at[s],
            sem.at[s],
        )

    @pl.when(i == 0)
    def _first():
        copy_in(i, slot).start()

    @pl.when(i + 1 < nblk)
    def _prefetch():
        copy_in(i + 1, 1 - slot).start()

    copy_in(i, slot).wait()
    for k, (srow, off) in enumerate(rows_table):
        x_ref[k, :] = win_ref[slot, srow, off : off + block]
    beta = beta_ref[0]
    x = x_ref[:]
    pt = dict(preferred_element_type=x.dtype,
              precision=jax.lax.Precision.DEFAULT)
    r = jnp.dot(Ae_ref[:], x, **pt)
    s = jnp.dot(Aev_ref[:], su_ref[:], **pt)
    _block_core(g, dim, False, beta, x, r, s, M_ref, Ai_ref, n_ref, out_ref)


def _kernel(
    g,
    dim,
    natural,
    beta_ref,
    Ae_ref,
    M_ref,
    Ai_ref,
    x_ref,
    s_ref,
    out_ref,
    n_ref,
):
    """One block of cells. x_ref (n_cols, B) — or (B, n_cols) when natural,
    see _kernel_su; s_ref (dim(dim+1)g, B) linearization q-fields; out_ref
    like x_ref; n_ref (dim g, B) VMEM scratch for the convective rows. All
    row groups sit at the aligned stride g, so every slice below is
    sublane-aligned (no relayouts)."""
    beta = beta_ref[0]
    x = x_ref[:]
    pt = dict(preferred_element_type=x.dtype)
    cdim = ((1,), (1,)) if natural else ((1,), (0,))
    r = jax.lax.dot_general(
        Ae_ref[:], x, dimension_numbers=(cdim, ((), ())), **pt
    )  # (dim(dim+1)g, B)
    # the frozen-linearization stream may ride HBM in bf16 (halves the
    # dominant traffic; the Newton matrix is consistent either way since S
    # is fixed per Newton step) — upconvert on the VPU after load
    s = s_ref[:].astype(x.dtype)
    _block_core(g, dim, natural, beta, x, r, s, M_ref, Ai_ref, n_ref, out_ref)


def coupled_vmult_cells(
    x_t,
    s_t,
    tables: MatvecTables,
    scalars,
    block: int | None = None,
    interpret: bool = False,
    layout: str = "t",
):
    """Fused coupled cell apply.

    layout="t" (transposed): x_t (89, E) = [u0 u1 u2 (27 each), p (8)] rows
    per cell from LatticeOps.gather_t, returns (89, E). layout="n"
    (natural): x_t (E, 89) cell-major from LatticeOps.gather — the HBM
    tiles are contiguous and the in-kernel dots contract on the dof axis
    instead, returns (E, 89). s_t: (12g, E) from qfields_t (per-Newton-step
    constant) — or (3 n_u, E) from qdofs_t, selecting the dof-stream kernel
    that re-evaluates the q-fields in-register (the mode is inferred from
    the row count); the stream is transposed-layout in both modes.
    scalars: (rho_w, tau1_rho, beta, mut, tgd) — exactly 5; damping is
    folded into rho_w by the callers."""
    natural = layout == "n"
    if natural:
        E, n_cols = x_t.shape
    else:
        n_cols, E = x_t.shape
    dtype = x_t.dtype
    if block is None:
        block = int(os.environ.get("ADAFLO_PALLAS_BLOCK", "1024"))
    block = min(block, max(128, -(-E // 128) * 128))
    E_pad = -(-E // block) * block
    if E_pad != E:
        xpad = ((0, E_pad - E), (0, 0)) if natural else ((0, 0), (0, E_pad - E))
        x_t = jnp.pad(x_t, xpad)
        s_t = jnp.pad(s_t, ((0, 0), (0, E_pad - E)))
    g = tables.g
    Ae = jnp.asarray(tables.A_evg, dtype)
    n_rows = Ae.shape[0]
    dim = tables.dim
    n_su = dim * tables.n_u_loc
    dof_stream = s_t.shape[0] == n_su
    M89, A_ics, beta = combine_linear(tables, scalars, dtype)
    rep2 = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        rep2((n_rows, n_cols)),
    ]
    consts = [beta[None], Ae]
    if dof_stream:
        # evaluation matrix for the streamed dofs, in the stream's dtype so
        # the MXU runs the re-evaluation at bf16 rate on the f32 path
        consts.append(jnp.asarray(tables.A_evg[:, :n_su], s_t.dtype))
        in_specs.append(rep2((n_rows, n_su)))
        kernel = functools.partial(_kernel_su, g, dim, natural)
    else:
        kernel = functools.partial(_kernel, g, dim, natural)
    xspec = (
        pl.BlockSpec((block, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
        if natural
        else pl.BlockSpec(
            (n_cols, block), lambda i: (0, i), memory_space=pltpu.VMEM
        )
    )
    in_specs += [
        rep2((n_cols, n_cols)),
        rep2((n_cols, dim * g)),
        xspec,
        pl.BlockSpec(
            (s_t.shape[0], block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    ]
    out_shape = (E_pad, n_cols) if natural else (n_cols, E_pad)
    out = pl.pallas_call(
        kernel,
        grid=(E_pad // block,),
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
        scratch_shapes=[pltpu.VMEM((dim * g, block), dtype)],
        interpret=interpret,
    )(*consts, M89, A_ics, x_t, s_t)
    return out[:E] if natural else out[:, :E]


def pr_params(rows_table, n_anchors: int, block: int | None = None):
    """Static geometry of the parity-resident apply: (block, EA_pad, win,
    L_need). win covers the largest scatter/gather offset beyond the block;
    L_need is the minimum input column count so the last block's DMA window
    never runs off the end."""
    if block is None:
        block = int(# 3584 (not 4096): the r4 block sweep was flat 3584-4096,
            # and the VARIABLE-coefficient + ids configuration of the
            # round-5 kernel misses the 16 MB Mosaic VMEM budget by
            # 100 KB at 4096
            os.environ.get("ADAFLO_PALLAS_PR_BLOCK", "3584"))
    block = min(block, max(128, -(-n_anchors // 128) * 128))
    EA_pad = -(-n_anchors // block) * block
    max_off = max(off for _, off in rows_table)
    win = block + -(-max_off // 128) * 128
    L_need = EA_pad - block + win
    return block, EA_pad, win, L_need


def _kernel_pr(
    g,
    dim,
    rows_table,
    win,
    block,
    beta_ref,
    Ae_ref,
    Aev_ref,
    M_ref,
    Ai_ref,
    mask_ref,
    subs_hbm,
    su_ref,
    out_ref,
    slab,
    x_ref,
    n_ref,
    acc_ref,
    sem,
):
    """Parity-RESIDENT fused apply: gather, compute AND scatter all live in
    the kernel — the only HBM traffic is the packed parity vector in, the
    bf16 linearization stream, and the packed parity result out (~min data
    motion; the expanded (n_cols, E) block never rides HBM in either
    direction).

    Gather: per grid step one (R, win) slab DMA (double-buffered as in
    _kernel_pi) + static shifted row slices into x_ref. Scatter: the
    transpose — each result row overlap-adds into a ring accumulator at its
    static (sub-row, anchor-offset); contributions of anchor a only ever
    target columns >= a, so after block i the accumulator's first `block`
    columns are complete: emit them, shift the ring left, continue. Phantom
    anchors (cell coordinate == nc on any axis) are masked out of y before
    accumulation, which keeps the parity-space zero-phantom invariant."""
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

    def copy_in(blk, s):
        return pltpu.make_async_copy(
            subs_hbm.at[:, pl.ds(blk * block, win)], slab.at[s], sem.at[s]
        )

    @pl.when(i == 0)
    def _first():
        copy_in(i, slot).start()
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i + 1 < nblk)
    def _prefetch():
        copy_in(i + 1, 1 - slot).start()

    copy_in(i, slot).wait()
    for k, (srow, off) in enumerate(rows_table):
        x_ref[k, :] = slab[slot, srow, off : off + block]
    beta = beta_ref[0]
    x = x_ref[:]
    prec = os.environ.get("ADAFLO_PALLAS_PR_PREC")
    pt = dict(preferred_element_type=jnp.float32 if x.dtype != jnp.float64
              else x.dtype)
    pt["precision"] = jax.lax.Precision.DEFAULT  # see _block_core
    if prec:
        pt["precision"] = getattr(jax.lax.Precision, prec.upper())
    Ae = Ae_ref[:]
    xe = x
    if x.dtype == jnp.float32 and os.environ.get(
        "ADAFLO_PALLAS_PR_BF16", ""
    ) in ("conv", "all"):
        # r only feeds the convective rows, whose other factor (the frozen
        # linearization stream) is bf16 by design — a pure-bf16 evaluate
        # pass keeps the rows' accuracy class and the MXU at full rate
        Ae = Ae.astype(jnp.bfloat16)
        xe = x.astype(jnp.bfloat16)
    r = jnp.dot(Ae, xe, **pt)
    s = jnp.dot(Aev_ref[:], su_ref[:], **pt)
    # the result block reuses x_ref as scratch (x is fully consumed as a
    # loaded value before the store) — a separate y buffer pushed the
    # kernel's scoped VMEM 448KB past the 16MB limit at block 4096
    _block_core(g, dim, False, beta, x, r, s, M_ref, Ai_ref, n_ref, x_ref)
    x_ref[:] = x_ref[:] * mask_ref[:]
    for k, (srow, off) in enumerate(rows_table):
        acc_ref[srow, off : off + block] += x_ref[k, :]
    out_ref[:] = acc_ref[:, :block]
    carry = acc_ref[:, block:win]
    acc_ref[:, : win - block] = carry
    acc_ref[:, win - block :] = jnp.zeros_like(acc_ref[:, win - block :])


def coupled_vmult_pr(
    subs,
    s_t,
    tables: MatvecTables,
    scalars,
    rows_table,
    n_anchors: int,
    mask,
    block: int | None = None,
    interpret: bool = False,
):
    """Fused coupled apply, parity-resident: packed parity vector in ->
    packed parity vector out (see _kernel_pr).

    subs: (R, L) stacked parity sub-lattices on the anchor raster (R padded
    to a sublane multiple by the caller or here; rows beyond the real subs
    zero). s_t: (dim n_u_loc, EA) dof stream on the anchor raster. mask:
    (EA,) or (1, EA) phantom-anchor mask (1 on real cells). Returns
    (R_pad, EA_pad) — the caller crops or re-pads columns for composition."""
    dtype = subs.dtype
    n_cols = len(rows_table)
    EA = n_anchors
    block, EA_pad, win, L_need = pr_params(rows_table, EA, block)
    R = subs.shape[0]
    R_pad = -(-R // 8) * 8
    if subs.shape[1] < L_need or R_pad != R:
        subs = jnp.pad(
            subs,
            ((0, R_pad - R), (0, max(0, L_need - subs.shape[1]))),
        )
    if s_t.shape[-1] != EA_pad:
        s_t = jnp.pad(s_t, ((0, 0), (0, EA_pad - s_t.shape[-1])))
    mask = jnp.asarray(mask, dtype).reshape(1, -1)
    if mask.shape[-1] != EA_pad:
        mask = jnp.pad(mask, ((0, 0), (0, EA_pad - mask.shape[-1])))

    g = tables.g
    dim = tables.dim
    n_su = dim * tables.n_u_loc
    assert s_t.shape[0] == n_su, "parity-resident kernel requires the dof stream"
    Ae = jnp.asarray(tables.A_evg, dtype)
    n_rows = Ae.shape[0]
    M89, A_ics, beta = combine_linear(tables, scalars, dtype)
    rep2 = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _kernel_pr, g, dim, tuple(rows_table), win, block
    )
    out = pl.pallas_call(
        kernel,
        grid=(EA_pad // block,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            rep2((n_rows, n_cols)),
            rep2((n_rows, n_su)),
            rep2((n_cols, n_cols)),
            rep2((n_cols, dim * g)),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (n_su, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (R_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R_pad, EA_pad), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, R_pad, win), dtype),
            pltpu.VMEM((n_cols, block), dtype),
            pltpu.VMEM((dim * g, block), dtype),
            pltpu.VMEM((R_pad, win), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        beta[None],
        Ae,
        jnp.asarray(tables.A_evg[:, :n_su], s_t.dtype),
        M89,
        A_ics,
        mask,
        subs,
        s_t,
    )
    return out


def pr2_params(rows_table, n_anchors: int, block: int | None = None):
    """Static geometry of the pr2 resident apply: (block, n_extra, nblk, L).

    The resident vector is (R_pad, L) with L = nblk*block; the grid runs
    nblk steps; each step reads its own block plus the next n_extra blocks
    (clamped at the end — the clamped duplicate reads only feed anchors
    that the phantom mask kills). L >= EA + max_off by construction, so
    every real anchor's gather window hits valid (zero-padded) data."""
    if block is None:
        block = int(# 3584 (not 4096): the r4 block sweep was flat 3584-4096,
            # and the VARIABLE-coefficient + ids configuration of the
            # round-5 kernel misses the 16 MB Mosaic VMEM budget by
            # 100 KB at 4096
            os.environ.get("ADAFLO_PALLAS_PR_BLOCK", "3584"))
    block = min(block, max(128, -(-n_anchors // 128) * 128))
    max_off = max(off for _, off in rows_table)
    n_extra = -(-max_off // block)
    nblk = -(-n_anchors // block) + n_extra
    return block, n_extra, nblk, nblk * block


def _kernel_pr2(
    g,
    dim,
    rows_table,
    block,
    n_extra,
    moff_pad,
    ash,
    n_real,
    variable,
    has,
    with_ids,
    want_norm,
    conv_bf16,
    ring,
    *refs,
):
    """Parity-resident coupled apply, v2 (round-5 kernel).

    Differences from _kernel_pr:
    - the packed vector streams with MINIMAL traffic: in ring mode (the
      production default) a (k, R_pad, block) ring of slots is fed by one
      block-sized DMA per grid step — no sliding-window re-read (38 % of
      the input traffic at 48^3, 64 % at 84^3 in the old kernel) and no
      tail copies; each gather row is at most two lane-contiguous pieces
      across two ring slots. In "bs" mode the same two-piece gather reads
      n_extra+1 BlockSpec inputs instead (simpler, but streams the vector
      n_extra+1 times — measured slower; kept for A/B probing);
    - the phantom-anchor mask is computed from lane iotas (no mask stream);
    - constraint-identity rows fold in via an optional signed-ids stream
      (out = r*(1-|ids|) + x*ids with ids = +/-1 on constrained rows,
      replacing two full-vector XLA passes per apply);
    - an optional output scale and a fused ||out||^2 accumulator (SMEM)
      let Krylov chains drop their separate normalize passes;
    - optional per-q-point variable coefficients (rho/mu/damping streamed
      bf16) — the two-phase configuration of the reference's hot kernel
      (navier_stokes_matrix.cc:740-890).
    """
    k_ring = n_extra + 1
    (sc_ref, Ae_ref, Aev_ref, M_ref, Ai_ref) = refs[:5]
    idx = 5
    Aig_ref = None
    if variable:
        Aig_ref = refs[idx]
        idx += 1
    n_vec_ins = 1 if ring else k_ring
    ins = refs[idx : idx + n_vec_ins]
    idx += n_vec_ins
    su_ref = refs[idx]
    idx += 1
    c_ref = None
    if variable:
        c_ref = refs[idx]
        idx += 1
    idss = None
    if with_ids:
        idss = refs[idx : idx + n_vec_ins]
        idx += n_vec_ins
    out_ref = refs[idx]
    idx += 1
    norm_ref = None
    if want_norm:
        norm_ref = refs[idx]
        idx += 1
    x_ref, n_ref = refs[idx], refs[idx + 1]
    idx += 2
    st_ref = None
    if variable:
        st_ref = refs[idx]
        idx += 1
    acc_ref = refs[idx]
    idx += 1
    slab = ids_slab = sem = ids_sem = None
    if ring:
        slab = refs[idx]
        idx += 1
        if with_ids:
            ids_slab = refs[idx]
            idx += 1
        sem = refs[idx]
        idx += 1
        if with_ids:
            ids_sem = refs[idx]
            idx += 1

    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    dtype = x_ref.dtype
    f32 = jnp.float32 if dtype != jnp.float64 else dtype

    if ring:
        # sliding-window DMA: two ping-pong (R_pad, win) windows with
        # win = block + moff_pad. Per step: ONE block-sized DMA refills the
        # NEW part of the next window while a cheap VPU tail copy carries
        # the moff_pad-column overlap — the old kernel's contiguous-window
        # gather (one copy per row) is kept, but nothing is re-read from
        # HBM through the overlap (38 % of the input traffic at 48^3, 64 %
        # at 84^3)
        win = block + moff_pad
        L_total = nblk * block
        s_cur = jax.lax.rem(
            jnp.asarray(i, jnp.int32), jnp.asarray(2, jnp.int32)
        )
        s_nxt = 1 - s_cur

        def dma_warm(hbm, sl, sm):
            return pltpu.make_async_copy(
                hbm.at[:, pl.ds(0, win)], sl.at[0], sm.at[0]
            )

        def dma_step(hbm, sl, sm):
            # new columns of window i+1: absolute [i*block+win, +block),
            # clamped in-bounds (the clamped reads only feed columns past
            # EA, which the phantom mask kills)
            src0 = pl.multiple_of(
                jnp.minimum(
                    jnp.asarray(i, jnp.int32) * block + win,
                    L_total - block,
                ),
                128,
            )
            return pltpu.make_async_copy(
                hbm.at[:, pl.ds(src0, block)],
                sl.at[s_nxt, :, pl.ds(moff_pad, block)],
                sm.at[s_nxt],
            )

        def warm_all():
            d = [dma_warm(ins[0], slab, sem)]
            if with_ids:
                d.append(dma_warm(idss[0], ids_slab, ids_sem))
            return d

        def step_all():
            d = [dma_step(ins[0], slab, sem)]
            if with_ids:
                d.append(dma_step(idss[0], ids_slab, ids_sem))
            return d

        # descriptor of the PREVIOUS step's DMA (same slot/semaphore and
        # byte count: the wait only consumes the semaphore)
        def step_all_prev():
            d = [
                pltpu.make_async_copy(
                    ins[0].at[:, pl.ds(0, block)],
                    slab.at[s_cur, :, pl.ds(moff_pad, block)],
                    sem.at[s_cur],
                )
            ]
            if with_ids:
                d.append(
                    pltpu.make_async_copy(
                        idss[0].at[:, pl.ds(0, block)],
                        ids_slab.at[s_cur, :, pl.ds(moff_pad, block)],
                        ids_sem.at[s_cur],
                    )
                )
            return d

        @pl.when(i == 0)
        def _warm():
            for d in warm_all():
                d.start()

        @pl.when(i == 0)
        def _warm_wait():
            for d in warm_all():
                d.wait()

        @pl.when(i > 0)
        def _step_wait():
            # the DMA started at step i-1 targeted window i (slot s_cur)
            for d in step_all_prev():
                d.wait()

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if want_norm:
            norm_ref[0, 0] = jnp.zeros((), f32)

    # ---- gather: static two-piece row copies from the block inputs.
    # With a constraint stream, the Dirichlet mask folds into the gather
    # (x*(1-|ids|) = the constraint resolve on a hanging-node-free
    # lattice), replacing a full-vector XLA pass per apply --------------
    if ring:
        # single contiguous-window copy per row (the old kernel's gather)
        for k, (srow, off) in enumerate(rows_table):
            v = slab[s_cur, srow, off : off + block]
            if with_ids:
                v = v * (
                    1.0
                    - jnp.abs(
                        ids_slab[s_cur, srow, off : off + block].astype(
                            dtype
                        )
                    )
                )
            x_ref[k, :] = v
        # carry the window overlap into the next slot (VPU, ~nothing) and
        # refill its new columns by DMA — overlaps the dots below
        @pl.when(i + 1 < nblk)
        def _slide():
            slab[s_nxt, :, 0:moff_pad] = slab[s_cur, :, block:win]
            if with_ids:
                ids_slab[s_nxt, :, 0:moff_pad] = ids_slab[
                    s_cur, :, block:win
                ]
            for d in step_all():
                d.start()
    else:

        def piece(j, srow, c0, c1):
            v = ins[j][srow, c0:c1]
            if with_ids:
                v = v * (
                    1.0 - jnp.abs(idss[j][srow, c0:c1].astype(dtype))
                )
            return v

        for k, (srow, off) in enumerate(rows_table):
            j, r = divmod(off, block)
            if r == 0:
                x_ref[k, :] = piece(j, srow, 0, block)
            else:
                x_ref[k, 0 : block - r] = piece(j, srow, r, block)
                x_ref[k, block - r : block] = piece(j + 1, srow, 0, r)

    # ---- dense eval dots ------------------------------------------------
    pt = dict(preferred_element_type=f32,
              precision=jax.lax.Precision.DEFAULT)
    x = x_ref[:]
    xe = x
    Ae = Ae_ref[:]
    if conv_bf16 and dtype == jnp.float32:
        # r only feeds the convective rows whose other factor is the bf16
        # stream — a bf16 evaluate pass keeps their accuracy class
        Ae = Ae.astype(jnp.bfloat16)
        xe = x.astype(jnp.bfloat16)
    r = jnp.dot(Ae, xe, **pt)
    s = jnp.dot(Aev_ref[:], su_ref[:], **pt)

    # ---- q-point rows (VPU) ---------------------------------------------
    sc = sc_ref  # SMEM scalars, see coupled_vmult_pr2
    beta = sc[0]
    parts = dim + 1

    def rows(blockv, part, c):
        i0 = (c * parts + part) * g
        return blockv[i0 : i0 + g]

    val_u = [rows(r, 0, c) for c in range(dim)]
    g_u = [[rows(r, 1 + d, c) for d in range(dim)] for c in range(dim)]
    val_s = [rows(s, 0, c) for c in range(dim)]
    g_s = [[rows(s, 1 + d, c) for d in range(dim)] for c in range(dim)]
    div = g_u[0][0]
    div_s = g_s[0][0]
    for a in range(1, dim):
        div = div + g_u[a][a]
        div_s = div_s + g_s[a][a]

    if variable:
        weight, tau1, rho0, mu0, damp0 = sc[2], sc[3], sc[4], sc[5], sc[6]
        has_rho, has_mu, has_damp = has
        cw = c_ref[:].astype(f32)
        cr = cw[0:g] if has_rho else rho0
        cmu = cw[g : 2 * g] if has_mu else mu0
        cd = cw[2 * g : 3 * g] if has_damp else damp0
        for c in range(dim):
            # convective Newton rows, balanced-tree accumulation
            t0 = beta * (div * val_s[c] + div_s * val_u[c])
            t1 = val_s[0] * g_u[c][0] + val_u[0] * g_s[c][0]
            for e in range(1, dim):
                t1 = t1 + val_s[e] * g_u[c][e] + val_u[e] * g_s[c][e]
            conv = t0 + t1
            # full q-point value rows: rho(q)*(weight*u + tau1*conv)
            # - damping(q)*u  (the reference's per-q rho/damping arrays)
            n_ref[c * g : (c + 1) * g] = cr * (
                weight * val_u[c] + tau1 * conv
            ) - cd * val_u[c]
        # symmetric stress rows: tau1*mu(q)*(du_a/dx_b + du_b/dx_a)
        tmu = tau1 * cmu
        kk = 0
        for a in range(dim):
            for b in range(a, dim):
                st_ref[kk * g : (kk + 1) * g] = tmu * (
                    g_u[a][b] + g_u[b][a]
                )
                kk += 1
        x_ref[:] = (
            jnp.dot(M_ref[:], x, **pt)
            + jnp.dot(Ai_ref[:], n_ref[:], **pt)
            + jnp.dot(Aig_ref[:], st_ref[:], **pt)
        )
    else:
        for c in range(dim):
            t0 = beta * (div * val_s[c] + div_s * val_u[c])
            t1 = val_s[0] * g_u[c][0] + val_u[0] * g_s[c][0]
            for e in range(1, dim):
                t1 = t1 + val_s[e] * g_u[c][e] + val_u[e] * g_s[c][e]
            n_ref[c * g : (c + 1) * g] = t0 + t1
        nn = n_ref[:]
        Ai = Ai_ref[:]
        if conv_bf16 and dtype == jnp.float32:
            nn = nn.astype(jnp.bfloat16)
            Ai = Ai.astype(jnp.bfloat16)
        # the result block reuses x_ref as scratch (x is fully consumed as
        # a loaded value above) — a separate value would cost a (89, B)
        # spill per step
        x_ref[:] = jnp.dot(M_ref[:], x, **pt) + jnp.dot(Ai, nn, **pt)

    # ---- phantom mask from lane iotas -----------------------------------
    if os.environ.get("ADAFLO_PR2_NOMASK") != "1":
        col = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1) + i * block
        m = None
        stride = 1
        for a in range(len(ash) - 1, -1, -1):
            n_ax = ash[a]
            ix = (col // stride) % n_ax if a > 0 else col // stride
            ok = ix < (n_ax - 1)
            m = ok if m is None else jnp.logical_and(m, ok)
            stride *= n_ax
        x_ref[:] = x_ref[:] * m.astype(dtype)

    # ---- overlap-add scatter into the ring accumulator ------------------
    for k, (srow, off) in enumerate(rows_table):
        acc_ref[srow, off : off + block] += x_ref[k, :]

    # ---- emit the completed columns -------------------------------------
    e = acc_ref[:, :block]
    if with_ids:
        # identity rows: out = r*(1-|ids|) + x*ids with x the UNMASKED
        # input (this block's resident vector and its signed mask)
        if ring:
            ids = ids_slab[s_cur, :, 0:block].astype(dtype)
            xin = slab[s_cur, :, 0:block]
        else:
            ids = idss[0][:, :].astype(dtype)
            xin = ins[0][:, :]
        e = e * (1.0 - jnp.abs(ids)) + xin * ids
    scale = sc[1]
    e = e * scale
    out_ref[:] = e
    if want_norm:
        norm_ref[0, 0] += jnp.sum(e.astype(f32) * e.astype(f32))
    carry_w = moff_pad
    acc_ref[:, :carry_w] = acc_ref[:, block : block + carry_w]
    acc_ref[:, carry_w:] = jnp.zeros_like(acc_ref[:, carry_w:])


def coupled_vmult_pr2(
    subs,
    s_t,
    tables: MatvecTables,
    scalars,
    rows_table,
    n_anchors: int,
    ash,
    *,
    c_t=None,
    has=(False, False, False),
    ids_t=None,
    scale=None,
    want_norm: bool = False,
    block: int | None = None,
    interpret: bool = False,
):
    """Fused coupled apply, parity-resident v2 (see _kernel_pr2).

    subs: (R_pad, L) resident packed vector with L = pr2_params(...)[3]
    (the caller pads; out has the SAME shape — residency is shape-stable).
    s_t: (dim n_u_loc, >=L) bf16 dof stream. ash: anchor raster shape
    (z, y, x)-ordered. c_t: optional (3g, >=L) coefficient stream with
    `has` flagging which of (rho, mu, damping) are streamed. ids_t:
    optional (R_pad, >=L) signed constraint-identity stream (+/-1 on
    constrained rows). scale: optional scalar multiplier folded into the
    output. want_norm: additionally return sum(out^2) as a scalar.

    scalars: (beta, scale, weight, tau1, rho0, mu0, damp0, tgd) — the
    kernel receives them as one SMEM vector; combine_linear-equivalent
    folding happens here (constant-coefficient mode folds mass/viscous
    into M89 exactly as combine_linear)."""
    dtype = subs.dtype
    n_cols = len(rows_table)
    EA = n_anchors
    block, n_extra, nblk, L = pr2_params(rows_table, EA, block)
    R_pad = subs.shape[0]
    assert R_pad % 8 == 0 and subs.shape[1] == L, (subs.shape, L)
    max_off = max(off for _, off in rows_table)
    moff_pad = -(-max_off // 128) * 128

    g = tables.g
    dim = tables.dim
    n_su = dim * tables.n_u_loc
    assert s_t.shape[0] == n_su
    variable = c_t is not None

    beta, scale_v, weight, tau1, rho0, mu0, damp0, tgd = scalars
    f32 = jnp.float32 if dtype != jnp.float64 else dtype
    if scale is not None:
        scale_v = scale
    sc = jnp.stack(
        [jnp.asarray(v, f32) for v in
         (beta, scale_v, weight, tau1, rho0, mu0, damp0)]
    )
    Ae = jnp.asarray(tables.A_evg, dtype)
    n_rows = Ae.shape[0]
    if variable:
        # M89 keeps only the truly-constant terms; mass/damping ride the
        # value rows, viscous rides the streamed stress
        M89 = jnp.asarray(tgd, dtype) * jnp.asarray(
            tables.M_gd, dtype
        ) + jnp.asarray(tables.M_pdiv, dtype)
        A_ics = jnp.asarray(tables.A_ic, dtype)  # pure V^T W
    else:
        rho_w = rho0 * weight - damp0
        M89, A_ics, _ = combine_linear(
            tables, (rho_w, tau1 * rho0, beta, tau1 * mu0, tgd), dtype
        )

    def pad_cols(arr, want):
        if arr.shape[-1] < want:
            arr = jnp.pad(arr, ((0, 0), (0, want - arr.shape[-1])))
        return arr[:, :want]

    s_t = pad_cols(s_t, L)
    if variable:
        c_t = pad_cols(c_t, L)
    with_ids = ids_t is not None
    if with_ids:
        ids_t = pad_cols(ids_t, L)

    rep2 = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((7,), lambda i: (0,), memory_space=pltpu.SMEM),
        rep2((n_rows, n_cols)),
        rep2((n_rows, n_su)),
        rep2((n_cols, n_cols)),
        rep2((n_cols, dim * g)),
    ]
    operands = [sc, Ae, jnp.asarray(tables.A_evg[:, :n_su], s_t.dtype),
                M89, A_ics]
    if variable:
        Aig = _AIG_CACHE.get(id(tables))
        assert Aig is not None, "call prepare_ig(tables, ev_u) first"
        n_pairs = dim * (dim + 1) // 2
        in_specs.append(rep2((n_cols, n_pairs * g)))
        operands.append(jnp.asarray(Aig, dtype))

    ring = os.environ.get("ADAFLO_PR2_MODE", "ring") == "ring"
    last = nblk - 1
    if ring:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(subs)
    else:
        for j in range(n_extra + 1):
            in_specs.append(
                pl.BlockSpec(
                    (R_pad, block),
                    (lambda i, j=j: (0, jnp.minimum(i + j, last))),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(subs)
    in_specs.append(
        pl.BlockSpec((n_su, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM)
    )
    operands.append(s_t)
    if variable:
        in_specs.append(
            pl.BlockSpec((3 * g, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        )
        operands.append(c_t)
    if with_ids:
        if ring:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            operands.append(ids_t)
        else:
            for j in range(n_extra + 1):
                in_specs.append(
                    pl.BlockSpec(
                        (R_pad, block),
                        (lambda i, j=j: (0, jnp.minimum(i + j, last))),
                        memory_space=pltpu.VMEM,
                    )
                )
                operands.append(ids_t)

    out_specs = [
        pl.BlockSpec((R_pad, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((R_pad, L), dtype)]
    if want_norm:
        out_specs.append(
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, 1), f32))

    scratch = [
        pltpu.VMEM((n_cols, block), dtype),
        pltpu.VMEM((dim * g, block), dtype),
    ]
    if variable:
        n_pairs = dim * (dim + 1) // 2
        scratch.append(pltpu.VMEM((n_pairs * g, block), dtype))
    scratch.append(pltpu.VMEM((R_pad, block + moff_pad), dtype))
    if ring:
        win = block + moff_pad
        scratch.append(pltpu.VMEM((2, R_pad, win), dtype))
        if with_ids:
            scratch.append(pltpu.VMEM((2, R_pad, win), ids_t.dtype))
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
        if with_ids:
            scratch.append(pltpu.SemaphoreType.DMA((2,)))

    kernel = functools.partial(
        _kernel_pr2,
        g,
        dim,
        tuple(rows_table),
        block,
        n_extra,
        moff_pad,
        tuple(ash),
        EA,
        variable,
        tuple(has),
        with_ids,
        want_norm,
        os.environ.get("ADAFLO_PALLAS_PR_BF16", "") == "conv",
        ring,
    )
    vmem_mb = int(os.environ.get("ADAFLO_PR2_VMEM_MB", "0"))
    params = {}
    if vmem_mb and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        )
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=out_specs if want_norm else out_specs[0],
        out_shape=out_shape if want_norm else out_shape[0],
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(*operands)
    if want_norm:
        return out[0], out[1][0, 0]
    return out


_AIG_CACHE: dict = {}


def prepare_ig(tables: MatvecTables, ev_u, dtype=np.float64):
    """Build and cache the stress-integration matrix for `tables`."""
    if id(tables) not in _AIG_CACHE:
        _AIG_CACHE[id(tables)] = build_tables_ig(tables, ev_u, dtype)
    return _AIG_CACHE[id(tables)]


def coupled_vmult_parity(
    subs,
    s_t,
    tables: MatvecTables,
    scalars,
    rows_table,
    n_anchors: int,
    block: int | None = None,
    interpret: bool = False,
):
    """Fused coupled apply with the gather INSIDE the kernel.

    subs: (R, L) stacked parity sub-lattices (u components' deg^dim
    sub-lattices then the pressure corner lattice), each on the anchor
    raster; L must cover the last block's DMA window (the caller pads).
    rows_table: static tuple of (sub row, anchor offset) per kernel x row,
    from LatticeOps._parity_rows of the velocity/pressure spaces.
    s_t: (dim n_u_loc, EA) frozen-linearization dof stream on the anchor
    raster (qdofs_t + cells_to_anchors). Returns (n_cols, EA): identical
    to the 'pe' layout's kernel output — same scatter path — but the
    (n_cols, EA) input block never rides HBM."""
    dtype = subs.dtype
    n_cols = len(rows_table)
    EA = n_anchors
    if block is None:
        block = int(os.environ.get("ADAFLO_PALLAS_BLOCK", "1024"))
    block = min(block, max(128, -(-EA // 128) * 128))
    EA_pad = -(-EA // block) * block
    max_off = max(off for _, off in rows_table)
    win = block + -(-max_off // 128) * 128
    # pad the sub-lattice count to a sublane multiple: the double-buffer
    # scratch is sliced at the dynamic slot index, and Mosaic requires
    # dynamically-offset VMEM slices to be (8, 128)-tile aligned (an
    # unpadded R=25 compiles only when the grid has one block and the slot
    # const-folds to 0)
    R = subs.shape[0]
    R_pad = -(-R // 8) * 8
    # pad the sub-lattices so the last block's window never runs off the end
    L_need = (EA_pad // block - 1) * block + win
    if subs.shape[1] < L_need or R_pad != R:
        subs = jnp.pad(
            subs,
            ((0, R_pad - R), (0, max(0, L_need - subs.shape[1]))),
        )
    if s_t.shape[-1] != EA_pad:
        s_t = jnp.pad(s_t, ((0, 0), (0, EA_pad - s_t.shape[-1])))

    g = tables.g
    dim = tables.dim
    n_su = dim * tables.n_u_loc
    assert s_t.shape[0] == n_su, "parity kernel requires the dof stream"
    Ae = jnp.asarray(tables.A_evg, dtype)
    n_rows = Ae.shape[0]
    M89, A_ics, beta = combine_linear(tables, scalars, dtype)
    rep2 = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _kernel_pi, g, dim, tuple(rows_table), win, block
    )
    out = pl.pallas_call(
        kernel,
        grid=(EA_pad // block,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            rep2((n_rows, n_cols)),
            rep2((n_rows, n_su)),
            rep2((n_cols, n_cols)),
            rep2((n_cols, dim * g)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (n_su, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_cols, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_cols, EA_pad), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, subs.shape[0], win), dtype),
            pltpu.VMEM((n_cols, block), dtype),
            pltpu.VMEM((dim * g, block), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        beta[None],
        Ae,
        jnp.asarray(tables.A_evg[:, :n_su], s_t.dtype),
        M89,
        A_ics,
        subs,
        s_t,
    )
    return out[:, :EA]
