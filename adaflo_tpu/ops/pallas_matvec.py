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
        block = int(os.environ.get("ADAFLO_PALLAS_PR_BLOCK", "4096"))
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
