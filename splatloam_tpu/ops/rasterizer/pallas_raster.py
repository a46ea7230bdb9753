"""Pallas TPU kernels for the spherical 2DGS rasterizer (fwd + bwd).

Replaces the CUDA ``diff_surfel_spherical_rasterization`` submodule with a
TPU-first design (see common.py for the math contract):

  * binning.py produces depth-ordered per-tile surfel lists (XLA);
  * the FORWARD kernel runs a (tiles, chunks) grid: per chunk it evaluates
    alpha for CHUNK surfels x TILE pixels as one [C, P] block — a [C,3]x[3,P]
    MXU matmul + VPU elementwise — and composites via an exclusive prefix
    scan of log(1-alpha) along the chunk axis (log-shift adds), carrying
    per-pixel transmittance in VMEM scratch across chunks.  Chunks past the
    tile's surfel count, or after every pixel saturates, are skipped;
  * chunk-boundary transmittances are saved, so the BACKWARD kernel runs
    chunks in reverse with only O(P) suffix carries (sum of w*phi, w, w*m),
    reconstructing all blend weights exactly — no atomics: per-tile gradient
    rows are scatter-added by surfel id afterwards in XLA, and gradients
    w.r.t. surfel params + SE(3) pose flow through jax.vjp of pack_surfels.

Gradient coverage: depth/alpha/normal/distortion channels (the median
channel is treated as non-differentiable, matching its use as a filter
only; all reference losses use expected depth, ref configs depth_ratio=0).
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import binning, common

T_EPS = 1e-4
_INTERPRET = False  # flipped by tests on CPU

# Perf-bisection hook (tools/kernel_bench.py): comma-set of
# {noexit,noscan,nogeo} read at TRACE time.  Production paths never set it.
import os as _os
_ABLATE = set(filter(None, _os.environ.get("RASTER_ABLATE", "").split(",")))


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


def _tri_mm(x, cmp):
    """Triangular-matrix prefix/suffix sums on the MXU.

    out[p, c] = sum_{c'} x[p, c'] * [cmp(c', c)] — e.g. cmp = (lt) gives the
    EXCLUSIVE prefix sum, (le) inclusive, (gt) strict suffix.  One
    [P,C]x[C,C] matmul replaces the log2(C) roll+select VPU passes of a
    shift-based scan; the MXU is otherwise idle in this kernel, and fp32
    accumulation keeps scan exactness."""
    c = x.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    l_ = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    m = cmp(r, l_).astype(jnp.float32)
    # HIGHEST: Mosaic rejects precision=HIGH inside kernels; the 0/1
    # matrix keeps products exact, accumulation is fp32.
    return jax.lax.dot_general(x, m, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


_LANE_BLK = 128  # MXU/lane tile: block-diagonal decomposition boundary


def _blocked_scan(x, cmp, reverse):
    """Block-triangular scan: for C > 128 lanes, the triangular mask is
    block-lower(upper)-triangular — off-diagonal blocks are all-ones, so
    their contribution is a running row-sum carry.  Splitting into 128-lane
    diagonal [P,128]x[128,128] dots + a [P,1] carry broadcast halves the
    MACs at C=256 (the off-diagonal block never enters the MXU) and the
    slices fall on native lane-tile boundaries (no relayout)."""
    c = x.shape[1]
    if c <= _LANE_BLK:
        return _tri_mm(x, cmp)
    assert c % _LANE_BLK == 0, \
        f"chunk {c} > {_LANE_BLK} must be a multiple of {_LANE_BLK} " \
        "(a ragged tail block would be silently dropped)"
    nb = c // _LANE_BLK
    blocks = [x[:, i * _LANE_BLK:(i + 1) * _LANE_BLK] for i in range(nb)]
    outs = [None] * nb
    carry = None
    idx = range(nb - 1, -1, -1) if reverse else range(nb)
    for i in idx:
        d = _tri_mm(blocks[i], cmp)
        outs[i] = d if carry is None else d + carry
        s = jnp.sum(blocks[i], axis=1, keepdims=True)
        carry = s if carry is None else carry + s
    return jnp.concatenate(outs, axis=1)


def _excl_prefix_sum(x):
    return _blocked_scan(x, lambda r, l_: r < l_, reverse=False)


def _incl_prefix_sum(x):
    return _blocked_scan(x, lambda r, l_: r <= l_, reverse=False)


def _strict_suffix_sum(x):
    return _blocked_scan(x, lambda r, l_: r > l_, reverse=True)


def _splat_geometry(F, rays, pix, width):
    """Shared fwd/bwd geometry: returns a dict of [P, C] / [1, C] arrays.

    F [16, C] feature-major; rays [P, 3]; pix [P, 2].  Pixels live on
    sublanes, surfels on lanes (so the chunk axis is the 128-lane axis and
    the HBM chunk DMA slices stay lane-aligned).
    """
    p3, gu3, gv3, n3 = F[0:3], F[3:6], F[6:9], F[9:12]      # [3, C]
    opa = F[12:13]
    depth_c = F[13:14]
    cx = F[14:15]
    cy = F[15:16]

    def dotr(a):  # rays [P, 3] x a [3, C] -> [P, C]
        # K=3 contraction as explicit [P,1]x[1,C] broadcast FMAs: an MXU
        # dot_general would pad K 3->128 (x6 HIGHEST passes) and dominate
        # the kernel; this is 5 exact-fp32 VPU flops per pair instead
        return (rays[:, 0:1] * a[0:1, :] + rays[:, 1:2] * a[1:2, :]
                + rays[:, 2:3] * a[2:3, :])

    A1, A2, A3 = dotr(gu3), dotr(gv3), dotr(n3)
    np_ = jnp.sum(n3 * p3, axis=0, keepdims=True)           # [1, C]
    pgu = jnp.sum(p3 * gu3, axis=0, keepdims=True)
    pgv = jnp.sum(p3 * gv3, axis=0, keepdims=True)

    denom = jnp.where(jnp.abs(A3) < 1e-8, 1e-8, A3)
    tstar = np_ / denom
    uu = tstar * A1 - pgu
    vv = tstar * A2 - pgv
    rho3 = uu * uu + vv * vv

    dx = pix[:, 0:1] - cx
    dx = dx - jnp.round(dx * (1.0 / width)) * width
    dy = pix[:, 1:2] - cy
    rho2 = common.FILTER_INV_SQUARE * (dx * dx + dy * dy)

    use2 = rho2 < rho3
    rho = jnp.where(use2, rho2, rho3)
    m = jnp.where(use2, depth_c, tstar)

    g_exp = jnp.exp(-0.5 * rho)
    alpha_raw = opa * g_exp
    alpha = jnp.minimum(alpha_raw, common.ALPHA_MAX)
    ok = (tstar > common.NEAR) & (alpha_raw >= common.ALPHA_MIN)
    alpha = jnp.where(ok, alpha, 0.0)
    return dict(p3=p3, gu3=gu3, gv3=gv3, n3=n3, opa=opa, depth_c=depth_c,
                A1=A1, A2=A2, A3=denom, np_=np_, tstar=tstar, uu=uu, vv=vv,
                use2=use2, m=m, g_exp=g_exp, alpha_raw=alpha_raw,
                alpha=alpha, ok=ok, dx=dx, dy=dy)


def _fwd_kernel(counts_ref, fg_ref, rays_ref, pix_ref,
                out_ref, tbound_ref,
                *, chunk, width, n_chunks, with_median, with_dist):
    """1-D tile grid; dynamic in-kernel loop over this tile's chunks.

    The whole tile's [16, K] feature block arrives as ONE auto-pipelined
    BlockSpec DMA (Pallas overlaps tile t+1's copy with tile t's compute);
    the in-kernel loop then slices chunks out of VMEM.  Ablations showed
    per-chunk manual HBM DMAs cost ~4.6 us/chunk-step in wait+descriptor
    overhead — 75%% of the whole forward — while a full-K block is only
    ~200 KB and its bandwidth is trivial.  The transmittance early-exit
    still skips the COMPUTE of dead chunks (sparse submaps and saturated
    tiles pay only VMEM traffic for work that exists).
    """
    t = pl.program_id(0)
    count = counts_ref[t]
    n_act = pl.cdiv(count, chunk)
    rays = rays_ref[0]                      # [P, 3]
    pix = pix_ref[0]                        # [P, 2]
    p_tile = rays.shape[0]

    def cond(state):
        i = state[0]
        if "noexit" in _ABLATE:
            return i < n_act
        return (i < n_act) & (jnp.max(state[1]) > T_EPS)

    def body(state):
        (i, T_carry, d_sum, a_sum, n_sum, med, dist) = state
        F = fg_ref[0, :, pl.ds(pl.multiple_of(i * chunk, chunk), chunk)]
        if "notb" not in _ABLATE:
            # chunk-start transmittance: lane-broadcast select into the
            # [P, nc] output block (a dynamic sublane store would be
            # illegal and a static predicated chain costs n_chunks
            # branches per step)
            tb = tbound_ref[0]
            col = jax.lax.broadcasted_iota(jnp.int32, tb.shape, 1)
            tbound_ref[0] = jnp.where(col == i, T_carry, tb)

        if "nogeo" in _ABLATE:
            alpha = jnp.broadcast_to(F[12:13] * 1e-3, (p_tile, chunk))
            m = jnp.broadcast_to(F[13:14], (p_tile, chunk))
            geo = dict(n3=F[9:12], alpha=alpha, m=m)
        else:
            geo = _splat_geometry(F, rays, pix, width)
            alpha, m = geo["alpha"], geo["m"]   # [P, C]
        if "noscan" in _ABLATE:
            logs = -alpha
            texc = 1.0 - alpha
        else:
            logs = jnp.log1p(-alpha)
            texc = jnp.exp(_excl_prefix_sum(logs))
        Ti = T_carry * texc                     # [P, C]
        w = alpha * Ti
        wm = w * m

        if with_dist:
            a_prev = a_sum + _excl_prefix_sum(w)
            d_prev = d_sum + _excl_prefix_sum(wm)
            dist = dist + jnp.sum(w * (m * a_prev - d_prev), axis=1,
                                  keepdims=True)

        if with_median:
            t_after = Ti * (1.0 - alpha)
            crossing = ((Ti > 0.5) & (t_after <= 0.5) &
                        (alpha > 0)).astype(jnp.float32)
            first = crossing * (_incl_prefix_sum(crossing) == 1.0)
            d_first = jnp.sum(first * m, axis=1, keepdims=True)
            any_c = jnp.sum(first, axis=1, keepdims=True) > 0
            med = jnp.where((med == 0.0) & any_c, d_first, med)

        if "nosum" in _ABLATE:
            d_sum = d_sum + wm[:, 0:1]
            a_sum = a_sum + w[:, 0:1]
            n_sum = n_sum + w[:, 0:3]
            T_carry = T_carry * 0.99
        else:
            d_sum = d_sum + jnp.sum(wm, axis=1, keepdims=True)
            a_sum = a_sum + jnp.sum(w, axis=1, keepdims=True)
            # n_sum [P, 3]: sum_c w[p, c] * n3[k, c] — three lane
            # reductions (an MXU dot would pad the size-3 out dim to 128)
            n3 = geo["n3"]
            n_sum = n_sum + jnp.concatenate(
                [jnp.sum(w * n3[k:k + 1, :], axis=1, keepdims=True)
                 for k in range(3)], axis=1)
            # full chunk product = exp(sum of logs) — one row reduce
            T_carry = T_carry * jnp.exp(jnp.sum(logs, axis=1,
                                                keepdims=True))
        return (i + 1, T_carry, d_sum, a_sum, n_sum, med, dist)

    # zero-init: chunks skipped by the early exit must read as dead
    # (T_start = 0) in the backward's liveness scan; Pallas outputs are
    # not zero-initialized by default
    tbound_ref[0] = jnp.zeros((p_tile, n_chunks), jnp.float32)
    zeros = jnp.zeros((p_tile, 1), jnp.float32)
    init = (jnp.int32(0), jnp.ones((p_tile, 1), jnp.float32), zeros,
            zeros, jnp.zeros((p_tile, 3), jnp.float32), zeros, zeros)
    (i_end, T_carry, d_sum, a_sum, n_sum, med, dist) = \
        jax.lax.while_loop(cond, body, init)

    out_ref[0, :, 0:1] = d_sum
    out_ref[0, :, 1:2] = a_sum
    out_ref[0, :, 2:5] = n_sum
    out_ref[0, :, 5:6] = med
    out_ref[0, :, 6:7] = dist
    out_ref[0, :, 7:8] = T_carry


def _bwd_kernel(counts_ref, fg_ref, rays_ref, pix_ref, tbound_ref,
                outs_ref, g_ref, *rest,
                chunk, width, n_chunks, with_median, with_dist,
                fused=False):
    """Reverse dynamic chunk loop per tile with O(P) suffix carries.
    Whole-tile [16, K] feature block auto-pipelined (see _fwd_kernel).

    ``fused``: the gradient reduction runs INSIDE this kernel — per-tile
    entry rows land in a VMEM scratch and are RMW-accumulated into the
    whole-pool output block (constant index map, VMEM-resident across
    the grid) right after the chunk loop.  Kills the [NT, K, 16] HBM
    round trip and the second kernel's launch/DMA pipeline that made the
    standalone-3.6 ms scatter cost 8.9 ms in context (docs/PERF.md r5).
    """
    t = pl.program_id(0)
    if fused:
        ids_ref, pool_ref, dF_ref = rest
        @pl.when(t == 0)
        def _init_pool():
            pool_ref[...] = jnp.zeros_like(pool_ref)
    else:
        (dF_ref,) = rest
    count = counts_ref[t]
    n_act = pl.cdiv(count, chunk)
    rays = rays_ref[0]                      # [P, 3]
    pix = pix_ref[0]                        # [P, 2]
    p_tile = rays.shape[0]
    dF_ref[...] = jnp.zeros_like(dF_ref)    # [1, K, 16] entry-major

    gD = g_ref[0, :, 0:1]                   # [P, 1]
    gA = g_ref[0, :, 1:2]
    gN = g_ref[0, :, 2:5]                   # [P, 3]
    gdist = g_ref[0, :, 6:7]
    A_total = outs_ref[0, :, 1:2]
    D_total = outs_ref[0, :, 0:1]

    # transmittance is monotone over chunks, so the chunks the forward
    # skipped (T_start <= eps) form a SUFFIX in forward order: reverse
    # processing can start at the last live chunk and drop the per-chunk
    # liveness branch entirely (enabling DMA double buffering)
    tb = tbound_ref[0]                       # [P, nc] chunk-start T
    col_max = jnp.max(tb, axis=0, keepdims=True)           # [1, nc]
    col = jax.lax.broadcasted_iota(jnp.int32, col_max.shape, 1)
    live = (col < n_act) & (col_max > T_EPS)
    n_live = jnp.sum(live.astype(jnp.int32))

    def body(ci, carry):
        S_phi_carry, W_carry, MD_carry = carry
        i = n_live - 1 - ci
        colp = jax.lax.broadcasted_iota(jnp.int32, tb.shape, 1)
        T_start = jnp.sum(jnp.where(colp == i, tb, 0.0), axis=1,
                          keepdims=True)      # [P, 1]

        F = fg_ref[0, :, pl.ds(pl.multiple_of(i * chunk, chunk), chunk)]
        geo = _splat_geometry(F, rays, pix, width)
        alpha, m = geo["alpha"], geo["m"]       # [P, C]
        Ti = T_start * jnp.exp(_excl_prefix_sum(jnp.log1p(-alpha)))
        w = alpha * Ti
        wm = w * m

        rsuf = _strict_suffix_sum

        # nphi [P, C]: sum_k gN[p, k] * n3[k, c] (broadcast FMAs, not MXU)
        n3 = geo["n3"]
        nphi = (gN[:, 0:1] * n3[0:1, :] + gN[:, 1:2] * n3[1:2, :]
                + gN[:, 2:3] * n3[2:3, :])
        phi = gD * m + gA + nphi
        if with_dist:
            W_suf = rsuf(w) + W_carry
            MD_suf = rsuf(wm) + MD_carry
            A_prev = A_total - w - W_suf
            D_prev = D_total - wm - MD_suf
            phi = phi + gdist * (m * A_prev - D_prev + MD_suf
                                 - m * W_suf)

        S_phi = rsuf(w * phi) + S_phi_carry
        one_m_a = jnp.maximum(1.0 - alpha, 1e-3)
        galpha = Ti * phi - S_phi / one_m_a
        galpha = jnp.where(alpha > 0, galpha, 0.0)
        gm = w * gD
        if with_dist:
            gm = gm + w * gdist * (A_prev - W_suf)

        not_capped = geo["alpha_raw"] < common.ALPHA_MAX
        live_px = geo["ok"] & not_capped
        g_opa_px = jnp.where(live_px, galpha * geo["g_exp"], 0.0)
        g_rho = jnp.where(live_px,
                          galpha * (-0.5) * geo["alpha_raw"], 0.0)
        use2 = geo["use2"]
        u3 = jnp.logical_not(use2)
        g_u = jnp.where(u3, g_rho * 2.0 * geo["uu"], 0.0)
        g_v = jnp.where(u3, g_rho * 2.0 * geo["vv"], 0.0)
        g_t = (g_u * geo["A1"] + g_v * geo["A2"]
               + jnp.where(u3, gm, 0.0))
        g_np = g_t / geo["A3"]
        g_A3 = -g_t * geo["tstar"] / geo["A3"]
        g_A1 = g_u * geo["tstar"]
        g_A2 = g_v * geo["tstar"]
        g_dx = jnp.where(use2, g_rho * 2.0 *
                         common.FILTER_INV_SQUARE * geo["dx"], 0.0)
        g_dy = jnp.where(use2, g_rho * 2.0 *
                         common.FILTER_INV_SQUARE * geo["dy"], 0.0)

        def sum_px(x):  # [P, C] -> [1, C]
            return jnp.sum(x, axis=0, keepdims=True)

        def dot_rays(x):  # sum_p rays[p, k] x[p, c] -> [3, C]
            # K=3 output dim: three sublane reductions beat a padded MXU dot
            return jnp.concatenate(
                [jnp.sum(rays[:, k:k + 1] * x, axis=0, keepdims=True)
                 for k in range(3)], axis=0)

        s_g_np = sum_px(g_np)
        s_g_u = sum_px(g_u)
        s_g_v = sum_px(g_v)
        d_gu = dot_rays(g_A1) - s_g_u * geo["p3"]
        d_gv = dot_rays(g_A2) - s_g_v * geo["p3"]
        # direct normal payload: sum_p gN[p,k] w[p,c] -> [3, C]
        gNw = jnp.concatenate(
            [jnp.sum(gN[:, k:k + 1] * w, axis=0, keepdims=True)
             for k in range(3)], axis=0)
        d_n = dot_rays(g_A3) + s_g_np * geo["p3"] + gNw
        d_p = (s_g_np * geo["n3"] - s_g_u * geo["gu3"]
               - s_g_v * geo["gv3"])
        dF = jnp.concatenate(
            [d_p, d_gu, d_gv, d_n, sum_px(g_opa_px),
             sum_px(jnp.where(use2, gm, 0.0)),
             sum_px(-g_dx), sum_px(-g_dy)], axis=0)   # [16, C]
        # emit entry-major [C, 16]: every downstream reduction (RMW
        # scatter, plan gather, ranksum gather) consumes contiguous
        # per-entry rows — transposing here (one [16, C] VMEM relayout
        # per chunk) replaces the XLA-side [BT, 16, K] -> [BT, K, 16]
        # transpose materialization of the whole gradient tensor
        dF_ref[0, pl.ds(pl.multiple_of(i * chunk, chunk), chunk),
               :] = jnp.swapaxes(dF, 0, 1)

        S_phi_carry = S_phi_carry + jnp.sum(w * phi, axis=1,
                                            keepdims=True)
        if with_dist:
            W_carry2 = W_carry + jnp.sum(w, axis=1, keepdims=True)
            MD_carry2 = MD_carry + jnp.sum(wm, axis=1, keepdims=True)
        else:
            W_carry2, MD_carry2 = W_carry, MD_carry
            return (S_phi_carry, W_carry2, MD_carry2)

        return (S_phi_carry, W_carry2, MD_carry2)

    zeros_p1 = jnp.zeros((p_tile, 1), jnp.float32)
    jax.lax.fori_loop(0, n_live, body, (zeros_p1, zeros_p1, zeros_p1))

    if fused:
        # in-kernel RMW reduction of this tile's entry rows (4-wide
        # unroll, see _scatter_rows_kernel; the <=3 overshoot entries of
        # the last quad are binning pads at the discarded dummy row)
        def sbody(q, _):
            j = q * 4
            for u in range(4):
                sid = ids_ref[0, 0, j + u]
                pool_ref[pl.ds(sid, 1), :] = (
                    pool_ref[pl.ds(sid, 1), :]
                    + dF_ref[0, pl.ds(j + u, 1), :])
            return 0

        jax.lax.fori_loop(0, (count + 3) // 4, sbody, 0)


def _bwd_call_fused(Fg, counts, rays_t, pix_t, tbound, outs, g_tiled,
                    flat_ids, n_rows, *, chunk, width, with_median,
                    with_dist):
    """One fused backward+reduction launch over flat [NT] tiles ->
    dF [n_rows, 16] accumulated by flat surfel id."""
    n_tiles, _, K = Fg.shape
    p_tile = rays_t.shape[1]
    n_chunks = K // chunk
    kernel = functools.partial(_bwd_kernel, chunk=chunk, width=width,
                               n_chunks=n_chunks, with_median=with_median,
                               with_dist=with_dist, fused=True)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 16, K), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 3), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 2), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, n_chunks), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, K), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((n_rows, 16), lambda t, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, K, 16), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(counts, Fg, rays_t, pix_t, tbound, outs, g_tiled,
      flat_ids.reshape(n_tiles, 1, K))


def _scatter_rows_kernel(counts_ref, ids_ref, rows_ref, dF_ref):
    """Sequential-grid scatter-add: dF[ids[t, j]] += rows[t, j] for
    j < counts[t].

    One grid step per tile; the [R, 16] output block has a constant index
    map so it stays VMEM-resident across all steps and is written back to
    HBM once.  Dynamic-sublane read-modify-write ([1, 16] slices at a
    runtime row) is legal Mosaic and measured ~2.2x faster than XLA's
    scatter-add lowering for the same rows (7.9 ms vs 17.6 ms, 433k rows,
    v5e) — and it skips pad rows for free via the per-tile count.  4-wide
    unrolling hides RMW latency (u1 11.2 ms / u4 7.9 ms / u8 9.2 ms).
    The <=3 overshoot entries of the last quad are binning pads pointing
    at the per-view dummy row, which the caller discards.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        dF_ref[...] = jnp.zeros_like(dF_ref)

    count = counts_ref[t]

    def body(q, _):
        j = q * 4
        for u in range(4):
            sid = ids_ref[0, 0, j + u]
            dF_ref[pl.ds(sid, 1), :] = (dF_ref[pl.ds(sid, 1), :]
                                        + rows_ref[0, pl.ds(j + u, 1), :])
        return 0

    jax.lax.fori_loop(0, (count + 3) // 4, body, 0)


def _scatter_rows_kernel_batched(counts_ref, ids_ref, rows_ref, dF_ref,
                                 *, tps):
    """Like _scatter_rows_kernel but ``tps`` tiles per grid step: the
    serial RMW work per step grows tps-fold while per-step fixed costs
    (block DMA issue, grid bookkeeping) are paid once — measured lever
    for the latency-bound (not row-bound) in-context scatter cost."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        dF_ref[...] = jnp.zeros_like(dF_ref)

    for g in range(tps):
        count = counts_ref[t * tps + g]

        def body(q, _, g=g):
            j = q * 4
            for u in range(4):
                sid = ids_ref[0, g, j + u]
                dF_ref[pl.ds(sid, 1), :] = (
                    dF_ref[pl.ds(sid, 1), :]
                    + rows_ref[g, pl.ds(j + u, 1), :])
            return 0

        jax.lax.fori_loop(0, (count + 3) // 4, body, 0)


def _scatter_rows(dFg, flat_ids, counts, n_rows, tps: int = 1):
    """dFg [BT, K, 16] per-tile-entry grads -> dF [n_rows, 16] by flat id.

    ``tps`` > 1 processes that many tiles per grid step (must divide BT)."""
    bt, K, _ = dFg.shape
    rows = dFg                                  # [BT, K, 16] entry-major
    if tps > 1:
        assert bt % tps == 0, (bt, tps)
        kernel = functools.partial(_scatter_rows_kernel_batched, tps=tps)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bt // tps,),
                in_specs=[
                    pl.BlockSpec((1, tps, K), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((tps, K, 16), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((n_rows, 16), lambda t, *_: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((n_rows, 16), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interpret(),
        )(counts, flat_ids.reshape(bt // tps, tps, K), rows)
    return pl.pallas_call(
        _scatter_rows_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bt,),
            in_specs=[
                pl.BlockSpec((1, 1, K), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K, 16), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_rows, 16), lambda t, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(counts, flat_ids.reshape(bt, 1, K), rows)


def _flat_view_ids(lists, n_plus1):
    """[B, T, K] per-view ids -> flat ids into a [B*(N+1)] pool."""
    b = lists.shape[0]
    offs = (jnp.arange(b, dtype=jnp.int32) * n_plus1)[:, None, None]
    return (lists + offs).reshape(-1)


class ScatterPlan(typing.NamedTuple):
    """Rebin-time occurrence tables for the gather-sum gradient
    reduction (binning.build_scatter_plan); leading [B] axis per view."""
    occ: jax.Array       # [B, N+1, M] flat slot ids (pad = T*K)
    ov_slots: jax.Array  # [B, OvCap]
    ov_ids: jax.Array    # [B, OvCap] (pad = N)
    n_ov: jax.Array      # [B]


def _scatter_overflow_kernel(nov_ref, ids_ref, rows_ref, dF_ref):
    """Count-aware RMW for the (few) occurrences beyond the occ table:
    dF[bi, ids[bi, ci, j]] += rows[bi, ci, j] for j < remaining count.
    The [1, N+1, 16] output block is the per-view pool, revisited across
    the chunk axis (ids are view-local)."""
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    del bi

    @pl.when(ci == 0)
    def _init():
        dF_ref[...] = jnp.zeros_like(dF_ref)

    ch = rows_ref.shape[2]
    todo = jnp.clip(nov_ref[pl.program_id(0)] - ci * ch, 0, ch)

    def body(q, _):
        j = q * 4
        for u in range(4):
            sid = ids_ref[0, 0, 0, j + u]
            dF_ref[0, pl.ds(sid, 1), :] = (
                dF_ref[0, pl.ds(sid, 1), :]
                + rows_ref[0, 0, pl.ds(j + u, 1), :])
        return 0

    jax.lax.fori_loop(0, (todo + 3) // 4, body, 0)


_OV_CHUNK = 512


def _scatter_with_plan(dFg, plan: ScatterPlan, b: int, n_plus1: int):
    """dFg [B*T, K, 16] -> dF [B, N+1, 16] via the occurrence tables:
    one [B*(N+1)*M]-row gather + an exact per-surfel tree sum, plus the
    count-aware overflow RMW.  Replaces the whole-pool RMW kernel
    (measured 9 ms -> ~2.5 ms per iteration at 100k/64x1024, v5e): the
    issue-bound cost drops to (N+1)*M + overflow rows, and every
    per-surfel sum is an exact short tree reduction."""
    bt, K, _ = dFg.shape
    tk = (bt // b) * K
    m = plan.occ.shape[-1]
    rows = dFg.reshape(b * tk, 16)
    rows1 = jnp.concatenate([rows, jnp.zeros((1, 16), jnp.float32)])
    dummy = b * tk
    boff = jnp.arange(b, dtype=jnp.int32) * tk
    occ_g = jnp.where(plan.occ == tk, dummy,
                      plan.occ + boff[:, None, None])
    if "noocc" in _ABLATE:   # perf bisection: occ gather-sum cost
        dF = jnp.zeros((b, n_plus1, 16), jnp.float32) + rows1[0] * 0.0
    else:
        dF = jnp.sum(rows1[occ_g.reshape(-1)].reshape(b, n_plus1, m, 16),
                     axis=2)

    ov_g = jnp.where(plan.ov_slots == tk, dummy,
                     plan.ov_slots + boff[:, None])
    ov_rows = rows1[ov_g.reshape(-1)].reshape(
        b, -1, _OV_CHUNK, 16)                       # [B, C, CH, 16]
    ov_ids = plan.ov_ids.reshape(b, -1, 1, _OV_CHUNK)
    n_chunks = ov_ids.shape[1]
    ovpool = pl.pallas_call(
        _scatter_overflow_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_chunks),
            in_specs=[
                pl.BlockSpec((1, 1, 1, _OV_CHUNK), lambda bi, ci, *_:
                             (bi, ci, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, _OV_CHUNK, 16), lambda bi, ci, *_:
                             (bi, ci, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_plus1, 16), lambda bi, ci, *_:
                                   (bi, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_plus1, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(plan.n_ov.reshape(b), ov_ids, ov_rows)
    if "noovf" in _ABLATE:   # perf bisection: overflow path cost
        return dF
    return dF + ovpool


class RanksumPlan(typing.NamedTuple):
    """Rebin-time id-sort for the rank-space segment-sum gradient
    reduction (binning.build_ranksum_plan); leading [B] axis per view.
    The ov_* fields exist only under sorted truncation (RS_TRUNC): the
    main path covers the first E id-sorted entries, real entries spilled
    past E ride the count-aware RMW overflow kernel."""
    pos: jax.Array         # [B, E] flat slot position, id-sorted order
    ranks: jax.Array       # [B, E] dense rank of the entry's id (pad -1)
    w_first: jax.Array     # [B, E/group] first rank of each group
    rank_of_id: jax.Array  # [B, N+1] rank row per id (absent -> dummy)
    ov_slots: jax.Array | None = None   # [B, OvCap] flat slot positions
    ov_ids: jax.Array | None = None     # [B, OvCap] surfel ids (pad N)
    n_ov: jax.Array | None = None       # [B]


# sorted-truncation fraction for the ranksum plan (0 = keep all T*K
# slots; 0 < f < 1 = keep the first f*T*K id-sorted entries + an RMW
# overflow list — binning pads sort last, so with typical ~35-45% real
# fill the truncated gather loses nothing).  Env-tunable for the lab.
_RS_TRUNC = float(_os.environ.get("RS_TRUNC", "0"))

# entries per one-hot matmul block (= write window) and groups per grid
# step.  Per-entry kernel cost is ~GROUP compares + GROUP x 16 MACs, so
# SMALLER groups cut compute linearly (dense ranks keep any group's ids
# within a GROUP-wide window regardless); 128 is the lane-tile floor.
# Env-overridable at trace time for the perf lab (tools/scatter_lab.py).
_RS_GROUP = int(_os.environ.get("RS_GROUP", "128"))
_RS_GPS = int(_os.environ.get("RS_GPS", "64"))
# VMEM row bounds (empirical, v5e).  The RMW pool ([R, 16] revisited
# output) runs at 200k rows and compile-OOMs at 400k; the ranksum rank
# accumulator OOMs already at 2 x 100136 rows (107.3 MB scoped vs the
# 101.5 MB limit — its grid scopes every view's window concurrently),
# while one 100136-row view (51 MB) runs all day.
_RS_POOL_ROWS_MAX = 110_000
assert _RS_GROUP >= 128 and _RS_GROUP % 128 == 0, \
    f"RS_GROUP {_RS_GROUP}: the ranksum kernel's rank blocks are " \
    "128-lane rows, so the group (write window) floor is 128"


def _ranksum_kernel(w_ref, ranks_ref, rows_ref, dF_ref, *, group, gps):
    """Rank-windowed one-hot segment sum.

    Per group of ``group`` id-sorted entries: build the [group, group]
    0/1 matrix OH[r, g] = (rank[g] - w == r), then
    dF[w : w+group] += OH @ rows — the whole group reduces through the
    MXU (exact: 0/1 lhs, fp32 accumulation) with ONE windowed
    read-add-write of the accumulator, replacing ``group`` serial
    dynamic-sublane RMWs.  Dense ranks guarantee the group's ids span
    at most ``group`` consecutive rank rows (see build_ranksum_plan).
    """
    b = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        dF_ref[...] = jnp.zeros_like(dF_ref)

    nsub = group // 128
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (group, 1), 0)
    for q in range(gps):
        w = w_ref[b, s * gps + q]
        pieces = []
        for c in range(nsub):
            rl = ranks_ref[0, 0, q * nsub + c, :]           # [128]
            pieces.append(
                (iota_w == (rl[None, :] - w)).astype(jnp.float32))
        oh = jnp.concatenate(pieces, axis=1)                # [W, G]
        rows_q = rows_ref[0, 0, pl.ds(q * group, group), :]  # [G, 16]
        out = jax.lax.dot_general(
            oh, rows_q, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)             # [W, 16]
        acc = dF_ref[0, pl.ds(w, group), :]
        dF_ref[0, pl.ds(w, group), :] = acc + out


def _reduce_with_ranksum(dFg, plan: RanksumPlan, b: int, n_plus1: int):
    """dFg [B*T, K, 16] -> dF [B, N+1, 16] via the id-sorted rank plan."""
    bt, K, _ = dFg.shape
    return _reduce_rows_with_ranksum(dFg.reshape(b, (bt // b) * K, 16),
                                     plan, n_plus1)


def _reduce_rows_with_ranksum(rows_all, plan: RanksumPlan, n_plus1: int):
    """rows_all [B, TK, 16] per-slot entry-major gradients -> dF
    [B, N+1, 16]: one contiguous row gather into id-sorted order + the
    rank-windowed one-hot kernel (plan.pos indexes rows_all's flat slot
    axis, whatever layout produced it — padded tiles or buckets)."""
    group, gps = _RS_GROUP, _RS_GPS
    b, tk, _ = rows_all.shape
    e_pad = plan.pos.shape[-1]
    r_alloc0 = binning._ranksum_alloc(n_plus1, group)
    if b >= 2 and b * r_alloc0 > _RS_POOL_ROWS_MAX:
        # the kernel's [B, r_alloc, 16] rank accumulator scopes ALL
        # views' windows in VMEM at the native (8, 128) layout (a
        # [2, 100136, 16] output = 102 MB > the scoped limit; measured
        # r5 compile OOM): reduce views sequentially instead — one
        # launch per view, same exact math
        return jnp.concatenate([
            _reduce_rows_with_ranksum(
                rows_all[i:i + 1],
                jax.tree_util.tree_map(lambda x, i=i: x[i:i + 1], plan),
                n_plus1)
            for i in range(b)])
    n_steps = e_pad // (gps * group)
    boff = (jnp.arange(b, dtype=jnp.int32) * tk)[:, None]
    pos = (plan.pos + boff).reshape(-1)
    if "rsnogather" in _ABLATE:        # perf bisection: gather cost
        rows = (jnp.zeros((b * e_pad, 16), jnp.float32)
                + jnp.sum(rows_all) * 0.0)
    else:
        rows = rows_all.reshape(b * tk, 16)[pos]            # [B*E, 16]
    rows = rows.reshape(b, n_steps, gps * group, 16)
    ranks = plan.ranks.reshape(b, n_steps, gps * (group // 128), 128)
    w_first = plan.w_first.reshape(b, -1)
    r_alloc = binning._ranksum_alloc(n_plus1, group)
    if "rsnokernel" in _ABLATE:        # perf bisection: kernel cost
        dFc = (jnp.zeros((b, r_alloc, 16), jnp.float32)
               + jnp.sum(rows) * 0.0)
        return jax.vmap(lambda d, r: d[r])(dFc, plan.rank_of_id)
    kernel = functools.partial(_ranksum_kernel, group=group, gps=gps)
    dFc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_steps),
            in_specs=[
                pl.BlockSpec((1, 1, gps * (group // 128), 128),
                             lambda bi, s, *_: (bi, s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, gps * group, 16),
                             lambda bi, s, *_: (bi, s, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, r_alloc, 16),
                                   lambda bi, s, *_: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, r_alloc, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(w_first, ranks, rows)
    dF = jax.vmap(lambda d, r: d[r])(dFc, plan.rank_of_id)
    if plan.ov_slots is None:
        return dF
    # sorted-truncation overflow: gather the (few, usually zero) real
    # entries spilled past the truncated main path and RMW them in
    # (count-aware; same kernel as the occurrence plan's overflow)
    n_plus1 = plan.rank_of_id.shape[-1]
    ov_cap = plan.ov_slots.shape[-1]
    ov_pad = (-ov_cap) % _OV_CHUNK
    ov_slots = jnp.pad(plan.ov_slots, ((0, 0), (0, ov_pad)),
                       constant_values=0)
    ov_ids = jnp.pad(plan.ov_ids, ((0, 0), (0, ov_pad)),
                     constant_values=n_plus1 - 1)
    boffs = (jnp.arange(b, dtype=jnp.int32) * tk)[:, None]
    ov_rows = rows_all.reshape(b * tk, 16)[
        (ov_slots + boffs).reshape(-1)].reshape(
            b, -1, _OV_CHUNK, 16)
    ov_idsr = ov_ids.reshape(b, -1, 1, _OV_CHUNK)
    n_chunks = ov_idsr.shape[1]
    ovpool = pl.pallas_call(
        _scatter_overflow_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_chunks),
            in_specs=[
                pl.BlockSpec((1, 1, 1, _OV_CHUNK), lambda bi, ci, *_:
                             (bi, ci, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, _OV_CHUNK, 16), lambda bi, ci, *_:
                             (bi, ci, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_plus1, 16), lambda bi, ci, *_:
                                   (bi, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_plus1, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(plan.n_ov.reshape(b), ov_idsr, ov_rows)
    return dF + ovpool


def _gather_features(F, lists):
    """F [B, N+1, 16], lists [B, T, K] -> Fg [B*T, 16, K] via ONE flat
    gather (vmapped gathers lower poorly on TPU)."""
    b, n_plus1, _ = F.shape
    flat = F.reshape(b * n_plus1, 16)[_flat_view_ids(lists, n_plus1)]
    bt = lists.shape[0] * lists.shape[1]
    return jnp.swapaxes(flat.reshape(bt, lists.shape[2], 16), 1, 2)


def _fwd_call(Fg, counts, rays_t, pix_t, *, chunk, width, with_median,
              with_dist):
    """One forward kernel launch over flat [NT] tiles: Fg [NT, 16, K],
    counts [NT], rays/pix [NT, P, .] -> (out [NT, P, 8],
    tbound [NT, P, K/chunk])."""
    n_tiles, _, K = Fg.shape
    p_tile = rays_t.shape[1]
    n_chunks = K // chunk
    kernel = functools.partial(_fwd_kernel, chunk=chunk, width=width,
                               n_chunks=n_chunks, with_median=with_median,
                               with_dist=with_dist)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 16, K), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 3), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 2), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, p_tile, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, n_chunks), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, p_tile, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p_tile, n_chunks),
                                 jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(counts, Fg, rays_t, pix_t)


def _forward_tiled(F, lists, counts, rays_t, pix_t, *, tile_h, tile_w,
                   chunk, width, with_median, with_dist, scatter_tps=1,
                   fused_scatter=False):
    """Batched over views: F [B, N+1, 16], lists [B, T, K], rays/pix
    [B, T, P, .].  All views' tiles flatten into ONE [B*T] kernel grid —
    the kernel is per-tile, so multi-view rendering amortizes launch and
    pipeline overhead across views (PERF.md round-2 backlog)."""
    b, n_tiles, K = lists.shape
    p_tile = tile_h * tile_w
    n_chunks = K // chunk
    Fg = _gather_features(F, lists)             # [B*T, 16, K]
    out, tbound = _fwd_call(
        Fg, counts.reshape(b * n_tiles),
        rays_t.reshape(b * n_tiles, p_tile, 3),
        pix_t.reshape(b * n_tiles, p_tile, 2),
        chunk=chunk, width=width, with_median=with_median,
        with_dist=with_dist)
    return (out.reshape(b, n_tiles, p_tile, 8),
            tbound.reshape(b, n_tiles, p_tile, n_chunks), Fg)


def _bwd_call(Fg, counts, rays_t, pix_t, tbound, outs, g_tiled, *, chunk,
              width, with_median, with_dist):
    """One backward kernel launch over flat [NT] tiles ->
    dFg [NT, K, 16] entry-major per-slot gradients."""
    n_tiles, _, K = Fg.shape
    p_tile = rays_t.shape[1]
    n_chunks = K // chunk
    kernel = functools.partial(_bwd_kernel, chunk=chunk, width=width,
                               n_chunks=n_chunks, with_median=with_median,
                               with_dist=with_dist)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 16, K), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 3), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 2), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, n_chunks), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, K, 16), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, K, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(counts, Fg, rays_t, pix_t, tbound, outs, g_tiled)


def _backward_tiled(F, lists, counts, rays_t, pix_t, tbound, outs, g_tiled,
                    *, tile_h, tile_w, chunk, width, with_median,
                    with_dist, scatter_tps=1, fused_scatter=False,
                    Fg=None, plan=None):
    """Batched like _forward_tiled; returns dF [B, N+1, 16].

    ``Fg`` (the per-tile gathered features from the forward) is reused when
    supplied: the random-access gather of T*K narrow rows costs ~27 ms at
    B=4 on v5e — far more than the sequential HBM traffic of keeping the
    already-materialized forward copy alive as a residual.
    """
    b, n_tiles, K = lists.shape
    p_tile = tile_h * tile_w
    n_chunks = K // chunk
    n_plus1 = F.shape[1]
    if Fg is None:
        Fg = _gather_features(F, lists)         # [B*T, 16, K]
    counts = counts.reshape(b * n_tiles)
    # VMEM residency guard for the whole-pool RMW outputs.  Empirical
    # v5e bounds (round 5): a [200002, 16] pool window compiles and
    # runs; [400004, 16] OOMs at compile with a 204 MB "output window"
    # allocation (the compiler reports R x 128 lanes x 4 B for the
    # single-buffered window at that size).  Gate on rows, between the
    # two measured points.
    pool_rows_ok = b * n_plus1 <= 220_000
    if (fused_scatter and "fakescatter" not in _ABLATE
            and pool_rows_ok):
        dF = _bwd_call_fused(
            Fg, counts,
            rays_t.reshape(b * n_tiles, p_tile, 3),
            pix_t.reshape(b * n_tiles, p_tile, 2),
            tbound.reshape(b * n_tiles, p_tile, n_chunks),
            outs.reshape(b * n_tiles, p_tile, 8),
            g_tiled.reshape(b * n_tiles, p_tile, 8),
            _flat_view_ids(lists, n_plus1), b * n_plus1,
            chunk=chunk, width=width, with_median=with_median,
            with_dist=with_dist)
        return dF.reshape(b, n_plus1, 16)
    dFg = _bwd_call(
        Fg, counts,
        rays_t.reshape(b * n_tiles, p_tile, 3),
        pix_t.reshape(b * n_tiles, p_tile, 2),
        tbound.reshape(b * n_tiles, p_tile, n_chunks),
        outs.reshape(b * n_tiles, p_tile, 8),
        g_tiled.reshape(b * n_tiles, p_tile, 8),
        chunk=chunk, width=width, with_median=with_median,
        with_dist=with_dist)
    n_tiles = b * n_tiles
    # scatter per-tile-entry grads back to surfels (atomics-free);
    # dFg is [B*T, K, 16] entry-major straight out of the kernel
    if "fakescatter" in _ABLATE:   # perf bisection: RMW scatter cost
        return jnp.zeros((b, n_plus1, 16), jnp.float32
                         ).at[:, 0].add(jnp.sum(dFg, axis=(0, 1))[None])
    if plan is not None and "noplan" not in _ABLATE:
        if isinstance(plan, RanksumPlan):
            return _reduce_with_ranksum(dFg, plan, b, n_plus1)
        return _scatter_with_plan(dFg, plan, b, n_plus1)
    if "constrows" in _ABLATE:  # perf bisection: scatter with rows that
        # do not depend on the backward kernel (dFg still computed+read)
        dFg = jnp.ones_like(dFg) + jnp.sum(dFg) * 1e-30
    if b * n_plus1 <= 220_000:  # empirical VMEM bound, see above
        # in-kernel RMW scatter over a VMEM-resident [B*(N+1), 16] pool
        # (see _scatter_rows_kernel); all views share one kernel grid
        tps = max(1, scatter_tps)
        while n_tiles % tps:
            tps //= 2
        dF = _scatter_rows(dFg, _flat_view_ids(lists, n_plus1),
                           counts, b * n_plus1, tps=tps)
        return dF.reshape(b, n_plus1, 16)
    # fallback for pools too large for VMEM residency: an UNROLLED
    # per-view 1-D scatter-add is ~4x faster than either a vmapped
    # per-view scatter (pathological batched-scatter lowering) or one
    # flat offset-indexed scatter over a [B*(N+1)] pool (measured 62 ms
    # vs 244 ms at B=4, T*K=786k rows, TPU v5e).
    rows_v = dFg.reshape(b, n_tiles // b * K, 16)
    return jnp.stack([
        jnp.zeros((n_plus1, 16), jnp.float32)
        .at[lists[i].reshape(-1)].add(rows_v[i])
        for i in range(b)
    ])


# ---------------------------------------------------------------------------
# Flat compacted-slot-pool kernels (layout="flat")
#
# The padded [T, K] per-tile layout taxes every slot-level consumer with
# the cap: the per-iteration feature gather, the kernel block DMAs and
# the gradient scatter all touch T*K rows although only ~40-45% are real
# on KITTI-scale scenes — and the issue-bound row-copy cost is per-row
# and width-independent (measured 4.3 ns/row on v5e).  Here each tile's
# depth-ordered slot segment sits back-to-back in ONE flat array padded
# only to the next chunk multiple (binning.build_flat_lists); the kernel
# grid runs over FLAT CHUNKS with scalar-prefetched chunk->tile routing,
# accumulating into a revisited per-tile output block.  Pad slots point
# at the zero feature row, whose opacity 0 self-neutralizes (alpha_raw
# < ALPHA_MIN), so no per-tile count logic survives in the kernel.
# ---------------------------------------------------------------------------


def _fwd_kernel_flat(tile_sc, fg_ref, rays_ref, pix_ref,
                     out_ref, tbound_ref,
                     *, width, with_median, with_dist):
    """Grid = flat chunks.  out_ref is the revisited per-tile accumulator
    (cols: 0 d_sum | 1 a_sum | 2:5 n_sum | 5 med | 6 dist | 7 T_carry);
    tbound_ref holds the chunk-START transmittance per flat chunk (zeroed
    for chunks the saturation exit skipped, as the backward's liveness
    test expects)."""
    i = pl.program_id(0)
    t = tile_sc[i]
    prev_t = tile_sc[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, prev_t != t)
    rays = rays_ref[0]                      # [P, 3]
    pix = pix_ref[0]
    p_tile = rays.shape[0]

    @pl.when(first)
    def _init():
        # cols 0..6 zero, col 7 (T_carry) one — no scatter in-kernel
        out_ref[0] = jnp.concatenate(
            [jnp.zeros((p_tile, 7), jnp.float32),
             jnp.ones((p_tile, 1), jnp.float32)], axis=1)

    T_carry = out_ref[0, :, 7:8]
    alive = jnp.max(T_carry) > T_EPS
    # tbound row 0 of an [8, P] block (Mosaic wants sublane-dim >= 8)
    tbound_ref[0, 0] = jnp.where(alive, T_carry[:, 0], 0.0)

    @pl.when(alive)
    def _compute():
        F = fg_ref[0]                       # [16, C]
        geo = _splat_geometry(F, rays, pix, width)
        alpha, m = geo["alpha"], geo["m"]   # [P, C]
        logs = jnp.log1p(-alpha)
        texc = jnp.exp(_excl_prefix_sum(logs))
        Ti = T_carry * texc
        w = alpha * Ti
        wm = w * m
        acc = out_ref[0]
        d_sum = acc[:, 0:1] + jnp.sum(wm, axis=1, keepdims=True)
        a_sum_prev = acc[:, 1:2]
        a_sum = a_sum_prev + jnp.sum(w, axis=1, keepdims=True)
        n3 = geo["n3"]
        n_sum = acc[:, 2:5] + jnp.concatenate(
            [jnp.sum(w * n3[k:k + 1, :], axis=1, keepdims=True)
             for k in range(3)], axis=1)
        med = acc[:, 5:6]
        dist = acc[:, 6:7]
        if with_dist:
            a_prev = a_sum_prev + _excl_prefix_sum(w)
            d_prev = acc[:, 0:1] + _excl_prefix_sum(wm)
            dist = dist + jnp.sum(w * (m * a_prev - d_prev), axis=1,
                                  keepdims=True)
        if with_median:
            t_after = Ti * (1.0 - alpha)
            crossing = ((Ti > 0.5) & (t_after <= 0.5) &
                        (alpha > 0)).astype(jnp.float32)
            fst = crossing * (_incl_prefix_sum(crossing) == 1.0)
            d_first = jnp.sum(fst * m, axis=1, keepdims=True)
            any_c = jnp.sum(fst, axis=1, keepdims=True) > 0
            med = jnp.where((med == 0.0) & any_c, d_first, med)
        T_new = T_carry * jnp.exp(jnp.sum(logs, axis=1, keepdims=True))
        out_ref[0] = jnp.concatenate(
            [d_sum, a_sum, n_sum, med, dist, T_new], axis=1)


def _bwd_kernel_flat(tile_sc, fg_ref, rays_ref, pix_ref, tbound_ref,
                     outs_ref, g_ref, dF_ref, carry_ref,
                     *, width, with_median, with_dist, n_chunks):
    """Reverse flat-chunk grid (index maps run chunks back-to-front);
    carry_ref [P, 3] scratch holds (S_phi, W, MD) suffix carries, reset
    at each tile's deepest chunk."""
    i = pl.program_id(0)
    rev = n_chunks - 1 - i
    t = tile_sc[rev]
    nxt = tile_sc[jnp.minimum(rev + 1, n_chunks - 1)]
    first = jnp.logical_or(i == 0, nxt != t)
    rays = rays_ref[0]
    pix = pix_ref[0]
    p_tile = rays.shape[0]

    @pl.when(first)
    def _init():
        carry_ref[...] = jnp.zeros((p_tile, 3), jnp.float32)

    T_start = tbound_ref[0, 0][:, None]     # [P, 1]
    live = jnp.max(T_start) > T_EPS

    @pl.when(live)
    def _compute():
        gD = g_ref[0, :, 0:1]
        gA = g_ref[0, :, 1:2]
        gN = g_ref[0, :, 2:5]
        gdist = g_ref[0, :, 6:7]
        A_total = outs_ref[0, :, 1:2]
        D_total = outs_ref[0, :, 0:1]
        S_phi_carry = carry_ref[:, 0:1]
        W_carry = carry_ref[:, 1:2]
        MD_carry = carry_ref[:, 2:3]

        F = fg_ref[0]
        geo = _splat_geometry(F, rays, pix, width)
        alpha, m = geo["alpha"], geo["m"]
        Ti = T_start * jnp.exp(_excl_prefix_sum(jnp.log1p(-alpha)))
        w = alpha * Ti
        wm = w * m
        rsuf = _strict_suffix_sum

        n3 = geo["n3"]
        nphi = (gN[:, 0:1] * n3[0:1, :] + gN[:, 1:2] * n3[1:2, :]
                + gN[:, 2:3] * n3[2:3, :])
        phi = gD * m + gA + nphi
        if with_dist:
            W_suf = rsuf(w) + W_carry
            MD_suf = rsuf(wm) + MD_carry
            A_prev = A_total - w - W_suf
            D_prev = D_total - wm - MD_suf
            phi = phi + gdist * (m * A_prev - D_prev + MD_suf
                                 - m * W_suf)

        S_phi = rsuf(w * phi) + S_phi_carry
        one_m_a = jnp.maximum(1.0 - alpha, 1e-3)
        galpha = Ti * phi - S_phi / one_m_a
        galpha = jnp.where(alpha > 0, galpha, 0.0)
        gm = w * gD
        if with_dist:
            gm = gm + w * gdist * (A_prev - W_suf)

        not_capped = geo["alpha_raw"] < common.ALPHA_MAX
        live_px = geo["ok"] & not_capped
        g_opa_px = jnp.where(live_px, galpha * geo["g_exp"], 0.0)
        g_rho = jnp.where(live_px,
                          galpha * (-0.5) * geo["alpha_raw"], 0.0)
        use2 = geo["use2"]
        u3 = jnp.logical_not(use2)
        g_u = jnp.where(u3, g_rho * 2.0 * geo["uu"], 0.0)
        g_v = jnp.where(u3, g_rho * 2.0 * geo["vv"], 0.0)
        g_t = (g_u * geo["A1"] + g_v * geo["A2"]
               + jnp.where(u3, gm, 0.0))
        g_np = g_t / geo["A3"]
        g_A3 = -g_t * geo["tstar"] / geo["A3"]
        g_A1 = g_u * geo["tstar"]
        g_A2 = g_v * geo["tstar"]
        g_dx = jnp.where(use2, g_rho * 2.0 *
                         common.FILTER_INV_SQUARE * geo["dx"], 0.0)
        g_dy = jnp.where(use2, g_rho * 2.0 *
                         common.FILTER_INV_SQUARE * geo["dy"], 0.0)

        def sum_px(x):
            return jnp.sum(x, axis=0, keepdims=True)

        def dot_rays(x):
            return jnp.concatenate(
                [jnp.sum(rays[:, k:k + 1] * x, axis=0, keepdims=True)
                 for k in range(3)], axis=0)

        s_g_np = sum_px(g_np)
        s_g_u = sum_px(g_u)
        s_g_v = sum_px(g_v)
        d_gu = dot_rays(g_A1) - s_g_u * geo["p3"]
        d_gv = dot_rays(g_A2) - s_g_v * geo["p3"]
        gNw = jnp.concatenate(
            [jnp.sum(gN[:, k:k + 1] * w, axis=0, keepdims=True)
             for k in range(3)], axis=0)
        d_n = dot_rays(g_A3) + s_g_np * geo["p3"] + gNw
        d_p = (s_g_np * geo["n3"] - s_g_u * geo["gu3"]
               - s_g_v * geo["gv3"])
        dF_ref[0] = jnp.concatenate(
            [d_p, d_gu, d_gv, d_n, sum_px(g_opa_px),
             sum_px(jnp.where(use2, gm, 0.0)),
             sum_px(-g_dx), sum_px(-g_dy)], axis=0)   # [16, C]

        new_S = S_phi_carry + jnp.sum(w * phi, axis=1, keepdims=True)
        if with_dist:
            new_W = W_carry + jnp.sum(w, axis=1, keepdims=True)
            new_MD = MD_carry + jnp.sum(wm, axis=1, keepdims=True)
        else:
            new_W, new_MD = W_carry, MD_carry
        carry_ref[...] = jnp.concatenate([new_S, new_W, new_MD], axis=1)

    @pl.when(jnp.logical_not(live))
    def _dead():
        dF_ref[0] = jnp.zeros_like(dF_ref[0])


def _scatter_rows_kernel_flat(ids_ref, rows_ref, dF_ref):
    """Flat-chunk RMW scatter: dF[ids[j]] += rows[j] for every slot of
    this chunk (pad slots hit the dummy row, discarded by the caller)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dF_ref[...] = jnp.zeros_like(dF_ref)

    chunk = rows_ref.shape[1]

    def body(q, _):
        j = q * 4
        for u in range(4):
            sid = ids_ref[0, 0, j + u]
            dF_ref[pl.ds(sid, 1), :] = (dF_ref[pl.ds(sid, 1), :]
                                        + rows_ref[0, pl.ds(j + u, 1), :])
        return 0

    jax.lax.fori_loop(0, chunk // 4, body, 0)


def _scatter_rows_flat(dFg, flat_ids, n_rows):
    """dFg [NC, 16, chunk] per-slot grads -> dF [n_rows, 16] by flat id."""
    nc, _, chunk = dFg.shape
    rows = jnp.swapaxes(dFg, 1, 2)              # [NC, chunk, 16]
    return pl.pallas_call(
        _scatter_rows_kernel_flat,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, chunk, 16), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_rows, 16), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(flat_ids.reshape(nc, 1, chunk), rows)


def _forward_flat(F, flat_ids, tile_of_chunk, rays_t, pix_t, *, tile_h,
                  tile_w, chunk, width, with_median, with_dist):
    """F [B, N+1, 16]; flat_ids [B, E] per-view slot ids; tile_of_chunk
    [B, E/chunk] per-view tile routing; rays/pix [B, T, P, .]."""
    b, n_plus1, _ = F.shape
    E = flat_ids.shape[1]
    n_tiles = rays_t.shape[1]
    p_tile = tile_h * tile_w
    nc = (b * E) // chunk
    gidx = _flat_view_ids(flat_ids[:, None, :], n_plus1)      # [B*E]
    flat = F.reshape(b * n_plus1, 16)[gidx]                   # [B*E, 16]
    Fg = jnp.swapaxes(flat.reshape(nc, chunk, 16), 1, 2)      # [NC,16,C]
    toc = (tile_of_chunk
           + (jnp.arange(b, dtype=jnp.int32) * n_tiles)[:, None]
           ).reshape(-1)                                      # [NC]
    rays_f = rays_t.reshape(b * n_tiles, p_tile, 3)
    pix_f = pix_t.reshape(b * n_tiles, p_tile, 2)
    kernel = functools.partial(_fwd_kernel_flat, width=width,
                               with_median=with_median,
                               with_dist=with_dist)
    out, tbound = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((1, 16, chunk), lambda i, sc: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 3), lambda i, sc: (sc[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 2), lambda i, sc: (sc[i], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, p_tile, 8), lambda i, sc: (sc[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, p_tile), lambda i, sc: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * n_tiles, p_tile, 8), jnp.float32),
            jax.ShapeDtypeStruct((nc, 8, p_tile), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(toc, Fg, rays_f, pix_f)
    # tiles with zero binned chunks are never visited by the grid: their
    # output block is uninitialized — substitute the empty-tile state
    # (all zeros, T = 1)
    visited = jnp.zeros((b * n_tiles,), bool).at[toc].set(True)
    empty = jnp.zeros((p_tile, 8), jnp.float32).at[:, 7].set(1.0)
    out = jnp.where(visited[:, None, None], out, empty[None])
    return out.reshape(b, n_tiles, p_tile, 8), tbound, Fg, toc


def _backward_flat(Fg, toc, rays_t, pix_t, tbound, outs, g_tiled,
                   n_plus1, flat_ids, *, tile_h, tile_w, chunk, width,
                   with_median, with_dist):
    b, n_tiles = g_tiled.shape[:2]
    p_tile = tile_h * tile_w
    nc = Fg.shape[0]
    rays_f = rays_t.reshape(b * n_tiles, p_tile, 3)
    pix_f = pix_t.reshape(b * n_tiles, p_tile, 2)
    outs_f = outs.reshape(b * n_tiles, p_tile, 8)
    g_f = g_tiled.reshape(b * n_tiles, p_tile, 8)
    kernel = functools.partial(_bwd_kernel_flat, width=width,
                               with_median=with_median,
                               with_dist=with_dist, n_chunks=nc)
    rev = nc - 1
    dFg = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((1, 16, chunk),
                             lambda i, sc: (rev - i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 3),
                             lambda i, sc: (sc[rev - i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 2),
                             lambda i, sc: (sc[rev - i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, p_tile),
                             lambda i, sc: (rev - i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 8),
                             lambda i, sc: (sc[rev - i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 8),
                             lambda i, sc: (sc[rev - i], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 16, chunk),
                                   lambda i, sc: (rev - i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((p_tile, 3), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((nc, 16, chunk), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(toc, Fg, rays_f, pix_f, tbound, outs_f, g_f)
    gidx = _flat_view_ids(flat_ids[:, None, :], n_plus1)
    dF = _scatter_rows_flat(dFg, gidx, flat_ids.shape[0] * n_plus1)
    return dF.reshape(flat_ids.shape[0], n_plus1, 16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _raster_core_flat(F, flat_ids, tile_of_chunk, rays_t, pix_t, static):
    out, _, _, _ = _forward_flat(F, flat_ids, tile_of_chunk, rays_t,
                                 pix_t, **_flat_kw(static))
    return out


def _flat_kw(static):
    d = static._asdict()
    d.pop("scatter_tps", None)  # flat layout has its own scatter kernel
    d.pop("fused_scatter", None)
    return d


def _raster_core_flat_fwd(F, flat_ids, tile_of_chunk, rays_t, pix_t,
                          static):
    out, tbound, Fg, toc = _forward_flat(F, flat_ids, tile_of_chunk,
                                         rays_t, pix_t,
                                         **_flat_kw(static))
    return out, (F.shape[1], flat_ids, toc, rays_t, pix_t, tbound, out,
                 Fg)


def _raster_core_flat_bwd(static, res, g):
    import numpy as np
    n_plus1, flat_ids, toc, rays_t, pix_t, tbound, outs, Fg = res
    dF = _backward_flat(Fg, toc, rays_t, pix_t, tbound, outs, g,
                        n_plus1, flat_ids, **_flat_kw(static))
    f0 = jax.dtypes.float0
    return (dF, np.zeros(flat_ids.shape, f0),
            np.zeros((flat_ids.shape[0],
                      flat_ids.shape[1] // static.chunk), f0),
            jnp.zeros_like(rays_t), jnp.zeros_like(pix_t))


_raster_core_flat.defvjp(_raster_core_flat_fwd, _raster_core_flat_bwd)


# ---------------------------------------------------------------------------
# custom_vjp over the bucketed two-capacity layout (single view)
# ---------------------------------------------------------------------------


def _forward_bucketed(F, bt: BucketedTiles, static):
    """F [N+1, 16] -> (out [T, P, 8], residuals per bucket)."""
    kw = dict(chunk=static.chunk, width=static.width,
              with_median=static.with_median, with_dist=static.with_dist)
    Fg_b = _gather_features(F[None], bt.lists_b[None])
    Fg_s = _gather_features(F[None], bt.lists_s[None])
    out_b, tb_b = _fwd_call(Fg_b, bt.counts_b, bt.rays_b, bt.pix_b, **kw)
    out_s, tb_s = _fwd_call(Fg_s, bt.counts_s, bt.rays_s, bt.pix_s, **kw)
    n_tiles = bt.lists_b.shape[0] + bt.lists_s.shape[0]
    p_tile = bt.rays_b.shape[1]
    out = jnp.zeros((n_tiles, p_tile, 8), jnp.float32)
    out = out.at[bt.idx_b].set(out_b).at[bt.idx_s].set(out_s)
    return out, (Fg_b, tb_b, out_b, Fg_s, tb_s, out_s)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _raster_core_bucketed(F, bt: BucketedTiles, static):
    out, _ = _forward_bucketed(F, bt, static)
    return out


def _raster_core_bucketed_fwd(F, bt, static):
    out, res = _forward_bucketed(F, bt, static)
    return out, (F.shape[0], bt, res)


def _raster_core_bucketed_bwd(static, res, g):
    import numpy as np
    n_plus1, bt, (Fg_b, tb_b, out_b, Fg_s, tb_s, out_s) = res
    kw = dict(chunk=static.chunk, width=static.width,
              with_median=static.with_median, with_dist=static.with_dist)
    g_b = g[bt.idx_b]
    g_s = g[bt.idx_s]
    if bt.plan is not None:
        dFg_b = _bwd_call(Fg_b, bt.counts_b, bt.rays_b, bt.pix_b, tb_b,
                          out_b, g_b, **kw)
        dFg_s = _bwd_call(Fg_s, bt.counts_s, bt.rays_s, bt.pix_s, tb_s,
                          out_s, g_s, **kw)
        rows = jnp.concatenate([dFg_b.reshape(-1, 16),
                                dFg_s.reshape(-1, 16)])[None]
        plan1 = jax.tree_util.tree_map(lambda x: x[None], bt.plan)
        dF = _reduce_rows_with_ranksum(rows, plan1, n_plus1)[0]
    else:
        pool_b = _bwd_call_fused(Fg_b, bt.counts_b, bt.rays_b, bt.pix_b,
                                 tb_b, out_b, g_b,
                                 bt.lists_b.reshape(-1), n_plus1, **kw)
        pool_s = _bwd_call_fused(Fg_s, bt.counts_s, bt.rays_s, bt.pix_s,
                                 tb_s, out_s, g_s,
                                 bt.lists_s.reshape(-1), n_plus1, **kw)
        dF = pool_b + pool_s
    f0 = jax.dtypes.float0
    d_bt = jax.tree_util.tree_map(
        lambda x: (np.zeros(x.shape, f0)
                   if jnp.issubdtype(x.dtype, jnp.integer)
                   else jnp.zeros_like(x)), bt)
    return (dF, d_bt)


_raster_core_bucketed.defvjp(_raster_core_bucketed_fwd,
                             _raster_core_bucketed_bwd)


# ---------------------------------------------------------------------------
# custom_vjp over the packed-feature rasterizer core
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _raster_core(F, lists, counts, rays_t, pix_t, static, plan=None):
    out, _, _ = _forward_tiled(F, lists, counts, rays_t, pix_t,
                               **static._asdict())
    return out


def _raster_core_fwd(F, lists, counts, rays_t, pix_t, static, plan=None):
    out, tbound, Fg = _forward_tiled(F, lists, counts, rays_t, pix_t,
                                     **static._asdict())
    return out, (F, lists, counts, rays_t, pix_t, tbound, out, Fg, plan)


def _raster_core_bwd(static, res, g):
    import numpy as np
    F, lists, counts, rays_t, pix_t, tbound, outs, Fg, plan = res
    if "nobwd" in _ABLATE:      # perf bisection: cost of everything below
        dF = jnp.zeros_like(F) + jnp.sum(g) * 0.0
    else:
        dF = _backward_tiled(F, lists, counts, rays_t, pix_t, tbound,
                             outs, g, **static._asdict(), Fg=Fg,
                             plan=plan)
    # integer args take symbolic-zero (float0) cotangents
    f0 = jax.dtypes.float0
    d_plan = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, f0), plan)
    return (dF, np.zeros(lists.shape, f0), np.zeros(counts.shape, f0),
            jnp.zeros_like(rays_t), jnp.zeros_like(pix_t), d_plan)


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


class _StaticArgs(typing.NamedTuple):
    tile_h: int
    tile_w: int
    chunk: int
    width: int
    with_median: bool
    with_dist: bool
    scatter_tps: int = 1
    fused_scatter: bool = False


class TileAssignment(typing.NamedTuple):
    """Frozen binning state, reusable across optimization iterations.

    Surfel positions/scales drift slowly during mapping Adam iterations, so
    the mapper rebins only every ``compute.rebin_every`` steps (with a pixel
    margin on the binning radius to absorb the drift) and reuses this
    assignment in between — the per-iteration binning cost amortizes away.
    """
    lists: jax.Array   # [T, K] int32
    counts: jax.Array  # [T] int32
    rays_t: jax.Array  # [T, 3, P]
    pix_t: jax.Array   # [T, 2, P]
    # occurrence tables for the gather-sum gradient reduction (None ->
    # the RMW-kernel fallback; sharded tile-subset callers use that)
    plan: "ScatterPlan | None" = None


class FlatTiles(typing.NamedTuple):
    """Frozen binning state for layout="flat" (compacted slot pool)."""
    flat_ids: jax.Array       # [E] int32 (pad = N)
    tile_of_chunk: jax.Array  # [E/chunk] int32
    counts: jax.Array         # [T] int32 (per-tile real counts)
    rays_t: jax.Array         # [T, P, 3]
    pix_t: jax.Array          # [T, P, 2]


class BucketedTiles(typing.NamedTuple):
    """Frozen binning state for layout="bucketed": the q_big
    highest-count tiles keep the full slot capacity, the rest truncate
    to k_small (binning.build_bucketed_lists) — padded slot count drops
    to ~55% of T*K on the measured bimodal occupancy, and every
    slot-proportional cost (feature gather, kernel DMAs, gradient
    reduction) shrinks with it.  Single-view only (the mapper's hot
    path); rays/pix are pre-gathered per bucket at rebin time."""
    lists_b: jax.Array   # [Qb, Kb] int32
    counts_b: jax.Array  # [Qb]
    idx_b: jax.Array     # [Qb] tile indices (ascending)
    rays_b: jax.Array    # [Qb, P, 3]
    pix_b: jax.Array     # [Qb, P, 2]
    lists_s: jax.Array   # [Qs, Ks]
    counts_s: jax.Array  # [Qs]
    idx_s: jax.Array     # [Qs]
    rays_s: jax.Array    # [Qs, P, 3]
    pix_s: jax.Array     # [Qs, P, 2]
    plan: "RanksumPlan | None" = None   # over the concat slot space


def _flat_capacity_for(params) -> int:
    """Static flat-pool budget: explicit when set, else half the [T, K]
    slot count rounded to a chunk multiple (KITTI-scale scenes fill
    ~40-45% of T*K, so overflow truncation stays rare)."""
    n_tiles = (params.height // params.tile_h) * \
        (params.width // params.tile_w)
    if params.flat_capacity > 0:
        cap = params.flat_capacity
    else:
        cap = n_tiles * params.tile_list_capacity // 2
    return max(params.chunk, cap // params.chunk * params.chunk)


def prepare_tiles(xyz, scaling, rotation, opacity, T_cw, K, params,
                  margin_px: float = 0.0):
    """Binning only (non-differentiable): depth sort + tile lists + rays.

    Returns a TileAssignment (layout="tiled") or FlatTiles
    (layout="flat")."""
    height, width = params.height, params.width
    tile_h, tile_w = params.tile_h, params.tile_w
    packed = common.pack_surfels(xyz, scaling, rotation, opacity, T_cw, K)
    packed = jax.lax.stop_gradient(packed)
    if margin_px > 0:
        packed = packed._replace(
            radius_px=jnp.where(packed.radius_px > 0,
                                packed.radius_px + margin_px, 0.0),
            extent_px=jnp.where(packed.extent_px > 0,
                                packed.extent_px + margin_px, 0.0))
    rays_all, pix_all = binning.tile_rays(K, height, width, tile_h, tile_w)
    if params.layout == "bucketed":
        n_tiles = (height // tile_h) * (width // tile_w)
        q_big = min(n_tiles - 1, max(1, int(
            n_tiles * getattr(params, "bucket_frac", 0.5))))
        k_small = getattr(params, "bucket_k_small", 0) or params.chunk
        assert k_small % params.chunk == 0 or k_small == params.chunk, \
            (k_small, params.chunk)
        lb, cb, ib, ls, cs_, is_ = binning.build_bucketed_lists(
            packed, height, width, tile_h, tile_w,
            params.tile_list_capacity, k_small, q_big,
            params.cap_ty, params.cap_tx)
        plan = None
        scatter = getattr(params, "scatter", "rmw")
        if scatter == "ranksum":
            flat = jnp.concatenate([lb.reshape(-1), ls.reshape(-1)])
            plan = RanksumPlan(*binning.build_ranksum_plan(
                flat, xyz.shape[0], group=_RS_GROUP,
                gps=_RS_GPS, trunc_frac=_RS_TRUNC))
        return BucketedTiles(
            lists_b=lb, counts_b=cb, idx_b=ib,
            rays_b=rays_all[ib], pix_b=pix_all[ib],
            lists_s=ls, counts_s=cs_, idx_s=is_,
            rays_s=rays_all[is_], pix_s=pix_all[is_], plan=plan)
    if params.layout == "flat":
        flat_ids, toc, _, counts = binning.build_flat_lists(
            packed, height, width, tile_h, tile_w,
            params.tile_list_capacity, params.chunk,
            _flat_capacity_for(params), params.cap_ty, params.cap_tx)
        return FlatTiles(flat_ids=flat_ids, tile_of_chunk=toc,
                         counts=counts, rays_t=rays_all, pix_t=pix_all)
    if params.binner == "sorted":
        lists, counts, _ = binning.build_tile_lists_sorted(
            packed, height, width, tile_h, tile_w,
            params.tile_list_capacity, params.cap_ty, params.cap_tx)
    else:
        lists, counts, _ = binning.build_tile_lists(
            packed, height, width, tile_h, tile_w,
            params.tile_list_capacity)
    plan = None
    scatter = getattr(params, "scatter", "rmw")
    assert scatter in ("rmw", "plan", "ranksum", "fused"), \
        f"unknown scatter mode {scatter!r}"
    if scatter == "plan":
        ov_cap = max(_OV_CHUNK,
                     lists.size // 6 // _OV_CHUNK * _OV_CHUNK)
        plan = ScatterPlan(*binning.build_scatter_plan(
            lists, xyz.shape[0], m=4, ov_cap=ov_cap))
    elif scatter == "ranksum":
        plan = RanksumPlan(*binning.build_ranksum_plan(
            lists, xyz.shape[0], group=_RS_GROUP, gps=_RS_GPS,
            trunc_frac=_RS_TRUNC))
    return TileAssignment(lists=lists, counts=counts,
                          rays_t=rays_all, pix_t=pix_all, plan=plan)


def prepare_tiles_batched(xyz, scaling, rotation, opacity, T_cw, K,
                          params, margin_px: float = 0.0) -> TileAssignment:
    """Per-view tile assignments stacked on a leading [B] axis
    (surfel params shared, poses/intrinsics per view)."""
    return jax.vmap(
        lambda T, k: prepare_tiles(xyz, scaling, rotation, opacity, T, k,
                                   params, margin_px=margin_px))(T_cw, K)


def _check_params(params):
    height, width = params.height, params.width
    tile_h, tile_w = params.tile_h, params.tile_w
    assert height % tile_h == 0 and width % tile_w == 0, \
        f"image {height}x{width} not divisible by tile {tile_h}x{tile_w}"
    assert params.tile_list_capacity % params.chunk == 0, \
        "tile_list_capacity must be a chunk multiple"
    assert params.chunk <= _LANE_BLK or params.chunk % _LANE_BLK == 0, \
        f"chunk > {_LANE_BLK} must be a {_LANE_BLK}-multiple (the " \
        "blocked triangular scan decomposes on lane-tile boundaries)"
    scatter = getattr(params, "scatter", "rmw")
    assert scatter in ("rmw", "plan", "ranksum", "fused"), \
        f"unknown scatter mode {scatter!r} (a typo would otherwise " \
        "silently fall back to the RMW path in prepare_tiles)"


def rasterize_pallas_batched(xyz, scaling, rotation, opacity, T_cw, K,
                             params, tiles: TileAssignment | None = None):
    """Multi-view rasterization: T_cw [B,4,4] and K [B,3,3] over a
    SHARED surfel set.  All views flatten into one kernel grid; channel
    dict gains a leading [B] axis.  Gradients w.r.t. the shared params
    sum over views through the vmapped packing."""
    _check_params(params)
    height, width = params.height, params.width
    tile_h, tile_w = params.tile_h, params.tile_w

    assert params.layout != "bucketed", \
        "layout='bucketed' is single-view (use rasterize_pallas)"
    pack = jax.vmap(common.pack_surfels,
                    in_axes=(None, None, None, None, 0, 0))
    packed = pack(xyz, scaling, rotation, opacity, T_cw, K)
    if tiles is None:
        tiles = prepare_tiles_batched(xyz, scaling, rotation, opacity,
                                      T_cw, K, params)

    F = jax.vmap(binning.pack_features)(packed)     # [B, N+1, 16]
    static = _StaticArgs(tile_h=tile_h, tile_w=tile_w, chunk=params.chunk,
                         width=width, with_median=params.with_median,
                         with_dist=params.with_dist,
                         scatter_tps=getattr(params, "scatter_tps", 1),
                         fused_scatter=getattr(params, "scatter",
                                               "rmw") == "fused")
    if isinstance(tiles, FlatTiles):
        out = _raster_core_flat(F, tiles.flat_ids, tiles.tile_of_chunk,
                                tiles.rays_t, tiles.pix_t, static)
    else:
        out = _raster_core(F, tiles.lists, tiles.counts, tiles.rays_t,
                           tiles.pix_t, static, tiles.plan)

    chans = jax.vmap(
        lambda o: binning.untile_px(o, height, width, tile_h, tile_w))(out)
    return {
        "depth_sum": chans[:, 0],
        "alpha": chans[:, 1],
        "normal_sum": jnp.moveaxis(chans[:, 2:5], 1, -1),
        "median": chans[:, 5],
        "dist": chans[:, 6],
        "final_T": chans[:, 7],
        "radii": packed.radius_px,                  # [B, N]
    }


def rasterize_pallas(xyz, scaling, rotation, opacity, T_cw, K, params,
                     tiles: TileAssignment | None = None):
    """Channel dict matching jnp_ref.rasterize_jnp, via the Pallas path
    (single view: the B=1 case of the batched core)."""
    _check_params(params)
    height, width = params.height, params.width
    tile_h, tile_w = params.tile_h, params.tile_w

    packed = common.pack_surfels(xyz, scaling, rotation, opacity, T_cw, K)
    if tiles is None:
        tiles = prepare_tiles(xyz, scaling, rotation, opacity, T_cw, K,
                              params)

    F = binning.pack_features(packed)
    static = _StaticArgs(tile_h=tile_h, tile_w=tile_w, chunk=params.chunk,
                         width=width, with_median=params.with_median,
                         with_dist=params.with_dist,
                         scatter_tps=getattr(params, "scatter_tps", 1),
                         fused_scatter=getattr(params, "scatter",
                                               "rmw") == "fused")
    if isinstance(tiles, BucketedTiles):
        out = _raster_core_bucketed(F, tiles, static)
    elif isinstance(tiles, FlatTiles):
        out = _raster_core_flat(F[None], tiles.flat_ids[None],
                                tiles.tile_of_chunk[None],
                                tiles.rays_t[None], tiles.pix_t[None],
                                static)[0]
    else:
        plan = (None if tiles.plan is None else jax.tree_util.tree_map(
            lambda x: x[None], tiles.plan))
        out = _raster_core(F[None], tiles.lists[None], tiles.counts[None],
                           tiles.rays_t[None], tiles.pix_t[None], static,
                           plan)[0]

    chans = binning.untile_px(out, height, width, tile_h, tile_w)
    return {
        "depth_sum": chans[0],
        "alpha": chans[1],
        "normal_sum": jnp.moveaxis(chans[2:5], 0, -1),
        "median": chans[5],
        "dist": chans[6],
        "final_T": chans[7],
        "radii": packed.radius_px,
    }
