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


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


def _scan_prod(x, exclusive: bool):
    """Prefix PRODUCT along the surfel (lane) axis 1 via log-shift
    multiplies (avoids the log1p/exp transcendentals of log-space
    compositing; products of <=chunk factors in [0,1] are fp32-safe)."""
    c = x.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < c:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(lanes >= shift, rolled, 1.0)
        shift *= 2
    if exclusive:
        rolled = pltpu.roll(x, 1, axis=1)
        x = jnp.where(lanes >= 1, rolled, 1.0)
    return x


def _scan_rows(x, exclusive: bool):
    """Prefix sum along the surfel (lane) axis 1 via log-shift adds."""
    c = x.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < c:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(lanes >= shift, rolled, 0.0)
        shift *= 2
    if exclusive:
        rolled = pltpu.roll(x, 1, axis=1)
        x = jnp.where(lanes >= 1, rolled, 0.0)
    return x


def _splat_geometry(F, rays, pix, width):
    """Shared fwd/bwd geometry: returns a dict of [P, C] / [1, C] arrays.

    F [16, C] feature-major; rays [P, 3]; pix [P, 2].  Pixels live on
    sublanes, surfels on lanes (so the chunk axis is the 128-lane axis and
    the HBM chunk DMA slices stay lane-aligned).
    """
    hi = jax.lax.Precision.HIGHEST
    p3, gu3, gv3, n3 = F[0:3], F[3:6], F[6:9], F[9:12]      # [3, C]
    opa = F[12:13]
    depth_c = F[13:14]
    cx = F[14:15]
    cy = F[15:16]

    def dotr(a):  # rays [P, 3] x a [3, C] -> [P, C]
        return jax.lax.dot_general(rays, a, (((1,), (0,)), ((), ())),
                                   precision=hi,
                                   preferred_element_type=jnp.float32)

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


def _fwd_kernel(counts_ref, Fg_hbm, rays_ref, pix_ref,
                out_ref, tbound_ref, fg_buf, dma_sem,
                *, chunk, width, n_chunks, with_median, with_dist):
    """1-D tile grid; dynamic in-kernel loop over this tile's chunks.

    Fg stays in HBM and chunk slices are DMA'd on demand, so the cost per
    tile is O(count/chunk) rather than O(K/chunk) grid steps, and the
    transmittance early-exit truly stops the loop (sparse submaps and
    saturated tiles pay only for work that exists).
    """
    t = pl.program_id(0)
    count = counts_ref[t]
    n_act = pl.cdiv(count, chunk)
    rays = rays_ref[0]                      # [P, 3]
    pix = pix_ref[0]                        # [P, 2]
    p_tile = rays.shape[0]

    def fetch(i, slot):
        start = pl.multiple_of(i * chunk, chunk)
        return pltpu.make_async_copy(
            Fg_hbm.at[t, :, pl.ds(start, chunk)],
            fg_buf.at[slot], dma_sem.at[slot])

    @pl.when(n_act > 0)
    def _():
        fetch(0, 0).start()

    def cond(state):
        i = state[0]
        return (i < n_act) & (jnp.max(state[1]) > T_EPS)

    def body(state):
        (i, T_carry, d_sum, a_sum, n_sum, med, dist) = state
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_act)
        def _():
            fetch(i + 1, 1 - slot).start()

        fetch(i, slot).wait()
        F = fg_buf[slot]
        # dynamic-index stores must be lane/sublane aligned; n_chunks is
        # small, so select the row with a static predicated chain instead
        for j in range(n_chunks):
            @pl.when(i == j)
            def _(j=j):
                tbound_ref[0, j, :] = T_carry

        geo = _splat_geometry(F, rays, pix, width)
        alpha, m = geo["alpha"], geo["m"]       # [P, C]
        one_m = 1.0 - alpha
        t_incl = _scan_prod(one_m, exclusive=False)
        lanes = jax.lax.broadcasted_iota(jnp.int32, t_incl.shape, 1)
        texc = jnp.where(lanes >= 1, pltpu.roll(t_incl, 1, axis=1), 1.0)
        Ti = T_carry[:, None] * texc            # [P, C]
        w = alpha * Ti
        wm = w * m
        hi = jax.lax.Precision.HIGHEST

        if with_dist:
            a_prev = a_sum[:, None] + _scan_rows(w, exclusive=True)
            d_prev = d_sum[:, None] + _scan_rows(wm, exclusive=True)
            dist = dist + jnp.sum(w * (m * a_prev - d_prev), axis=1)

        if with_median:
            t_after = Ti * (1.0 - alpha)
            crossing = ((Ti > 0.5) & (t_after <= 0.5) &
                        (alpha > 0)).astype(jnp.float32)
            first = crossing * (_scan_rows(crossing,
                                           exclusive=False) == 1.0)
            d_first = jnp.sum(first * m, axis=1)
            any_c = jnp.sum(first, axis=1) > 0
            med = jnp.where((med == 0.0) & any_c, d_first, med)

        d_sum = d_sum + jnp.sum(wm, axis=1)
        a_sum = a_sum + jnp.sum(w, axis=1)
        # n_sum [P, 3]: sum_c w[p, c] * n3[k, c]
        n_sum = n_sum + jax.lax.dot_general(
            w, geo["n3"], (((1,), (1,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)
        # t_incl is non-increasing along lanes, so its min IS the full
        # chunk product (single-lane slices don't lower on TPU)
        T_carry = T_carry * jnp.min(t_incl, axis=1)
        return (i + 1, T_carry, d_sum, a_sum, n_sum, med, dist)

    zeros = jnp.zeros((p_tile,), jnp.float32)
    init = (jnp.int32(0), jnp.ones((p_tile,), jnp.float32), zeros, zeros,
            jnp.zeros((p_tile, 3), jnp.float32), zeros, zeros)
    (i_end, T_carry, d_sum, a_sum, n_sum, med, dist) = \
        jax.lax.while_loop(cond, body, init)

    # early exit may leave the prefetch for chunk i_end in flight
    @pl.when((n_act > 0) & (i_end < n_act))
    def _():
        fetch(i_end, jax.lax.rem(i_end, 2)).wait()

    out_ref[0, :, 0] = d_sum
    out_ref[0, :, 1] = a_sum
    out_ref[0, :, 2:5] = n_sum
    out_ref[0, :, 5] = med
    out_ref[0, :, 6] = dist
    out_ref[0, :, 7] = T_carry


def _bwd_kernel(counts_ref, Fg_hbm, rays_ref, pix_ref, tbound_ref,
                outs_ref, g_ref, dF_ref, fg_buf, dma_sem,
                *, chunk, width, n_chunks, with_median, with_dist):
    """Reverse dynamic chunk loop per tile with O(P) suffix carries."""
    t = pl.program_id(0)
    count = counts_ref[t]
    n_act = pl.cdiv(count, chunk)
    rays = rays_ref[0]                      # [P, 3]
    pix = pix_ref[0]                        # [P, 2]
    p_tile = rays.shape[0]
    hi = jax.lax.Precision.HIGHEST
    dF_ref[...] = jnp.zeros_like(dF_ref)

    gD = g_ref[0, :, 0:1]                   # [P, 1]
    gA = g_ref[0, :, 1:2]
    gN = g_ref[0, :, 2:5]                   # [P, 3]
    gdist = g_ref[0, :, 6:7]
    A_total = outs_ref[0, :, 1:2]
    D_total = outs_ref[0, :, 0:1]

    def fetch(i, slot):
        start = pl.multiple_of(i * chunk, chunk)
        return pltpu.make_async_copy(
            Fg_hbm.at[t, :, pl.ds(start, chunk)],
            fg_buf.at[slot], dma_sem.at[slot])

    # transmittance is monotone over chunks, so the chunks the forward
    # skipped (T_start <= eps) form a SUFFIX in forward order: reverse
    # processing can start at the last live chunk and drop the per-chunk
    # liveness branch entirely (enabling DMA double buffering)
    n_live = jnp.int32(0)
    for j in range(n_chunks):
        is_live = (j < n_act) & (jnp.max(tbound_ref[0, j, :]) > T_EPS)
        n_live = n_live + is_live.astype(jnp.int32)

    @pl.when(n_live > 0)
    def _():
        fetch(n_live - 1, jax.lax.rem(n_live - 1, 2)).start()

    def body(ci, carry):
        S_phi_carry, W_carry, MD_carry = carry
        i = n_live - 1 - ci
        T_start = jnp.zeros((p_tile,), jnp.float32)
        for j in range(n_chunks):
            T_start = jnp.where(i == j, tbound_ref[0, j, :], T_start)

        slot = jax.lax.rem(i, 2)

        @pl.when(i - 1 >= 0)
        def _():
            fetch(i - 1, 1 - slot).start()

        fetch(i, slot).wait()
        F = fg_buf[slot]
        geo = _splat_geometry(F, rays, pix, width)
        alpha, m = geo["alpha"], geo["m"]       # [P, C]
        Ti = T_start[:, None] * _scan_prod(1.0 - alpha, exclusive=True)
        w = alpha * Ti
        wm = w * m

        def rsuf(x):
            tot = jnp.sum(x, axis=1, keepdims=True)
            return tot - _scan_rows(x, exclusive=False)

        # nphi [P, C]: sum_k gN[p, k] * n3[k, c]
        nphi = jax.lax.dot_general(
            gN, geo["n3"], (((1,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)
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
            return jax.lax.dot_general(
                rays, x, (((0,), (0,)), ((), ())), precision=hi,
                preferred_element_type=jnp.float32)

        s_g_np = sum_px(g_np)
        s_g_u = sum_px(g_u)
        s_g_v = sum_px(g_v)
        d_gu = dot_rays(g_A1) - s_g_u * geo["p3"]
        d_gv = dot_rays(g_A2) - s_g_v * geo["p3"]
        # direct normal payload: sum_p gN[p,k] w[p,c] -> [3, C]
        d_n = (dot_rays(g_A3) + s_g_np * geo["p3"]
               + jax.lax.dot_general(
                   gN, w, (((0,), (0,)), ((), ())), precision=hi,
                   preferred_element_type=jnp.float32))
        d_p = (s_g_np * geo["n3"] - s_g_u * geo["gu3"]
               - s_g_v * geo["gv3"])
        dF = jnp.concatenate(
            [d_p, d_gu, d_gv, d_n, sum_px(g_opa_px),
             sum_px(jnp.where(use2, gm, 0.0)),
             sum_px(-g_dx), sum_px(-g_dy)], axis=0)   # [16, C]
        dF_ref[0, :, pl.ds(pl.multiple_of(i * chunk, chunk),
                           chunk)] = dF

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


def _forward_tiled(F, lists, counts, rays_t, pix_t, *, tile_h, tile_w,
                   chunk, width, with_median, with_dist):
    n_tiles, K = lists.shape
    p_tile = tile_h * tile_w
    n_chunks = K // chunk
    Fg = jnp.swapaxes(F[lists], 1, 2)           # [T, 16, K] feature-major
    kernel = functools.partial(_fwd_kernel, chunk=chunk, width=width,
                               n_chunks=n_chunks, with_median=with_median,
                               with_dist=with_dist)
    out, tbound = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, p_tile, 3), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 2), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, p_tile, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_chunks, p_tile), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 16, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, p_tile, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, n_chunks, p_tile),
                                 jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(counts, Fg, rays_t, pix_t)
    return out, tbound


def _backward_tiled(F, lists, counts, rays_t, pix_t, tbound, outs, g_tiled,
                    *, tile_h, tile_w, chunk, width, with_median,
                    with_dist):
    n_tiles, K = lists.shape
    p_tile = tile_h * tile_w
    n_chunks = K // chunk
    Fg = jnp.swapaxes(F[lists], 1, 2)           # [T, 16, K]
    kernel = functools.partial(_bwd_kernel, chunk=chunk, width=width,
                               n_chunks=n_chunks, with_median=with_median,
                               with_dist=with_dist)
    dFg = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, p_tile, 3), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 2), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_chunks, p_tile), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_tile, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 16, K), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 16, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 16, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(counts, Fg, rays_t, pix_t, tbound, outs, g_tiled)
    # scatter per-tile-entry grads back to surfels (atomics-free)
    n_plus1 = F.shape[0]
    dF = jnp.zeros((n_plus1, 16), jnp.float32)
    dFg_rows = jnp.swapaxes(dFg, 1, 2).reshape(-1, 16)
    dF = dF.at[lists.reshape(-1)].add(dFg_rows)
    return dF


# ---------------------------------------------------------------------------
# custom_vjp over the packed-feature rasterizer core
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _raster_core(F, lists, counts, rays_t, pix_t, static):
    out, _ = _forward_tiled(F, lists, counts, rays_t, pix_t, **static._asdict())
    return out


def _raster_core_fwd(F, lists, counts, rays_t, pix_t, static):
    out, tbound = _forward_tiled(F, lists, counts, rays_t, pix_t,
                                 **static._asdict())
    return out, (F, lists, counts, rays_t, pix_t, tbound, out)


def _raster_core_bwd(static, res, g):
    import numpy as np
    F, lists, counts, rays_t, pix_t, tbound, outs = res
    dF = _backward_tiled(F, lists, counts, rays_t, pix_t, tbound, outs, g,
                         **static._asdict())
    # integer args take symbolic-zero (float0) cotangents
    f0 = jax.dtypes.float0
    return (dF, np.zeros(lists.shape, f0), np.zeros(counts.shape, f0),
            jnp.zeros_like(rays_t), jnp.zeros_like(pix_t))


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


class _StaticArgs(typing.NamedTuple):
    tile_h: int
    tile_w: int
    chunk: int
    width: int
    with_median: bool
    with_dist: bool


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


def prepare_tiles(xyz, scaling, rotation, opacity, T_cw, K, params,
                  margin_px: float = 0.0) -> TileAssignment:
    """Binning only (non-differentiable): depth sort + tile lists + rays."""
    height, width = params.height, params.width
    tile_h, tile_w = params.tile_h, params.tile_w
    packed = common.pack_surfels(xyz, scaling, rotation, opacity, T_cw, K)
    packed = jax.lax.stop_gradient(packed)
    if margin_px > 0:
        packed = packed._replace(radius_px=jnp.where(
            packed.radius_px > 0, packed.radius_px + margin_px, 0.0))
    if params.binner == "sorted":
        lists, counts, _ = binning.build_tile_lists_sorted(
            packed, height, width, tile_h, tile_w,
            params.tile_list_capacity, params.cap_ty, params.cap_tx)
    else:
        lists, counts, _ = binning.build_tile_lists(
            packed, height, width, tile_h, tile_w,
            params.tile_list_capacity)
    rays_all, pix_all = binning.tile_rays(K, height, width, tile_h, tile_w)
    return TileAssignment(lists=lists, counts=counts,
                          rays_t=rays_all, pix_t=pix_all)


def rasterize_pallas(xyz, scaling, rotation, opacity, T_cw, K, params,
                     tiles: TileAssignment | None = None):
    """Channel dict matching jnp_ref.rasterize_jnp, via the Pallas path."""
    height, width = params.height, params.width
    tile_h, tile_w = params.tile_h, params.tile_w
    assert height % tile_h == 0 and width % tile_w == 0, \
        f"image {height}x{width} not divisible by tile {tile_h}x{tile_w}"
    cap = params.tile_list_capacity
    chunk = params.chunk
    assert cap % chunk == 0, "tile_list_capacity must be a chunk multiple"

    packed = common.pack_surfels(xyz, scaling, rotation, opacity, T_cw, K)
    if tiles is None:
        tiles = prepare_tiles(xyz, scaling, rotation, opacity, T_cw, K,
                              params)
    lists, counts, rays_t, pix_t = tiles

    F = binning.pack_features(packed)
    static = _StaticArgs(tile_h=tile_h, tile_w=tile_w, chunk=chunk,
                         width=width, with_median=params.with_median,
                         with_dist=params.with_dist)
    out = _raster_core(F, lists, counts, rays_t, pix_t, static)

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
