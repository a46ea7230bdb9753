"""Golden pure-jnp spherical surfel rasterizer (differentiable, chunked).

O(N * P) — no spatial culling — so it runs anywhere (CPU tests included) and
is the numerical oracle for the Pallas kernels.  Differentiable end-to-end
via XLA autodiff (including through the compositing cumsums), which also
gives SE(3) pose gradients for free through ``pack_surfels``.

Compositing is chunked over depth-sorted surfels with a lax.scan carrying
(transmittance, channel accumulators); inside a chunk the front-to-back
recurrence is closed-form via exclusive cumsum of log1p(-alpha) (see
common.py docstring).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import common


def _exclusive_cumsum(x, axis):
    cs = jnp.cumsum(x, axis=axis)
    return cs - x


@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def rasterize_jnp(xyz, scaling, rotation, opacity, T_cw, K,
                  height: int, width: int, chunk: int = 256):
    """Returns dict of channels (see common.py) + radii [N]."""
    n_surfels = xyz.shape[0]
    packed = common.pack_surfels(xyz, scaling, rotation, opacity, T_cw, K)
    rays, pix_xy = common.pixel_grid(K, height, width)
    n_pix = height * width

    # depth-sort: culled surfels (radius 0) sort to the back with alpha 0
    sort_depth = jnp.where(packed.radius_px > 0, packed.depth, jnp.inf)
    order = jnp.argsort(sort_depth)
    packed_sorted = jax.tree_util.tree_map(lambda a: a[order], packed)

    pad = (-n_surfels) % chunk
    if pad:
        packed_sorted = jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), packed_sorted)
    n_chunks = (n_surfels + pad) // chunk
    chunked = jax.tree_util.tree_map(
        lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]), packed_sorted)

    def step(carry, cols):
        (T, depth_sum, alpha_sum, normal_sum, dist_sum,
         med_val, med_found) = carry
        a, d = common.splat_alpha_depth(cols, rays, pix_xy, width)  # [C, P]
        log_t = jnp.log1p(-a)
        t_within = jnp.exp(_exclusive_cumsum(log_t, axis=0))  # [C, P]
        w = a * t_within * T[None, :]

        m = d
        # distortion: w_i * (m_i * A_prev - D_prev), prefixes incl. carry
        a_prev = alpha_sum[None, :] + _exclusive_cumsum(w, axis=0)
        d_prev = depth_sum[None, :] + _exclusive_cumsum(w * m, axis=0)
        dist_sum = dist_sum + jnp.sum(w * (m * a_prev - d_prev), axis=0)

        depth_sum = depth_sum + jnp.sum(w * m, axis=0)
        alpha_sum = alpha_sum + jnp.sum(w, axis=0)
        normal_sum = normal_sum + jnp.einsum("cp,ck->pk", w, cols.n)

        # median: first surfel where transmittance crosses 0.5
        t_before = T[None, :] * t_within
        t_after = t_before * (1.0 - a)
        crossing = (t_before > 0.5) & (t_after <= 0.5) & (a > 0)
        any_cross = jnp.any(crossing, axis=0)
        first = jnp.argmax(crossing, axis=0)
        d_at = jnp.take_along_axis(d, first[None, :], axis=0)[0]
        med_val = jnp.where(~med_found & any_cross, d_at, med_val)
        med_found = med_found | any_cross

        T = T * jnp.exp(jnp.sum(log_t, axis=0))
        return ((T, depth_sum, alpha_sum, normal_sum, dist_sum,
                 med_val, med_found), None)

    dtype = xyz.dtype
    init = (jnp.ones((n_pix,), dtype),
            jnp.zeros((n_pix,), dtype),
            jnp.zeros((n_pix,), dtype),
            jnp.zeros((n_pix, 3), dtype),
            jnp.zeros((n_pix,), dtype),
            jnp.zeros((n_pix,), dtype),
            jnp.zeros((n_pix,), bool))
    (T, depth_sum, alpha_sum, normal_sum, dist_sum, med_val, _), _ = \
        jax.lax.scan(step, init, chunked)

    shape = (height, width)
    return {
        "depth_sum": depth_sum.reshape(shape),
        "alpha": alpha_sum.reshape(shape),
        "normal_sum": normal_sum.reshape(shape + (3,)),
        "median": med_val.reshape(shape),
        "dist": dist_sum.reshape(shape),
        "radii": packed.radius_px,
        "final_T": T.reshape(shape),
    }
