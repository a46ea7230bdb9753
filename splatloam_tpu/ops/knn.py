"""Approximate 3-nearest-neighbor mean squared distance, TPU-native.

Replaces the CUDA ``simple_knn._C.distCUDA2`` kernel (call sites:
ref slam/mapper.py:113-116 and ref scene/gaussian_model.py:77-81, used to
initialize surfel scales at densification).  Same algorithmic idea as the
upstream kernel — Morton-order spatial sort + windowed candidate search —
expressed as XLA sort/roll/top_k instead of CUDA warps.  An exact
all-pairs path handles small inputs and serves as the test oracle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BITS = 10  # 10 bits/axis -> 30-bit Morton codes, fits int32


def _spread_bits(x: jax.Array) -> jax.Array:
    """Insert two zero bits between each of the low 10 bits of x (int32)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_codes(xyz: jax.Array, mask: jax.Array) -> jax.Array:
    """[N, 3] -> [N] int32 Morton codes; masked-out points sort last."""
    big = jnp.float32(jnp.inf)
    lo = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], xyz, -big), axis=0)
    scale = (2.0 ** _BITS - 1.0) / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((xyz - lo) * scale, 0.0, 2.0 ** _BITS - 1.0)
    q = q.astype(jnp.int32)
    code = (_spread_bits(q[:, 0])
            | (_spread_bits(q[:, 1]) << 1)
            | (_spread_bits(q[:, 2]) << 2))
    return jnp.where(mask, code, jnp.iinfo(jnp.int32).max)


@partial(jax.jit, static_argnames=("window", "k"))
def mean_sq_dist_knn(xyz: jax.Array, mask: jax.Array | None = None,
                     window: int = 16, k: int = 3) -> jax.Array:
    """Mean squared distance to the k nearest neighbors, per point.

    Approximate: candidates are the +-window neighbors in Morton order
    (the upstream CUDA kernel uses the same windowed heuristic).  Returns
    [N] f32; masked-out/padding points get 0.
    """
    n = xyz.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    order = jnp.argsort(morton_codes(xyz, mask))
    pts = xyz[order]
    msk = mask[order]

    inf = jnp.float32(jnp.inf)
    cand = []
    for off in range(-window, window + 1):
        if off == 0:
            continue
        rolled = jnp.roll(pts, -off, axis=0)
        rolled_ok = jnp.roll(msk, -off, axis=0)
        idx = jnp.arange(n) + off
        in_range = (idx >= 0) & (idx < n)
        d2 = jnp.sum((pts - rolled) ** 2, axis=-1)
        cand.append(jnp.where(in_range & rolled_ok & msk, d2, inf))
    d2_all = jnp.stack(cand, axis=-1)  # [N, 2*window]
    neg_top, _ = jax.lax.top_k(-d2_all, k)
    valid_nb = jnp.isfinite(-neg_top)
    mean_d2 = jnp.sum(jnp.where(valid_nb, -neg_top, 0.0), axis=-1) / \
        jnp.maximum(jnp.sum(valid_nb, axis=-1), 1)
    out = jnp.zeros((n,), jnp.float32).at[order].set(
        jnp.where(msk, mean_d2, 0.0))
    return out


@partial(jax.jit, static_argnames=("k",))
def mean_sq_dist_knn_exact(xyz: jax.Array, mask: jax.Array | None = None,
                           k: int = 3) -> jax.Array:
    """Exact O(N^2) oracle (use for N up to a few thousand)."""
    n = xyz.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    diff = xyz[:, None, :] - xyz[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    inf = jnp.float32(jnp.inf)
    d2 = jnp.where(jnp.eye(n, dtype=bool), inf, d2)
    d2 = jnp.where(mask[None, :], d2, inf)
    neg_top, _ = jax.lax.top_k(-d2, k)
    valid_nb = jnp.isfinite(-neg_top)
    mean_d2 = jnp.sum(jnp.where(valid_nb, -neg_top, 0.0), axis=-1) / \
        jnp.maximum(jnp.sum(valid_nb, axis=-1), 1)
    return jnp.where(mask, mean_d2, 0.0)
