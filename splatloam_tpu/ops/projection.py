"""Z-buffered spherical projection: point cloud -> range/LUT images.

TPU-native replacement for the C++ ``pyprojections`` LUT projector
(ref scene/preprocessing.py:45-58): instead of a serial z-buffer we use two
vectorized scatter-min passes (XLA lowers them to efficient sorted scatters),
which keeps the whole preprocessing step jittable on device.

Pass 1 scatter-mins ranges per pixel; pass 2 scatter-mins the point index of
range-tie winners, making the LUT deterministic (smallest index wins ties).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import spherical

INT32_MAX = jnp.iinfo(jnp.int32).max


@partial(jax.jit, static_argnames=("height", "width"))
def build_range_image(points: jax.Array,
                      point_mask: jax.Array,
                      K: jax.Array,
                      height: int,
                      width: int,
                      depth_min: float,
                      depth_max: float):
    """Project [N, 3] points into an (H, W) spherical z-buffer.

    Args:
      points: [N, 3] sensor-frame points (may contain padding rows).
      point_mask: [N] bool, False for padding rows.
      K: [3, 3] spherical intrinsics (see geometry.spherical).
      depth_min/depth_max: valid range gate (ranges <= depth_min or
        > depth_max are dropped, mirroring ref preprocessing valid_mask).

    Returns:
      depth: [H, W] f32 range image (0 where empty).
      lut:   [H, W] i32 index of the winning point per pixel (-1 if empty).
      valid: [H, W] bool.
    """
    x, y, rng = spherical.project_points(K, points)
    u = jnp.mod(spherical.pixel_index(x), width)
    v = spherical.pixel_index(y)

    ok = (point_mask
          & (rng > depth_min) & (rng <= depth_max)
          & (v >= 0) & (v < height))
    v = jnp.clip(v, 0, height - 1)
    flat = v * width + u

    inf = jnp.float32(jnp.inf)
    r_scatter = jnp.where(ok, rng.astype(jnp.float32), inf)
    zmin = jnp.full((height * width,), inf, jnp.float32)
    zmin = zmin.at[flat].min(r_scatter, mode="drop")

    # Second pass: among points matching the per-pixel min range, keep the
    # smallest point index -> deterministic LUT without 64-bit packing.
    winner = ok & (r_scatter <= zmin[flat])
    idx = jnp.arange(points.shape[0], dtype=jnp.int32)
    idx_scatter = jnp.where(winner, idx, INT32_MAX)
    lut = jnp.full((height * width,), INT32_MAX, jnp.int32)
    lut = lut.at[flat].min(idx_scatter, mode="drop")

    valid = jnp.isfinite(zmin) & (lut != INT32_MAX)
    depth = jnp.where(valid, zmin, 0.0).reshape(height, width)
    lut = jnp.where(valid, lut, -1).reshape(height, width)
    return depth, lut.astype(jnp.int32), valid.reshape(height, width)
