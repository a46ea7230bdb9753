"""Camera: one LiDAR measurement viewed as a spherical camera.

Device-side counterpart of ref scene/cameras.py:10-50, de-torchified: we
store the plain model->camera transform T_cw (the reference stores the
transposed world_view_transform) and the intrinsics K directly (the
reference embeds K^T inside a 4x4 projection_matrix).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    K: jax.Array        # [3, 3] spherical intrinsics
    T_cw: jax.Array     # [4, 4] model/world -> camera
    depth: jax.Array    # [H, W] measured range image
    normal: jax.Array   # [H, W, 3] measured normal image (sensor frame)
    valid: jax.Array    # [H, W] bool

    @property
    def height(self) -> int:
        return self.depth.shape[0]

    @property
    def width(self) -> int:
        return self.depth.shape[1]

    def with_pose(self, T_cw) -> "Camera":
        return self._replace(T_cw=jnp.asarray(T_cw, jnp.float32))


def make_camera(K, depth, normal, valid, T_wc=None) -> Camera:
    """T_wc is the camera(=frame) pose; stored inverted as T_cw."""
    if T_wc is None:
        T_cw = jnp.eye(4, dtype=jnp.float32)
    else:
        T_cw = jnp.asarray(np.linalg.inv(np.asarray(T_wc)), jnp.float32)
    return Camera(K=jnp.asarray(K, jnp.float32),
                  T_cw=T_cw,
                  depth=jnp.asarray(depth, jnp.float32),
                  normal=jnp.asarray(normal, jnp.float32),
                  valid=jnp.asarray(valid, bool))
