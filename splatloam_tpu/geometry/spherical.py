"""Spherical (range-image) camera model — the projection at the heart of the
framework.

The model is fixed by the *inverse* mapping used throughout the reference
(/root/reference/utils/graphic_utils.py:39-59): a pixel with integer index
(u, v) has angles  [theta, phi] = K^-1 [u - 0.5, v - 0.5, 1]  and ray
direction  [cos(theta)cos(phi), sin(theta)cos(phi), sin(phi)];  a 3-D point p
has  theta = atan2(p_y, p_x),  phi = atan2(p_z, ||p_xy||),  range = ||p||,
and projects to continuous coordinate  x = fx*theta + cx,  y = fy*phi + cy
(pixel index = round(x)).  Everything here is pure jnp and jit/vmap friendly.

Replaces the C++ ``pyprojections`` package (intrinsics fitting + z-buffered
LUT projection, consumed at /root/reference/scene/preprocessing.py:42-53).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def angles_of_points(points: jax.Array):
    """[..., 3] -> (theta, phi, range)."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    rxy = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(y, x)
    phi = jnp.arctan2(z, rxy)
    rng = jnp.sqrt(x * x + y * y + z * z)
    return theta, phi, rng


def ray_of_angles(theta: jax.Array, phi: jax.Array) -> jax.Array:
    """(theta, phi) -> unit ray [..., 3] (ref graphic_utils.py:50-59)."""
    c0, c1 = jnp.cos(theta), jnp.cos(phi)
    s0, s1 = jnp.sin(theta), jnp.sin(phi)
    return jnp.stack([c0 * c1, s0 * c1, s1], axis=-1)


def spherical_intrinsics(cloud: jax.Array, height: int, width: int,
                         valid: jax.Array | None = None):
    """Fit K to the azimuth/elevation extents of one cloud.

    Equivalent role to pyp.calculate_spherical_intrinsics
    (ref scene/preprocessing.py:42-44).  Azimuth always spans the full circle
    (spinning LiDAR); elevation spans the cloud's [phi_min, phi_max] with row
    0 at the top (max elevation), matching range-image convention.

    Returns (K [3,3] f32, vfov, hfov).
    """
    theta, phi, rng = angles_of_points(cloud)
    if valid is None:
        valid = rng > 1e-6
    big = jnp.asarray(jnp.inf, phi.dtype)
    phi_min = jnp.min(jnp.where(valid, phi, big))
    phi_max = jnp.max(jnp.where(valid, phi, -big))
    vfov = jnp.maximum(phi_max - phi_min, 1e-6)
    hfov = jnp.asarray(TWO_PI, phi.dtype)

    # Pixel-center convention: pixel index u has continuous coordinate
    # x = u - 0.5 (see module docstring / ref graphic_utils.py:46-49), so the
    # azimuth circle maps onto x in [-1, W-1) and the elevation extremes land
    # exactly on the centers of rows 0 and H-1.
    fx = width / hfov
    cx = width / 2.0 - 1.0
    fy = -(height - 1) / vfov  # row 0 = top = phi_max
    cy = -0.5 - fy * phi_max
    K = jnp.array([[fx, 0.0, cx],
                   [0.0, 1.0, 0.0],
                   [0.0, 0.0, 1.0]], dtype=jnp.float32)
    K = K.at[1, 1].set(fy).at[1, 2].set(cy)
    return K, vfov, hfov


def pixel_index(coord: jax.Array) -> jax.Array:
    """Continuous coordinate -> integer pixel index.

    Pixel u's center is at coordinate u - 0.5, i.e. pixel u covers
    [u - 1, u), hence index = floor(coord + 1).
    """
    return jnp.floor(coord + 1.0).astype(jnp.int32)


def project_points(K: jax.Array, points: jax.Array):
    """[..., 3] points (sensor frame) -> continuous pixel coords + range.

    Returns (x, y, rng): x = fx*theta + cx (azimuth axis, wraps mod W),
    y = fy*phi + cy.  Integer pixel index = round(coord) (the reference's
    -0.5 pixel-center offset in depth_to_points is the inverse of this).
    """
    theta, phi, rng = angles_of_points(points)
    x = K[0, 0] * theta + K[0, 2]
    y = K[1, 1] * phi + K[1, 2]
    return x, y, rng


def pixel_angles(K: jax.Array, height: int, width: int):
    """Per-pixel-center (theta, phi), each [H, W]."""
    u = jnp.arange(width, dtype=jnp.float32)
    v = jnp.arange(height, dtype=jnp.float32)
    theta = (u - 0.5 - K[0, 2]) / K[0, 0]
    phi = (v - 0.5 - K[1, 2]) / K[1, 1]
    return (jnp.broadcast_to(theta[None, :], (height, width)),
            jnp.broadcast_to(phi[:, None], (height, width)))


def pixel_rays(K: jax.Array, height: int, width: int) -> jax.Array:
    """[H, W, 3] unit ray directions through every pixel center."""
    theta, phi = pixel_angles(K, height, width)
    return ray_of_angles(theta, phi)


def depth_to_points(depth: jax.Array, K: jax.Array,
                    T_wc: jax.Array | None = None) -> jax.Array:
    """Back-project an [H, W] range image to [H, W, 3] points.

    ``T_wc`` (camera->world, i.e. the frame pose) moves the points to world
    coordinates; None keeps them in the sensor frame.  Mirrors
    ref utils/graphic_utils.py:26-66 (channel-last here).
    """
    height, width = depth.shape[-2], depth.shape[-1]
    rays = pixel_rays(K, height, width)
    pts = depth[..., None] * rays
    if T_wc is not None:
        pts = pts @ T_wc[:3, :3].T + T_wc[:3, 3]
    return pts


def depth_to_normal(depth: jax.Array, K: jax.Array,
                    T_wc: jax.Array | None = None) -> jax.Array:
    """Normal map from central differences of back-projected points.

    Mirrors ref utils/graphic_utils.py:69-88: dx over rows, dy over columns,
    cross(dx, dy), normalized, zero on the 1-pixel border.
    """
    pts = depth_to_points(depth, K, T_wc)  # [H, W, 3]
    dx = pts[2:, 1:-1] - pts[:-2, 1:-1]
    dy = pts[1:-1, 2:] - pts[1:-1, :-2]
    # cross(dy, dx): with this module's fy < 0 (row 0 = max elevation) this
    # orients normals toward the sensor, consistent with the rasterizer's
    # viewer-facing normal flip (the mapper's normal loss needs both signs
    # to agree, ref slam/mapper.py:177-179).
    n = jnp.cross(dy, dx)
    # double-where safe normalize: a plain x/max(||x||, eps) has a NaN
    # jacobian at exactly-degenerate pixels (empty regions where dx=dy=0),
    # which poisons gradients even under zero cotangents
    norm2 = jnp.sum(n * n, axis=-1, keepdims=True)
    degenerate = norm2 <= 1e-24
    n_safe = jnp.where(degenerate, jnp.array([0.0, 0.0, 1.0], n.dtype), n)
    n_safe = n_safe / jnp.sqrt(
        jnp.sum(n_safe * n_safe, axis=-1, keepdims=True))
    n = jnp.where(degenerate, 0.0, n_safe)
    out = jnp.zeros_like(pts)
    return out.at[1:-1, 1:-1].set(n)


def depth_gradient(depth: jax.Array, valid: jax.Array) -> jax.Array:
    """Log-depth gradient magnitude with validity masking, [H, W].

    Mirrors ref utils/graphic_utils.py:91-106 (used as the densification
    sampling weight at slam/mapper.py:86-95).
    """
    log_d = jnp.where(depth > 0, jnp.log(jnp.maximum(depth, 1e-12)), 0.0)
    valid = valid.astype(bool)
    dx = log_d[2:, 1:-1] - log_d[:-2, 1:-1]
    dx = dx * (valid[2:, 1:-1] & valid[:-2, 1:-1])
    dy = log_d[1:-1, 2:] - log_d[1:-1, :-2]
    dy = dy * (valid[1:-1, 2:] & valid[1:-1, :-2])
    grad = jnp.sqrt(dx * dx + dy * dy)
    out = jnp.zeros_like(depth)
    return out.at[1:-1, 1:-1].set(grad)
