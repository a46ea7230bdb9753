"""Shared math for the spherical 2D-Gaussian-surfel rasterizer.

This module defines the *contract* both backends (pure-jnp golden renderer
and the Pallas TPU kernels) implement.  It replaces the CUDA
``diff_surfel_spherical_rasterization`` submodule, whose behaviour is fixed
by its call site (ref gaussian_renderer/__init__.py:16-92):

output channels (all pixel-wise, alpha-blended front-to-back with
w_i = alpha_i * prod_{j<i} (1 - alpha_j)):
  depth_sum  = sum_i w_i d_i          (ref allmap[0], expected-depth numerator)
  alpha      = sum_i w_i              (ref allmap[1])
  normal_sum = sum_i w_i n_i^cam      (ref allmap[2:5], camera frame)
  median     = d_i at the first i where transmittance crosses 0.5
                                      (ref allmap[5])
  dist       = sum_i w_i (m_i*A_{i-1} - D_{i-1}),  m = depth, A = running
               alpha, D = running depth_sum        (ref allmap[6], the 2DGS
               depth-distortion accumulator)

Surfel model (2DGS): each surfel is a plane patch at p with orthonormal
tangent axes t_u, t_v (first two columns of quat's rotation) scaled by
(s_u, s_v), normal n (third column).  A pixel ray d intersects the plane at
t* = (n.p)/(n.d); local coords (uu, vv) = ((x-p).t_u/s_u, (x-p).t_v/s_v)
with x = t* d; the Gaussian weight is exp(-0.5 (uu^2+vv^2)), combined with a
2-D screen-space low-pass filter (anti-aliasing for sub-pixel splats), and
alpha = min(0.999, opacity * weight), cut at 1/255.

The TPU-first trick: compositing is *not* a sequential loop here.  Within a
depth-sorted chunk the blend weights are  w = alpha * T_in * exp(cumsum_excl(
log1p(-alpha))),  turning the recurrence into a cumulative sum — one MXU
matmul + VPU elementwise + scan-free cumsum per chunk.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...geometry import se3

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
NEAR = 0.05
T_EPS = 1e-4
# 2DGS screen-space low-pass: rho_2d = FILTER_INV_SQUARE * pixel_dist^2
FILTER_INV_SQUARE = 2.0


class PackedSurfels(NamedTuple):
    """Camera-frame per-surfel features consumed by the compositors.

    All leading dims [N].  gu/gv are the tangent axes pre-divided by their
    scale, so local coords are plain dot products.
    """
    p: jax.Array        # [N, 3] center, camera frame
    gu: jax.Array       # [N, 3] t_u / s_u
    gv: jax.Array       # [N, 3] t_v / s_v
    n: jax.Array        # [N, 3] unit normal, camera frame, faces sensor
    opacity: jax.Array  # [N]
    depth: jax.Array    # [N] range of center (sort key)
    center_xy: jax.Array  # [N, 2] continuous pixel coords of center
    radius_px: jax.Array  # [N] conservative pixel radius (0 => culled)
    extent_px: jax.Array  # [N, 2] rigorous per-axis (x, y) pixel extents


def pack_surfels(xyz: jax.Array, scaling: jax.Array, rotation: jax.Array,
                 opacity: jax.Array, T_cw: jax.Array, K: jax.Array,
                 sigma_cut: float = 3.0) -> PackedSurfels:
    """World(model)-frame surfel params -> camera-frame packed features.

    Fully differentiable (the Pallas custom_vjp sits *after* this, so
    gradients w.r.t. pose and raw params flow through XLA autodiff here).
    """
    R_cw = T_cw[:3, :3]
    t_cw = T_cw[:3, 3]
    # geometry needs full fp32: cm accuracy at 60 m range is ~2e-4 relative,
    # below bf16 resolution, so pin these contractions to HIGHEST precision.
    p = jnp.matmul(xyz, R_cw.T, precision=jax.lax.Precision.HIGHEST) + t_cw
    R = se3.quat_to_rotmat(rotation)           # [N, 3, 3] world frame
    Rc = jnp.einsum("ij,njk->nik", R_cw, R,
                    precision=jax.lax.Precision.HIGHEST)  # camera frame
    s = jnp.maximum(scaling, 1e-8)
    gu = Rc[:, :, 0] / s[:, 0:1]
    gv = Rc[:, :, 1] / s[:, 1:2]
    n = Rc[:, :, 2]
    # flip normals to face the sensor (2DGS faces the viewer); treat the
    # flip as a constant for autodiff.
    flip = -jnp.sign(jax.lax.stop_gradient(jnp.sum(p * n, axis=-1)))
    flip = jnp.where(flip == 0, 1.0, flip)
    n = n * flip[:, None]

    depth = jnp.linalg.norm(p, axis=-1)
    theta = jnp.arctan2(p[:, 1], p[:, 0])
    phi = jnp.arctan2(p[:, 2], jnp.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2))
    cx = K[0, 0] * theta + K[0, 2]
    cy = K[1, 1] * phi + K[1, 2]
    center_xy = jnp.stack([cx, cy], axis=-1)

    # -- rigorous per-axis pixel extents (binning/visibility only) -------
    # Every pixel with alpha >= ALPHA_MIN satisfies rho <= rho_max =
    # 2 ln(opacity/ALPHA_MIN), via EITHER branch of min(rho2d, rho3d):
    #   * 3-D branch: the ray-plane intersection x lies in the splat-plane
    #     ellipse with semi-axes sqrt(rho_max)*(s_u t_u, s_v t_v) around p,
    #     and the pixel's (theta, phi) are exactly the spherical coords of
    #     x.  Azimuth: the ellipse's xy-projection fits a disc of radius
    #     m_xy (Frobenius >= spectral), so |dtheta| <= asin(m_xy/rho_xy)
    #     (full wrap when m_xy >= rho_xy — the z-axis is inside the disc).
    #     Elevation: phi = atan2(z, rho_cyl) is coordinate-monotone, so its
    #     range over the z/rho_cyl interval box is attained at the corners.
    #   * 2-D branch: rho2d = FILTER_INV_SQUARE * px_dist^2 <= rho_max
    #     bounds a pixel disc of radius sqrt(rho_max/FILTER_INV_SQUARE)
    #     around the center pixel.
    # Per-axis extent = max(angular extent in px, filter disc) + 1 px of
    # pixel-center slack.  The old isotropic bound divided by the 3-D
    # depth, UNDERCOVERING azimuth for low splats (rho_xy << depth) and
    # using a fixed 3-sigma cut that truncates above-cutoff pixels of
    # high-opacity splats; these bounds are exact-cutoff and per-axis.
    # Non-differentiable by construction (binning consumes them; the
    # reference's `radii` output is integer-valued, no grads flow).
    del sigma_cut  # superseded by the exact per-splat opacity cutoff
    pg = jax.lax.stop_gradient(p)
    su = jax.lax.stop_gradient(s[:, 0:1] * Rc[:, :, 0])   # s_u * t_u
    sv = jax.lax.stop_gradient(s[:, 1:2] * Rc[:, :, 1])
    op_g = jax.lax.stop_gradient(opacity)
    rho_max = 2.0 * jnp.log(jnp.maximum(op_g, ALPHA_MIN * (1 + 1e-6))
                            / ALPHA_MIN)
    sig = jnp.sqrt(rho_max)                                # [N]
    m_xy = sig * jnp.sqrt(su[:, 0] ** 2 + su[:, 1] ** 2
                          + sv[:, 0] ** 2 + sv[:, 1] ** 2)
    m_z = sig * jnp.sqrt(su[:, 2] ** 2 + sv[:, 2] ** 2)
    rho_cyl = jnp.sqrt(pg[:, 0] ** 2 + pg[:, 1] ** 2)
    ratio = m_xy / jnp.maximum(rho_cyl, 1e-12)
    dtheta = jnp.where(ratio >= 1.0, jnp.pi,
                       jnp.arcsin(jnp.minimum(ratio, 1.0)))
    phi_g = jax.lax.stop_gradient(phi)
    z_lo, z_hi = pg[:, 2] - m_z, pg[:, 2] + m_z
    r_lo = jnp.maximum(rho_cyl - m_xy, 0.0)
    r_hi = rho_cyl + m_xy
    dphi = jnp.maximum(
        jnp.maximum(jnp.abs(jnp.arctan2(z_hi, r_lo) - phi_g),
                    jnp.abs(jnp.arctan2(z_hi, r_hi) - phi_g)),
        jnp.maximum(jnp.abs(jnp.arctan2(z_lo, r_lo) - phi_g),
                    jnp.abs(jnp.arctan2(z_lo, r_hi) - phi_g)))
    d2d = jnp.sqrt(rho_max / FILTER_INV_SQUARE)            # px
    rx = jnp.maximum(jnp.abs(K[0, 0]) * dtheta, d2d) + 1.0
    ry = jnp.maximum(jnp.abs(K[1, 1]) * dphi, d2d) + 1.0
    visible = (op_g > ALPHA_MIN) & (jax.lax.stop_gradient(depth) > NEAR)
    extent_px = jnp.where(visible[:, None], jnp.stack([rx, ry], -1), 0.0)
    radius_px = jnp.max(extent_px, axis=-1)
    return PackedSurfels(p=p, gu=gu, gv=gv, n=n, opacity=opacity,
                         depth=depth, center_xy=center_xy,
                         radius_px=radius_px, extent_px=extent_px)


def splat_alpha_depth(packed_cols, rays, pix_xy, width: int):
    """Per-(surfel, pixel) alpha and depth for one chunk.

    Args:
      packed_cols: PackedSurfels with leading dim [C] (a depth-sorted chunk).
      rays: [P, 3] unit pixel rays.
      pix_xy: [P, 2] continuous pixel-center coordinates (u-0.5, v-0.5).
      width: image width (for azimuth wrap of the 2-D filter).

    Returns (alpha [C, P], depth [C, P]).
    """
    p, gu, gv, n = (packed_cols.p, packed_cols.gu, packed_cols.gv,
                    packed_cols.n)
    # ray dot products: the MXU part ([C,3] x [3,P]); fp32 accumulation
    hi = jax.lax.Precision.HIGHEST
    dgu = jnp.matmul(gu, rays.T, precision=hi)        # [C, P]
    dgv = jnp.matmul(gv, rays.T, precision=hi)
    dn = jnp.matmul(n, rays.T, precision=hi)
    np_ = jnp.sum(n * p, axis=-1)[:, None]       # [C, 1]
    pgu = jnp.sum(p * gu, axis=-1)[:, None]
    pgv = jnp.sum(p * gv, axis=-1)[:, None]

    denom = jnp.where(jnp.abs(dn) < 1e-8, 1e-8, dn)
    tstar = np_ / denom
    uu = tstar * dgu - pgu
    vv = tstar * dgv - pgv
    rho3d = uu * uu + vv * vv

    # 2-D low-pass (sub-pixel anti-aliasing), azimuth-wrapped
    dx = pix_xy[None, :, 0] - packed_cols.center_xy[:, 0:1]
    dx = dx - jnp.round(dx / width) * width
    dy = pix_xy[None, :, 1] - packed_cols.center_xy[:, 1:2]
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)

    use2d = rho2d < rho3d
    rho = jnp.where(use2d, rho2d, rho3d)
    depth = jnp.where(use2d, packed_cols.depth[:, None], tstar)

    weight = jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(packed_cols.opacity[:, None] * weight, ALPHA_MAX)
    ok = (tstar > NEAR) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(ok, alpha, 0.0)
    return alpha, depth


def pixel_grid(K: jax.Array, height: int, width: int):
    """Returns (rays [P,3], pix_xy [P,2]) flattened row-major."""
    from ...geometry import spherical
    rays = spherical.pixel_rays(K, height, width).reshape(-1, 3)
    u = jnp.arange(width, dtype=jnp.float32) - 0.5
    v = jnp.arange(height, dtype=jnp.float32) - 0.5
    uu = jnp.broadcast_to(u[None, :], (height, width)).reshape(-1)
    vv = jnp.broadcast_to(v[:, None], (height, width)).reshape(-1)
    return rays, jnp.stack([uu, vv], axis=-1)
