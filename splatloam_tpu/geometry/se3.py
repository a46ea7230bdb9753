"""SE(3) / quaternion primitives (pure jnp, batched, jit-friendly).

Covers the math of /root/reference/utils/general_utils.py:13-187
(quat->R, matrix->quat, normal->basis) plus the se(3) exp map needed by the
Gauss-Newton tracker (the reference hides that inside the CUDA gsaligner
submodule).  Quaternions are wxyz, matching the reference and the 2DGS PLY
attribute order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """[..., 4] wxyz quaternion (not necessarily unit) -> [..., 3, 3].

    Same normalization + formula as ref utils/general_utils.py:13-37.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z),
                      2 * (x * y - w * z),
                      2 * (x * z + w * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + w * z),
                      1 - 2 * (x * x + z * z),
                      2 * (y * z - w * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - w * y),
                      2 * (y * z + w * x),
                      1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def standardize_quat(q: jax.Array) -> jax.Array:
    """Flip sign so the real part is non-negative (ref :70-82)."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def rotmat_to_quat(matrix: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation -> [..., 4] wxyz unit quaternion.

    Branch-free variant of the numerically-robust 4-candidate construction
    (ref utils/general_utils.py:85-149): build the quaternion candidates
    q*r, q*i, q*j, q*k, then select the best-conditioned one.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs_sq = jnp.stack([
        1.0 + m00 + m11 + m22,
        1.0 + m00 - m11 - m22,
        1.0 - m00 + m11 - m22,
        1.0 - m00 - m11 + m22,
    ], axis=-1)
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    cand = jnp.stack([
        jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01],
                  axis=-1),
        jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20],
                  axis=-1),
        jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21],
                  axis=-1),
        jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2],
                  axis=-1),
    ], axis=-2)
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    cand = cand / denom

    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        cand, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
    return standardize_quat(out)


def basis_from_normal(n: jax.Array) -> jax.Array:
    """[..., 3] direction -> [..., 3, 3] rotation with n as LAST column.

    Columns (t_u, t_v, n) form a right-handed orthonormal basis; t_u/t_v span
    the surfel plane.  Mirrors ref utils/general_utils.py:152-187 (seed axis
    x, fallback y when near-collinear).
    """
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape)
    collinear = jnp.abs(jnp.abs(n[..., 0]) - 1.0) < 1e-3
    seed = jnp.where(collinear[..., None], ey, ex)
    t_u = jnp.cross(n, seed)
    t_u = t_u / jnp.maximum(jnp.linalg.norm(t_u, axis=-1, keepdims=True),
                            1e-12)
    t_v = jnp.cross(n, t_u)
    t_v = t_v / jnp.maximum(jnp.linalg.norm(t_v, axis=-1, keepdims=True),
                            1e-12)
    return jnp.stack([t_u, t_v, n], axis=-1)


def quat_from_normal(n: jax.Array) -> jax.Array:
    """[..., 3] surfel normal -> wxyz quaternion whose R has n as 3rd col."""
    return rotmat_to_quat(basis_from_normal(n))


# ---------------------------------------------------------------------------
# se(3) exponential map (tracker update:  T <- exp(dx) @ T)
# ---------------------------------------------------------------------------

def hat(w: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
    ], axis=-2)


def exp_se3(xi: jax.Array) -> jax.Array:
    """[..., 6] twist (v, w) -> [..., 4, 4] SE(3) matrix.

    Rodrigues with Taylor fallbacks near theta=0 so it is safe under jit.
    """
    v, w = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    theta2 = theta * theta
    small = theta < 1e-5
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(
        small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(small, 1.0,
                                                       theta2 * theta))
    R = eye + a * W + b * W2
    V = eye + b * W + c * W2
    t = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], xi.dtype),
                              top[..., :1, :].shape)
    return jnp.concatenate([top, bottom], axis=-2)


def invert_T(T: jax.Array) -> jax.Array:
    """Closed-form inverse of an SE(3) matrix [..., 4, 4]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype),
                              top[..., :1, :].shape)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """[4,4] @ [..., 3] -> [..., 3]."""
    return pts @ T[:3, :3].T + T[:3, 3]
