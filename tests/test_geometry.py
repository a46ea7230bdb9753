import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatloam_tpu.geometry import se3, spherical


def test_quat_rotmat_roundtrip(rng):
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = se3.quat_to_rotmat(jnp.asarray(q))
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (64, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    q2 = se3.rotmat_to_quat(R)
    # same rotation up to sign (standardized form: w >= 0)
    qs = np.where(q[:, :1] < 0, -q, q)
    np.testing.assert_allclose(np.asarray(q2), qs, atol=1e-5)


def test_basis_from_normal(rng):
    n = rng.normal(size=(128, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    R = np.asarray(se3.basis_from_normal(jnp.asarray(n)))
    np.testing.assert_allclose(R[:, :, 2], n, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    # includes the collinear-with-x special case
    Rx = np.asarray(se3.basis_from_normal(jnp.array([[1.0, 0, 0]])))
    np.testing.assert_allclose(Rx[0] @ Rx[0].T, np.eye(3), atol=1e-6)


def test_exp_se3_small_and_finite():
    xi = jnp.array([[0.1, -0.2, 0.3, 0.01, 0.02, -0.03],
                    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                    [1.0, 2.0, 3.0, 0.5, -0.4, 0.3]])
    T = np.asarray(se3.exp_se3(xi))
    assert np.all(np.isfinite(T))
    np.testing.assert_allclose(T[1], np.eye(4), atol=1e-7)
    # R orthonormal
    for t in T:
        np.testing.assert_allclose(t[:3, :3] @ t[:3, :3].T, np.eye(3),
                                   atol=1e-5)
        np.testing.assert_allclose(t[3], [0, 0, 0, 1], atol=0)
    # inverse consistency
    Ti = np.asarray(se3.invert_T(jnp.asarray(T)))
    for t, ti in zip(T, Ti):
        np.testing.assert_allclose(t @ ti, np.eye(4), atol=1e-5)


def test_exp_se3_matches_expm():
    from scipy.linalg import expm
    xi = np.array([0.3, -0.1, 0.2, 0.4, 0.2, -0.5], np.float32)
    M = np.zeros((4, 4))
    M[:3, :3] = np.asarray(se3.hat(jnp.asarray(xi[3:])))
    M[:3, 3] = xi[:3]
    np.testing.assert_allclose(np.asarray(se3.exp_se3(jnp.asarray(xi))),
                               expm(M), atol=1e-5)


def test_spherical_project_backproject_roundtrip(rng):
    # random cloud -> intrinsics -> project to pixels -> pixel rays recover
    # direction of the points that won their pixel
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    pts *= rng.uniform(2.0, 50.0, size=(2000, 1)).astype(np.float32)
    H, W = 32, 256
    K, vfov, hfov = spherical.spherical_intrinsics(jnp.asarray(pts), H, W)
    x, y, r = spherical.project_points(K, jnp.asarray(pts))
    u = np.mod(np.asarray(spherical.pixel_index(x)), W)
    v = np.asarray(spherical.pixel_index(y))
    assert np.all(v >= 0) and np.all(v < H)

    rays = np.asarray(spherical.pixel_rays(K, H, W))
    dirs = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    # pixel-center ray within half-pixel angular resolution of the point dir
    dots = np.sum(rays[v, u] * dirs, axis=-1)
    ang_res = max(2 * np.pi / W, float(vfov) / H)
    assert np.all(dots > np.cos(ang_res))


def test_pixel_center_convention():
    # angle of pixel u's center, re-projected, must land in pixel u
    H, W = 16, 64
    pts = np.random.default_rng(1).normal(size=(500, 3)).astype(np.float32)
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(pts), H, W)
    theta, phi = spherical.pixel_angles(K, H, W)
    x = np.asarray(K)[0, 0] * np.asarray(theta) + np.asarray(K)[0, 2]
    y = np.asarray(K)[1, 1] * np.asarray(phi) + np.asarray(K)[1, 2]
    u = np.asarray(spherical.pixel_index(jnp.asarray(x)))
    v = np.asarray(spherical.pixel_index(jnp.asarray(y)))
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    np.testing.assert_array_equal(u, uu)
    np.testing.assert_array_equal(v, vv)


def test_depth_to_points_plane():
    # synthetic ground plane z = -2: back-projected points must lie on it
    H, W = 32, 128
    cloud = np.random.default_rng(2).normal(size=(100, 3)).astype(np.float32)
    cloud[:, 2] = -np.abs(cloud[:, 2]) - 0.5
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(cloud), H, W)
    rays = np.asarray(spherical.pixel_rays(K, H, W))
    down = rays[:, :, 2] < -0.1
    depth = np.where(down, -2.0 / np.where(down, rays[:, :, 2], -1.0), 0.0)
    pts = np.asarray(spherical.depth_to_points(jnp.asarray(depth), K))
    np.testing.assert_allclose(pts[down][:, 2], -2.0, atol=1e-4)


def test_depth_gradient_masks_invalid():
    depth = np.ones((8, 8), np.float32)
    depth[4, 4] = 5.0
    valid = np.ones((8, 8), bool)
    g = np.asarray(spherical.depth_gradient(jnp.asarray(depth),
                                            jnp.asarray(valid)))
    assert g[4, 3] > 0 and g[3, 4] > 0
    assert g[0, 0] == 0  # border zeroed
    # masking the peak pixel kills the gradient contributions through it
    valid[4, 4] = False
    g2 = np.asarray(spherical.depth_gradient(jnp.asarray(depth),
                                             jnp.asarray(valid)))
    assert g2[4, 3] == 0
