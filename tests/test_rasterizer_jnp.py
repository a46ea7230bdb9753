import jax
import jax.numpy as jnp
import numpy as np

from splatloam_tpu.geometry import se3, spherical
from splatloam_tpu.ops.rasterizer import RenderParams, render
from splatloam_tpu.ops.rasterizer.jnp_ref import rasterize_jnp

H, W = 16, 128


def _intrinsics():
    # symmetric elevation range: +-30 deg
    ang = np.pi / 6
    cloud = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [np.cos(ang), 0, -np.sin(ang)]], np.float32)
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(cloud), H, W)
    return K


def _surfel(p, n, scale, opacity):
    q = np.asarray(se3.quat_from_normal(jnp.asarray(n, jnp.float32)))
    return (np.asarray(p, np.float32)[None],
            np.asarray(scale, np.float32)[None],
            q[None].astype(np.float32),
            np.float32([opacity]))


def test_single_wall_depth():
    K = _intrinsics()
    xyz, s, q, o = _surfel([5.0, 0, 0], [-1.0, 0, 0], [10.0, 10.0], 0.99)
    chans = rasterize_jnp(jnp.asarray(xyz), jnp.asarray(s), jnp.asarray(q),
                          jnp.asarray(o), jnp.eye(4), K, H, W)
    alpha = np.asarray(chans["alpha"])
    depth_sum = np.asarray(chans["depth_sum"])
    rays = np.asarray(spherical.pixel_rays(K, H, W))
    lit = alpha > 0.5
    assert lit.sum() > 50
    expected = 5.0 / rays[..., 0]
    got = depth_sum[lit] / alpha[lit]
    np.testing.assert_allclose(got, expected[lit], rtol=1e-4)
    assert np.asarray(chans["radii"])[0] > 0


def test_occlusion_and_median():
    K = _intrinsics()
    near = _surfel([2.0, 0, 0], [-1.0, 0, 0], [5.0, 5.0], 0.999)
    far = _surfel([6.0, 0, 0], [-1.0, 0, 0], [20.0, 20.0], 0.999)
    xyz = jnp.asarray(np.concatenate([far[0], near[0]]))  # unsorted on input
    s = jnp.asarray(np.concatenate([far[1], near[1]]))
    q = jnp.asarray(np.concatenate([far[2], near[2]]))
    o = jnp.asarray(np.concatenate([far[3], near[3]]))
    chans = rasterize_jnp(xyz, s, q, o, jnp.eye(4), K, H, W)
    rays = np.asarray(spherical.pixel_rays(K, H, W))
    alpha = np.asarray(chans["alpha"])
    # restrict to pixels the near wall alone saturates (its Gaussian decays
    # at steep angles, letting the far wall bleed through elsewhere)
    near_only = rasterize_jnp(jnp.asarray(near[0]), jnp.asarray(near[1]),
                              jnp.asarray(near[2]), jnp.asarray(near[3]),
                              jnp.eye(4), K, H, W)
    lit = np.asarray(near_only["alpha"]) > 0.995
    assert lit.sum() > 20
    depth = np.asarray(chans["depth_sum"]) / np.maximum(alpha, 1e-9)
    t_near = 2.0 / rays[..., 0]
    # near wall dominates: blended depth within 1% of near-wall depth
    np.testing.assert_allclose(depth[lit], t_near[lit], rtol=1e-2)
    med = np.asarray(chans["median"])
    np.testing.assert_allclose(med[lit], t_near[lit], rtol=1e-5)


def test_azimuth_wraparound():
    K = _intrinsics()
    xyz, s, q, o = _surfel([-5.0, 0, 0], [1.0, 0, 0], [8.0, 8.0], 0.95)
    chans = rasterize_jnp(jnp.asarray(xyz), jnp.asarray(s), jnp.asarray(q),
                          jnp.asarray(o), jnp.eye(4), K, H, W)
    alpha = np.asarray(chans["alpha"])
    mid = H // 2
    # the wall behind straddles the +-pi seam: both image edges are lit
    assert alpha[mid, 0] > 0.3
    assert alpha[mid, W - 1] > 0.3


def test_inactive_surfels_no_contribution(rng):
    K = _intrinsics()
    xyz = rng.normal(size=(32, 3)).astype(np.float32) * 3 + \
        np.float32([6, 0, 0])
    n = -xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
    q = np.asarray(se3.quat_from_normal(jnp.asarray(n)))
    s = np.full((32, 2), 0.5, np.float32)
    o = np.full((32,), 0.9, np.float32)
    o2 = o.copy()
    o2[16:] = 0.0  # "pruned" slots
    full = rasterize_jnp(jnp.asarray(xyz[:16]), jnp.asarray(s[:16]),
                         jnp.asarray(q[:16]), jnp.asarray(o[:16]),
                         jnp.eye(4), K, H, W)
    padded = rasterize_jnp(jnp.asarray(xyz), jnp.asarray(s), jnp.asarray(q),
                           jnp.asarray(o2), jnp.eye(4), K, H, W)
    np.testing.assert_allclose(np.asarray(full["alpha"]),
                               np.asarray(padded["alpha"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(full["depth_sum"]),
                               np.asarray(padded["depth_sum"]), atol=1e-5)


def test_gradients_finite_differences(rng):
    # float64 + small eps keeps the finite differences inside the smooth
    # region between the rasterizer's hard cutoffs (alpha >= 1/255 etc.)
    with jax.enable_x64(True):
        Ksmall = jnp.asarray(np.asarray(_intrinsics()), jnp.float64)
        xyz = np.float64([[4.0, 0.5, 0.2], [5.0, -0.5, -0.3],
                          [4.5, 0.1, 0.4]])
        n = -xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
        q = np.asarray(se3.quat_from_normal(jnp.asarray(n)))
        s = np.full((3, 2), 1.2, np.float64)
        o = np.float64([0.8, 0.7, 0.6])

        def loss(xyz_, s_, q_, o_):
            chans = rasterize_jnp(xyz_, s_, q_, o_,
                                  jnp.eye(4, dtype=jnp.float64), Ksmall,
                                  H, W)
            return (jnp.sum(chans["depth_sum"]) * 0.05
                    + jnp.sum(chans["alpha"])
                    + jnp.sum(chans["normal_sum"]))

        args = [jnp.asarray(xyz), jnp.asarray(s), jnp.asarray(q),
                jnp.asarray(o)]
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
        for ai in (0, 1, 2, 3):
            eps = 1e-6
            g = np.asarray(grads[ai]).ravel()
            flat = np.asarray(args[ai]).ravel()
            for idx in rng.choice(flat.size, min(4, flat.size),
                                  replace=False):
                pert = flat.copy()
                pert[idx] += eps
                up = [*args]
                up[ai] = jnp.asarray(pert.reshape(args[ai].shape))
                lp = float(loss(*up))
                pert[idx] -= 2 * eps
                up[ai] = jnp.asarray(pert.reshape(args[ai].shape))
                lm = float(loss(*up))
                fd = (lp - lm) / (2 * eps)
                assert abs(fd - g[idx]) <= 1e-4 + 1e-4 * abs(fd), \
                    f"arg{ai}[{idx}]: fd={fd} grad={g[idx]}"


def test_render_decode_shapes_and_normals():
    K = _intrinsics()
    xyz, s, q, o = _surfel([5.0, 0, 0], [-1.0, 0, 0], [10.0, 10.0], 0.99)
    params = RenderParams(height=H, width=W, backend="jnp")
    out = render(jnp.asarray(xyz), jnp.asarray(s), jnp.asarray(q),
                 jnp.asarray(o), jnp.eye(4), K, params)
    assert out["rend_alpha"].shape == (H, W)
    assert out["rend_normal"].shape == (H, W, 3)
    assert out["surf_depth"].shape == (H, W)
    alpha = np.asarray(out["rend_alpha"])
    nrm = np.asarray(out["rend_normal"])
    lit = alpha > 0.9
    # wall normal faces the sensor: -x in world(model) frame
    assert np.all(nrm[lit][:, 0] < -0.9)
    # surf_normal from depth differences agrees in the interior
    sn = np.asarray(out["surf_normal"])
    interior = lit.copy()
    interior[:2] = interior[-2:] = False
    interior[:, :2] = interior[:, -2:] = False
    assert np.all(sn[interior][:, 0] < -0.5)
