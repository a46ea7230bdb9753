import jax.numpy as jnp
import numpy as np

from splatloam_tpu.geometry import spherical
from splatloam_tpu.ops import knn, projection


def _random_cloud(rng, n=3000):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    pts *= rng.uniform(2.0, 40.0, size=(n, 1)).astype(np.float32)
    return pts


def test_range_image_zbuffer(rng):
    pts = _random_cloud(rng)
    H, W = 32, 256
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(pts), H, W)
    mask = np.ones(len(pts), bool)
    depth, lut, valid = projection.build_range_image(
        jnp.asarray(pts), jnp.asarray(mask), K, H, W, 1.0, 100.0)
    depth, lut, valid = map(np.asarray, (depth, lut, valid))
    assert valid.sum() > 100
    # every valid pixel's depth equals the range of the LUT-indexed point
    rr = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(depth[valid], rr[lut[valid]], rtol=1e-6)
    # z-buffer property: the winner is the minimum-range point in its pixel
    x, y, r = map(np.asarray, spherical.project_points(K, jnp.asarray(pts)))
    u = np.mod(np.asarray(spherical.pixel_index(jnp.asarray(x))), W)
    v = np.asarray(spherical.pixel_index(jnp.asarray(y)))
    for i in rng.choice(len(pts), 50, replace=False):
        if 0 <= v[i] < H and 1.0 < rr[i] <= 100.0:
            assert valid[v[i], u[i]]
            assert depth[v[i], u[i]] <= rr[i] + 1e-5


def test_range_image_gates_and_padding(rng):
    pts = _random_cloud(rng, 500)
    H, W = 16, 128
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(pts), H, W)
    mask = np.ones(500, bool)
    mask[250:] = False  # padding rows
    depth, lut, valid = projection.build_range_image(
        jnp.asarray(pts), jnp.asarray(mask), K, H, W, 1.0, 100.0)
    lut = np.asarray(lut)
    assert lut.max() < 250
    # depth gate: min above all ranges -> empty image
    d2, l2, v2 = projection.build_range_image(
        jnp.asarray(pts), jnp.asarray(mask), K, H, W, 1000.0, 2000.0)
    assert not np.asarray(v2).any()
    assert np.all(np.asarray(d2) == 0) and np.all(np.asarray(l2) == -1)


def test_knn_window_matches_exact(rng):
    pts = rng.normal(size=(512, 3)).astype(np.float32) * 5.0
    exact = np.asarray(knn.mean_sq_dist_knn_exact(jnp.asarray(pts)))
    approx = np.asarray(knn.mean_sq_dist_knn(jnp.asarray(pts), window=64))
    # windowed Morton search is approximate; demand close agreement for most
    # points and never an underestimate beyond numerics
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-9)
    assert np.median(rel) < 0.05
    assert (rel < 0.5).mean() > 0.85
    assert np.all(approx >= exact - 1e-5)


def test_knn_masked(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    mask = np.zeros(64, bool)
    mask[:32] = True
    out = np.asarray(knn.mean_sq_dist_knn_exact(jnp.asarray(pts),
                                                jnp.asarray(mask)))
    assert np.all(out[32:] == 0)
    assert np.all(out[:32] > 0)


def test_knn_grid_spacing():
    # regular grid with spacing h: 3-NN are at distance h -> mean sq = h^2
    h = 0.7
    g = np.stack(np.meshgrid(*[np.arange(8) * h] * 3), axis=-1)
    pts = g.reshape(-1, 3).astype(np.float32)
    out = np.asarray(knn.mean_sq_dist_knn(jnp.asarray(pts), window=32))
    np.testing.assert_allclose(np.median(out), h * h, rtol=1e-3)
