"""Pallas kernel parity vs the golden jnp rasterizer (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatloam_tpu.geometry import se3, spherical
from splatloam_tpu.ops.rasterizer import RenderParams
from splatloam_tpu.ops.rasterizer import pallas_raster
from splatloam_tpu.ops.rasterizer.jnp_ref import rasterize_jnp
from splatloam_tpu.ops.rasterizer.pallas_raster import rasterize_pallas

H, W = 16, 256
PARAMS = RenderParams(height=H, width=W, backend="pallas", chunk=128,
                      tile_h=8, tile_w=128, tile_list_capacity=512)


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_raster._INTERPRET = True
    yield
    pallas_raster._INTERPRET = False


def _scene(rng, n=300):
    # surfels scattered on a cylinder wall + floor, sensor-facing
    theta = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(-1.0, 1.5, n)
    xyz = np.stack([7 * np.cos(theta), 7 * np.sin(theta), z],
                   -1).astype(np.float32)
    xyz[: n // 3, 2] = -1.4  # floor patch
    xyz[: n // 3, 0] = rng.uniform(-5, 5, n // 3)
    xyz[: n // 3, 1] = rng.uniform(-5, 5, n // 3)
    normals = -xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
    quat = np.asarray(se3.quat_from_normal(jnp.asarray(normals)))
    scales = rng.uniform(0.2, 0.6, (n, 2)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(xyz), H, W)
    return (jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quat),
            jnp.asarray(opac), jnp.eye(4), K)


def test_forward_parity(rng):
    args = _scene(rng)
    ref = rasterize_jnp(*args, H, W)
    out = rasterize_pallas(*args, PARAMS)
    for key, tol in [("alpha", 2e-5), ("depth_sum", 2e-4),
                     ("normal_sum", 2e-4), ("dist", 3e-4)]:
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]), atol=tol,
            err_msg=key)
    # median: equal where both found a crossing
    mr = np.asarray(ref["median"])
    mp = np.asarray(out["median"])
    both = (mr > 0) & (mp > 0)
    np.testing.assert_allclose(mp[both], mr[both], atol=1e-4)
    assert (both.sum() / max((mr > 0).sum(), 1)) > 0.99


def test_forward_parity_posed_camera(rng):
    xyz, scales, quat, opac, _, K = _scene(rng)
    ang = 0.3
    T_cw = jnp.asarray(np.array(
        [[np.cos(ang), -np.sin(ang), 0, 0.5],
         [np.sin(ang), np.cos(ang), 0, -0.2],
         [0, 0, 1, 0.1],
         [0, 0, 0, 1]], np.float32))
    ref = rasterize_jnp(xyz, scales, quat, opac, T_cw, K, H, W)
    out = rasterize_pallas(xyz, scales, quat, opac, T_cw, K, PARAMS)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth_sum"]),
                               np.asarray(ref["depth_sum"]), atol=2e-4)


def test_gradient_parity(rng):
    args = _scene(rng, n=120)

    def loss_ref(xyz, s, q, o, T, K):
        c = rasterize_jnp(xyz, s, q, o, T, K, H, W)
        return (jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])
                + 0.5 * jnp.sum(c["normal_sum"]) + 0.2 * jnp.sum(c["dist"]))

    def loss_pal(xyz, s, q, o, T, K):
        c = rasterize_pallas(xyz, s, q, o, T, K, PARAMS)
        return (jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])
                + 0.5 * jnp.sum(c["normal_sum"]) + 0.2 * jnp.sum(c["dist"]))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*args)
    names = ["xyz", "scales", "quat", "opacity"]
    for name, gr, gp in zip(names, g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-6
        np.testing.assert_allclose(gp, gr, atol=2e-3 * scale,
                                   err_msg=name)


def test_gradient_pose(rng):
    """SE(3) pose gradients flow through pack_surfels in both backends."""
    args = _scene(rng, n=80)

    def loss(backend):
        def f(T):
            if backend == "jnp":
                c = rasterize_jnp(args[0], args[1], args[2], args[3], T,
                                  args[5], H, W)
            else:
                c = rasterize_pallas(args[0], args[1], args[2], args[3], T,
                                     args[5], PARAMS)
            return jnp.sum(c["depth_sum"]) + jnp.sum(c["alpha"])
        return f

    gT_ref = np.asarray(jax.grad(loss("jnp"))(args[4]))
    gT_pal = np.asarray(jax.grad(loss("pallas"))(args[4]))
    scale = np.abs(gT_ref).max() + 1e-6
    np.testing.assert_allclose(gT_pal, gT_ref, atol=3e-3 * scale)


def test_forward_parity_production_tiles(rng):
    """Default production tile config (8x32, chunk 256, sorted binner)."""
    params = RenderParams(height=H, width=W, backend="pallas")
    assert (params.tile_h, params.tile_w) == (8, 32)
    args = _scene(rng, n=250)
    ref = rasterize_jnp(*args, H, W)
    out = rasterize_pallas(*args, params)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth_sum"]),
                               np.asarray(ref["depth_sum"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["normal_sum"]),
                               np.asarray(ref["normal_sum"]), atol=3e-4)


def test_gradient_parity_early_exit(rng):
    """Adversarial: an opaque near wall saturates transmittance in the
    first chunk while many far chunks exist — the forward's early exit
    must leave the skipped chunks' T_start boundaries zeroed so the
    backward's liveness scan never resurrects a dead chunk (VERDICT
    round-1 weak #4)."""
    xyz, scales, quat, opac, T, K = _scene(rng, n=500)
    # near wall: 64 surfels at radius 2 covering the full azimuth band,
    # fully opaque -> alpha saturates immediately, the remaining ~3.5
    # chunks (capacity 512 / chunk 128) of far surfels are skipped
    thw = np.linspace(-np.pi, np.pi, 64, endpoint=False)
    wall = np.stack([2 * np.cos(thw), 2 * np.sin(thw),
                     np.zeros(64)], -1).astype(np.float32)
    wn = -wall / np.linalg.norm(wall, axis=-1, keepdims=True)
    wq = np.asarray(se3.quat_from_normal(jnp.asarray(wn)))
    xyz = jnp.concatenate([jnp.asarray(wall), xyz])
    quat = jnp.concatenate([jnp.asarray(wq), quat])
    scales = jnp.concatenate([jnp.full((64, 2), 1.2), scales])
    opac = jnp.concatenate([jnp.full((64,), 0.999), opac])

    def loss(fn):
        def f(xyz, s, q, o):
            c = fn(xyz, s, q, o)
            return (jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])
                    + 0.5 * jnp.sum(c["normal_sum"]))
        return f

    ref_fn = loss(lambda *a: rasterize_jnp(*a, T, K, H, W))
    pal_fn = loss(lambda *a: rasterize_pallas(*a, T, K, PARAMS))
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2, 3))(xyz, scales, quat, opac)
    g_pal = jax.grad(pal_fn, argnums=(0, 1, 2, 3))(xyz, scales, quat, opac)
    for name, gr, gp in zip(["xyz", "scales", "quat", "opacity"],
                            g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-6
        np.testing.assert_allclose(gp, gr, atol=3e-3 * scale,
                                   err_msg=name)


@pytest.mark.slow
def test_batched_multiview_matches_per_view(rng):
    """rasterize_pallas_batched over B=3 poses == three single-view
    renders (forward and gradients, which must SUM over views)."""
    from splatloam_tpu.ops.rasterizer.pallas_raster import \
        rasterize_pallas_batched
    xyz, scales, quat, opac, _, K = _scene(rng, n=200)
    angs = [0.0, 0.25, -0.4]
    T_b = jnp.stack([jnp.asarray(np.array(
        [[np.cos(a), -np.sin(a), 0, 0.1 * i],
         [np.sin(a), np.cos(a), 0, -0.05 * i],
         [0, 0, 1, 0.02 * i], [0, 0, 0, 1]], np.float32))
        for i, a in enumerate(angs)])
    K_b = jnp.stack([K] * 3)

    outs_b = rasterize_pallas_batched(xyz, scales, quat, opac, T_b, K_b,
                                      PARAMS)
    for i in range(3):
        out_i = rasterize_pallas(xyz, scales, quat, opac, T_b[i], K,
                                 PARAMS)
        for key, tol in [("alpha", 2e-5), ("depth_sum", 2e-4),
                         ("normal_sum", 2e-4)]:
            np.testing.assert_allclose(np.asarray(outs_b[key][i]),
                                       np.asarray(out_i[key]), atol=tol,
                                       err_msg=f"view {i} {key}")

    def loss_b(xyz, s, q, o):
        c = rasterize_pallas_batched(xyz, s, q, o, T_b, K_b, PARAMS)
        return jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])

    def loss_sum(xyz, s, q, o):
        tot = 0.0
        for i in range(3):
            c = rasterize_pallas(xyz, s, q, o, T_b[i], K, PARAMS)
            tot = tot + jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])
        return tot

    g_b = jax.grad(loss_b, argnums=(0, 1, 2, 3))(xyz, scales, quat, opac)
    g_s = jax.grad(loss_sum, argnums=(0, 1, 2, 3))(xyz, scales, quat,
                                                   opac)
    for name, gb, gs in zip(["xyz", "scales", "quat", "opacity"], g_b,
                            g_s):
        scale = np.abs(np.asarray(gs)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gs),
                                   atol=2e-4 * scale, err_msg=name)


def test_tile_list_overflow_drops_far(rng):
    # capacity smaller than surfel count: nearest surfels must be kept
    params = RenderParams(height=H, width=W, backend="pallas", chunk=128,
                          tile_h=8, tile_w=128, tile_list_capacity=128)
    args = _scene(rng, n=600)
    out = rasterize_pallas(*args, params)
    ref = rasterize_jnp(*args, H, W)
    a_out = np.asarray(out["alpha"])
    a_ref = np.asarray(ref["alpha"])
    assert np.all(np.isfinite(a_out))
    # dropping (farthest) splats can only LOSE weight, never add it
    assert np.all(a_out <= a_ref + 1e-4)
    # pixels fully covered by the kept splats agree with the reference
    sat = a_out > 0.99
    assert sat.sum() > 100
    d_ref = np.asarray(ref["depth_sum"])[sat]
    d_out = np.asarray(out["depth_sum"])[sat]
    np.testing.assert_allclose(d_out, d_ref, rtol=0.03)


def test_two_tier_binning_matches_full_window(rng):
    """Top-k two-tier window emission must produce the SAME tile lists as
    the full cap window whenever the wide splats fit the top-k budget
    (always true below 4096 surfels)."""
    import bench as B
    from splatloam_tpu.ops.rasterizer import binning, common
    args = B.make_scene(rng, 2000, 16, 256)
    packed = common.pack_surfels(*args)
    kw = dict(height=16, width=256, tile_h=8, tile_w=32, capacity=512,
              cap_ty=9, cap_tx=5)
    l1, c1, _ = binning.build_tile_lists_sorted(packed, **kw,
                                                two_tier=False)
    l2, c2, _ = binning.build_tile_lists_sorted(packed, **kw,
                                                two_tier=True)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


# ---------------------------------------------------------------------------
# layout="flat": compacted slot pool (binning.build_flat_lists +
# _raster_core_flat) — must match the golden renderer and the tiled layout
# ---------------------------------------------------------------------------

FLAT = RenderParams(height=H, width=W, backend="pallas", chunk=128,
                    tile_h=8, tile_w=32, tile_list_capacity=512,
                    layout="flat", flat_capacity=16 * 512)


def test_flat_forward_matches_golden_and_tiled(rng):
    args = _scene(rng, n=600)
    ref = rasterize_jnp(*args, H, W)
    out_f = rasterize_pallas(*args, FLAT)
    out_t = rasterize_pallas(*args, FLAT._replace(layout="tiled"))
    for key, tol in [("alpha", 2e-5), ("depth_sum", 2e-4),
                     ("normal_sum", 2e-4), ("dist", 3e-4),
                     ("final_T", 2e-5)]:
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(ref[key]), atol=tol,
            err_msg=f"flat-vs-golden {key}")
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_t[key]), atol=tol,
            err_msg=f"flat-vs-tiled {key}")


def test_flat_gradient_parity(rng):
    args = _scene(rng, n=150)
    p = FLAT._replace(with_median=False)

    def loss(fn):
        def f(xyz, s, q, o):
            c = fn(xyz, s, q, o)
            return (jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])
                    + 0.5 * jnp.sum(c["normal_sum"])
                    + 0.2 * jnp.sum(c["dist"]))
        return f

    g_ref = jax.grad(loss(lambda *a: rasterize_jnp(*a, args[4], args[5],
                                                   H, W)),
                     argnums=(0, 1, 2, 3))(*args[:4])
    g_flat = jax.grad(loss(lambda *a: rasterize_pallas(
        *a, args[4], args[5], p)), argnums=(0, 1, 2, 3))(*args[:4])
    for name, gr, gp in zip(("xyz", "scales", "quat", "opacity"),
                            g_ref, g_flat):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = float(np.abs(gr).max()) + 1e-6
        np.testing.assert_allclose(gp, gr, atol=3e-5 * max(scale, 1.0),
                                   err_msg=name)


def test_flat_budget_truncation_drops_deepest(rng):
    """An undersized flat budget must fill tiles greedily in tile order
    and keep each surviving tile's NEAREST entries (depth order), never
    corrupt them."""
    from splatloam_tpu.ops.rasterizer import binning, common
    args = _scene(rng, n=600)
    packed = common.pack_surfels(*args)
    lists, counts, _ = binning.build_tile_lists_sorted(
        packed, H, W, 8, 32, 512)
    chunk = 128
    budget = 6 * chunk
    flat_ids, toc, starts, counts2 = binning.build_flat_lists(
        packed, H, W, 8, 32, 512, chunk, budget)
    counts, counts2 = np.asarray(counts), np.asarray(counts2)
    lists, flat_ids = np.asarray(lists), np.asarray(flat_ids)
    starts = np.asarray(starts)
    assert (counts2 <= counts).all() and counts2.sum() > 0
    for t in range(lists.shape[0]):
        seg = flat_ids[starts[t]:starts[t] + counts2[t]]
        np.testing.assert_array_equal(seg, lists[t, :counts2[t]])


def test_flat_empty_scene(rng):
    """Zero-opacity pool: every tile unvisited or self-neutralized; the
    render must be exactly the empty state (alpha 0, T 1), not NaN."""
    args = _scene(rng, n=64)
    out = rasterize_pallas(args[0], args[1], args[2],
                           jnp.zeros_like(args[3]), args[4], args[5],
                           FLAT)
    assert np.isfinite(np.asarray(out["depth_sum"])).all()
    np.testing.assert_array_equal(np.asarray(out["alpha"]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["final_T"]), 1.0)


def test_ranksum_scatter_gradient_parity(rng):
    """scatter="ranksum" (id-sort + rank-windowed one-hot segment sum)
    must produce the same gradients as the default RMW pool."""
    args = _scene(rng, n=200)
    p_rmw = PARAMS._replace(tile_w=32, with_median=False)
    p_rs = p_rmw._replace(scatter="ranksum")

    def loss(p):
        def f(xyz, s, q, o):
            c = rasterize_pallas(xyz, s, q, o, args[4], args[5], p)
            return (jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])
                    + 0.5 * jnp.sum(c["normal_sum"]))
        return f

    g_rmw = jax.grad(loss(p_rmw), argnums=(0, 1, 2, 3))(*args[:4])
    g_rs = jax.grad(loss(p_rs), argnums=(0, 1, 2, 3))(*args[:4])
    for name, a, b in zip(("xyz", "scales", "quat", "opacity"),
                          g_rs, g_rmw):
        a, b = np.asarray(a), np.asarray(b)
        scale = float(np.abs(b).max()) + 1e-6
        np.testing.assert_allclose(a, b, atol=1e-5 * max(scale, 1.0),
                                   err_msg=name)


def test_ranksum_scatter_gradient_parity_batched(rng):
    """The batched (B views) ranksum path: per-view rank plans built by
    the vmapped prepare_tiles, gradients summed over views, vs RMW."""
    from splatloam_tpu.ops.rasterizer.pallas_raster import \
        rasterize_pallas_batched
    args = _scene(rng, n=150)
    T_b = jnp.stack([args[4],
                     args[4].at[0, 3].add(0.35).at[2, 3].add(-0.2)])
    K_b = jnp.stack([args[5], args[5]])
    p_rmw = PARAMS._replace(tile_w=32, with_median=False)
    p_rs = p_rmw._replace(scatter="ranksum")

    def loss(p):
        def f(xyz, s, q, o):
            c = rasterize_pallas_batched(xyz, s, q, o, T_b, K_b, p)
            return jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])
        return f

    g_rmw = jax.grad(loss(p_rmw), argnums=(0, 1, 2, 3))(*args[:4])
    g_rs = jax.grad(loss(p_rs), argnums=(0, 1, 2, 3))(*args[:4])
    for name, a, b in zip(("xyz", "scales", "quat", "opacity"),
                          g_rs, g_rmw):
        a, b = np.asarray(a), np.asarray(b)
        scale = float(np.abs(b).max()) + 1e-6
        np.testing.assert_allclose(a, b, atol=1e-5 * max(scale, 1.0),
                                   err_msg=name)


def test_plan_scatter_gradient_parity(rng):
    """scatter="plan" (occurrence-table gather-sum gradient reduction)
    must produce the same gradients as the default RMW pool.  Kept as an
    option: measured net-slower end-to-end on v5e (the rebin-time plan
    construction outweighs the RMW savings, docs/PERF.md) but exact and
    useful in high-rebin regimes."""
    args = _scene(rng, n=200)
    p_rmw = PARAMS._replace(tile_w=32, with_median=False)
    p_plan = p_rmw._replace(scatter="plan")

    def loss(p):
        def f(xyz, s, q, o):
            c = rasterize_pallas(xyz, s, q, o, args[4], args[5], p)
            return (jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])
                    + 0.5 * jnp.sum(c["normal_sum"]))
        return f

    g_rmw = jax.grad(loss(p_rmw), argnums=(0, 1, 2, 3))(*args[:4])
    g_plan = jax.grad(loss(p_plan), argnums=(0, 1, 2, 3))(*args[:4])
    for name, a, b in zip(("xyz", "scales", "quat", "opacity"),
                          g_plan, g_rmw):
        a, b = np.asarray(a), np.asarray(b)
        scale = float(np.abs(b).max()) + 1e-6
        np.testing.assert_allclose(a, b, atol=1e-5 * max(scale, 1.0),
                                   err_msg=name)
