"""Sharded train step on the virtual 8-device CPU mesh: must match the
single-device mapper step numerically."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatloam_tpu.geometry import se3
from splatloam_tpu.model import surfels as S
from splatloam_tpu.ops.rasterizer import RenderParams
from splatloam_tpu.parallel import make_mesh, sharded_train_step
from splatloam_tpu.parallel.sharded import shard_model_state

H, W = 16, 256
CAP = 512


def _setup(rng):
    n = 200
    theta = rng.uniform(-np.pi, np.pi, n)
    xyz = np.stack([6 * np.cos(theta), 6 * np.sin(theta),
                    rng.uniform(-1, 1, n)], -1).astype(np.float32)
    normals = -xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
    quat = np.asarray(se3.quat_from_normal(jnp.asarray(normals)))
    surf = S.empty_surfels(CAP)
    adam = S.empty_adam(CAP)
    newp = S.SurfelParams(
        xyz=jnp.asarray(xyz),
        log_scale=jnp.full((n, 2), -1.0),
        quat=jnp.asarray(quat),
        logit_opacity=jnp.full((n,), 2.0))
    surf, adam, _ = S.insert_surfels(surf, adam, newp, jnp.int32(n))
    from splatloam_tpu.geometry import spherical
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(xyz), H, W)
    depth = jnp.full((H, W), 6.0)
    valid = jnp.ones((H, W), bool)
    return surf, adam, K, jnp.eye(4), depth, valid


def _single_device_reference(surf, adam, K, T_cw, depth, valid, hyper):
    """The same losses computed without sharding."""
    from splatloam_tpu.ops.rasterizer import render
    params = RenderParams(height=H, width=W, backend="jnp")

    def loss_fn(p):
        scaling = jnp.exp(p.log_scale)
        opacity = jax.nn.sigmoid(p.logit_opacity) * surf.active
        pkg = render(p.xyz, scaling, p.quat, opacity, T_cw, K, params)
        validf = valid.astype(jnp.float32)
        v_sum = jnp.maximum(jnp.sum(validf), 1.0)
        geom = jnp.sum(jnp.abs(validf * (pkg["surf_depth"] - depth))) / \
            (H * W)
        ndot = jnp.sum(pkg["rend_normal"] * pkg["surf_normal"], -1)
        nl = 0.1 * jnp.sum((1 - ndot) * validf) / v_sum
        a = jnp.clip(pkg["rend_alpha"], 1e-7, 1 - 1e-7)
        al = 0.1 * jnp.sum(-jnp.log(a) * validf) / v_sum
        smax = jnp.max(scaling, axis=-1)
        reg = 0.2 * jnp.sum(jnp.maximum(smax - 0.5, 0.0) * surf.active)
        return geom + al + nl + reg

    loss, grads = jax.value_and_grad(loss_fn)(surf.params)
    s2, a2 = S.adam_step(surf, adam, grads, hyper)
    return s2, a2, loss


def _camera(rng, h, w):
    """Synthetic full-image camera: wavy cylinder depth, sensor-facing
    normals."""
    from splatloam_tpu.geometry import spherical
    from splatloam_tpu.model.camera import Camera
    from splatloam_tpu.ops.rasterizer import common
    theta = rng.uniform(-np.pi, np.pi, 3000)
    xyz = np.stack([8 * np.cos(theta), 8 * np.sin(theta),
                    rng.uniform(-1, 1, 3000)], -1).astype(np.float32)
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(xyz), h, w)
    u = np.arange(w)[None, :] * np.ones((h, 1))
    v = np.arange(h)[:, None] * np.ones((1, w))
    depth = (6.0 + 0.8 * np.sin(u * 0.12) + 0.5 * np.cos(v * 0.4)
             ).astype(np.float32)
    rays, _ = common.pixel_grid(jnp.asarray(K), h, w)
    normal = -np.asarray(rays)
    valid = np.ones((h, w), bool)
    return Camera(K=jnp.asarray(K), T_cw=jnp.eye(4),
                  depth=jnp.asarray(depth), normal=jnp.asarray(normal),
                  valid=jnp.asarray(valid))


def test_sharded_full_update_matches_single_device(rng, tmp_path):
    """densify -> optimize -> prune through the sharded programs must
    equal the single-device MapperPrograms phase by phase (VERDICT r1
    next-step #4)."""
    import synthetic
    from splatloam_tpu.parallel.sharded import (sharded_densify,
                                                sharded_optimize,
                                                sharded_prune)
    from splatloam_tpu.slam.mapper import (KeyframeBatch, MapperPrograms,
                                           sample_geometric_probs)

    cfg = synthetic.make_config(
        tmp_path, mapping={"num_iterations": 11, "densify_percentage": 0.1,
                           "densify_threshold_egeom": 0.2},
        compute={"backend": "jnp"})
    h, w = 16, 256
    progs = MapperPrograms(cfg, h, w, CAP)
    mesh = make_mesh(data=4, model=2)
    sh_dens = sharded_densify(mesh, progs.params, cfg.mapping,
                              progs.max_new, cfg.opt.depth_ratio)
    sh_opt = sharded_optimize(mesh, progs.params, progs.hyper,
                              cfg.mapping, cfg.compute,
                              cfg.opt.depth_ratio)
    sh_prune = sharded_prune(mesh, cfg.mapping)

    cam = _camera(rng, h, w)
    key = jax.random.PRNGKey(7)
    surf0 = S.empty_surfels(CAP)
    adam0 = S.empty_adam(CAP)

    # --- phase 1: densify (initialize) ---
    s_ref, a_ref, n_ref, m_ref = progs._densify(surf0, adam0, cam, key,
                                                initialize=True)
    surf_sh, adam_sh = shard_model_state(mesh, surf0, adam0)
    s_sh, a_sh, n_sh, m_sh = sh_dens[True](surf_sh, adam_sh, cam, key)
    assert int(n_sh) == int(n_ref) > 50
    np.testing.assert_array_equal(np.asarray(m_sh), np.asarray(m_ref))
    np.testing.assert_allclose(np.asarray(s_sh.params.xyz),
                               np.asarray(s_ref.params.xyz), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s_sh.active),
                                  np.asarray(s_ref.active))

    # --- phase 2: optimize (full block loop, 2 keyframes) ---
    cam2 = cam._replace(T_cw=jnp.asarray(np.array(
        [[1, 0, 0, -0.3], [0, 1, 0, 0.1], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32)))
    kf_cap = 8
    probs = sample_geometric_probs(2, 0.4, kf_cap)
    log_probs = np.full((kf_cap,), -np.inf, np.float32)
    log_probs[:2] = np.log(probs[:2])
    def pad(x2):  # [2, ...] -> [kf_cap, ...] zero padding
        return jnp.concatenate(
            [x2, jnp.zeros((kf_cap - 2,) + x2.shape[1:], x2.dtype)])

    kf = KeyframeBatch(
        K=pad(jnp.stack([cam.K, cam2.K])),
        T_cw=pad(jnp.stack([cam.T_cw, cam2.T_cw])),
        depth=pad(jnp.stack([cam.depth, cam.depth])),
        valid=pad(jnp.stack([cam.valid, cam.valid])),
        log_probs=jnp.asarray(log_probs))
    okey = jax.random.PRNGKey(3)
    s2_ref, a2_ref, ema_ref, it_ref = progs._optimize(s_ref, a_ref, kf,
                                                      okey)
    s2_sh, a2_sh, ema_sh, it_sh = sh_opt(s_sh, a_sh, kf, okey)
    assert int(it_sh) == int(it_ref) >= 12
    np.testing.assert_allclose(float(ema_sh), float(ema_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_sh.params.xyz),
                               np.asarray(s2_ref.params.xyz), atol=5e-5)
    np.testing.assert_allclose(np.asarray(s2_sh.params.logit_opacity),
                               np.asarray(s2_ref.params.logit_opacity),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(a2_sh.mu.xyz),
                               np.asarray(a2_ref.mu.xyz), atol=5e-5)
    assert int(a2_sh.step) == int(a2_ref.step)

    # --- phase 3: prune ---
    s3_ref, np_ref = progs._prune(s2_ref)
    s3_sh, np_sh = sh_prune(s2_sh)
    assert int(np_sh) == int(np_ref)
    np.testing.assert_array_equal(np.asarray(s3_sh.active),
                                  np.asarray(s3_ref.active))


@pytest.mark.slow
@pytest.mark.parametrize("scatter", ["rmw", "ranksum"])
def test_balanced_tile_partition_matches_single_device(rng, tmp_path,
                                                       scatter):
    """sharded_optimize_tiles (count-balanced tile deal over "data") must
    match the single-device pallas optimize loop — the load-balance fix
    named in docs/ARCHITECTURE.md's scaling model.  Parametrized over the
    gradient-reduction path (the per-device tile-subset plans of
    _maybe_plan follow cfg.compute.scatter)."""
    import synthetic
    from splatloam_tpu.parallel.sharded import sharded_optimize_tiles
    from splatloam_tpu.slam.mapper import (KeyframeBatch, MapperPrograms,
                                           sample_geometric_probs)

    cfg = synthetic.make_config(
        tmp_path,
        mapping={"num_iterations": 7, "densify_percentage": 0.1},
        compute={"backend": "pallas", "rebin_every": 4,
                 "tile_list_capacity": 512, "scatter": scatter})
    h, w = 16, 256
    progs = MapperPrograms(cfg, h, w, CAP)
    mesh = make_mesh(data=4, model=2)
    sh_opt = sharded_optimize_tiles(mesh, progs.params, progs.hyper,
                                    cfg.mapping, cfg.compute,
                                    cfg.opt.depth_ratio)

    cam = _camera(rng, h, w)
    key = jax.random.PRNGKey(7)
    surf0 = S.empty_surfels(CAP)
    adam0 = S.empty_adam(CAP)
    s_ref, a_ref, _, _ = progs._densify(surf0, adam0, cam, key,
                                        initialize=True)

    kf_cap = 8
    probs = sample_geometric_probs(1, 0.4, kf_cap)
    log_probs = np.full((kf_cap,), -np.inf, np.float32)
    log_probs[0] = np.log(probs[0])

    def pad(x1):
        return jnp.concatenate(
            [x1[None], jnp.zeros((kf_cap - 1,) + x1.shape, x1.dtype)])

    kf = KeyframeBatch(K=pad(cam.K), T_cw=pad(cam.T_cw),
                       depth=pad(cam.depth), valid=pad(cam.valid),
                       log_probs=jnp.asarray(log_probs))
    okey = jax.random.PRNGKey(3)
    s2_ref, a2_ref, ema_ref, it_ref = progs._optimize(s_ref, a_ref, kf,
                                                      okey)
    surf_sh, adam_sh = shard_model_state(mesh, s_ref, a_ref)
    s2_sh, a2_sh, ema_sh, it_sh = sh_opt(surf_sh, adam_sh, kf, okey)
    assert int(it_sh) == int(it_ref) >= 8
    np.testing.assert_allclose(float(ema_sh), float(ema_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_sh.params.xyz),
                               np.asarray(s2_ref.params.xyz), atol=5e-5)
    np.testing.assert_allclose(np.asarray(s2_sh.params.logit_opacity),
                               np.asarray(s2_ref.params.logit_opacity),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(a2_sh.mu.xyz),
                               np.asarray(a2_ref.mu.xyz), atol=5e-5)


def test_ring_compositing_matches_single_device(rng):
    """Beyond-HBM prototype: surfel pool depth-partitioned over 8 "model"
    shards, per-shard rendering + ring (T, S) carry fold over ppermute
    must equal the monolithic single-device render (SURVEY §5 ring
    analog; VERDICT r1 next-step #10)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from splatloam_tpu.parallel.ring import (depth_partition_shards,
                                             ring_render)
    surf, adam, K, T_cw, depth, valid = _setup(rng)
    mesh = make_mesh(data=1, model=8)
    params = RenderParams(height=H, width=W, backend="jnp")

    perm = depth_partition_shards(surf, T_cw, 8)
    surf_p = S.Surfels(
        params=S.SurfelParams(*(a[perm] for a in surf.params)),
        active=surf.active[perm])
    shard = NamedSharding(mesh, P("model"))
    params_sh = S.SurfelParams(*(jax.device_put(a, shard)
                                 for a in surf_p.params))
    active_sh = jax.device_put(surf_p.active, shard)

    out = ring_render(mesh, params)(params_sh, active_sh, T_cw, K)

    from splatloam_tpu.ops.rasterizer.jnp_ref import rasterize_jnp
    ref = rasterize_jnp(surf.params.xyz, surf.scaling, surf.rotation,
                        surf.opacity, T_cw, K, H, W)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth_sum"]),
                               np.asarray(ref["depth_sum"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["normal_sum"]),
                               np.asarray(ref["normal_sum"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["T"]),
                               np.asarray(ref["final_T"]), atol=2e-5)


def test_ring_compositing_gradients_match(rng):
    """Gradients THROUGH the ring fold (autodiff over ppermute/scan) must
    equal monolithic gradients — the beyond-HBM path must support the
    mapper's optimization, not just rendering."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from splatloam_tpu.parallel.ring import (depth_partition_shards,
                                             ring_render)
    from splatloam_tpu.ops.rasterizer.jnp_ref import rasterize_jnp

    surf, adam, K, T_cw, depth, valid = _setup(rng)
    mesh = make_mesh(data=1, model=8)
    params = RenderParams(height=H, width=W, backend="jnp")

    perm = depth_partition_shards(surf, T_cw, 8)
    inv = jnp.argsort(perm)
    surf_p = S.SurfelParams(*(a[perm] for a in surf.params))
    active_p = surf.active[perm]
    shard = NamedSharding(mesh, P("model"))
    params_sh = S.SurfelParams(*(jax.device_put(a, shard) for a in surf_p))
    active_sh = jax.device_put(active_p, shard)
    ring = ring_render(mesh, params)

    def loss_ring(p):
        out = ring(p, active_sh, T_cw, K)
        return (jnp.sum(out["depth_sum"]) * 0.1 + jnp.sum(out["alpha"])
                + 0.5 * jnp.sum(out["normal_sum"]))

    def loss_ref(p):
        scaling = jnp.exp(p.log_scale)
        opacity = jax.nn.sigmoid(p.logit_opacity) * surf.active
        c = rasterize_jnp(p.xyz, scaling, p.quat, opacity, T_cw, K, H, W)
        return (jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])
                + 0.5 * jnp.sum(c["normal_sum"]))

    g_ring = jax.grad(loss_ring)(params_sh)
    g_ref = jax.grad(loss_ref)(surf.params)
    act = np.asarray(surf.active) > 0    # padded slots have norm-at-zero
    for name, gr, gp in zip(S.SurfelParams._fields, g_ref, g_ring):
        gp_unperm = np.asarray(gp)[np.asarray(inv)][act]
        gr = np.asarray(gr)[act]
        scale = float(np.abs(gr).max()) + 1e-8
        np.testing.assert_allclose(gp_unperm, gr,
                                   atol=3e-5 * max(scale, 1.0),
                                   err_msg=name)


def test_ring_render_dist_channel_matches(rng):
    """The distortion-channel segment fold (ring_combine's dist branch)
    must equal the monolithic jnp dist channel — the claim in
    parallel/ring.py's module docstring, exercised end to end."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from splatloam_tpu.parallel.ring import (depth_partition_shards,
                                             ring_render)
    surf, adam, K, T_cw, depth, valid = _setup(rng)
    mesh = make_mesh(data=1, model=8)
    params = RenderParams(height=H, width=W, backend="jnp")

    perm = depth_partition_shards(surf, T_cw, 8)
    surf_p = S.Surfels(
        params=S.SurfelParams(*(a[perm] for a in surf.params)),
        active=surf.active[perm])
    shard = NamedSharding(mesh, P("model"))
    params_sh = S.SurfelParams(*(jax.device_put(a, shard)
                                 for a in surf_p.params))
    active_sh = jax.device_put(surf_p.active, shard)

    out = ring_render(mesh, params, with_dist=True)(params_sh, active_sh,
                                                    T_cw, K)
    from splatloam_tpu.ops.rasterizer.jnp_ref import rasterize_jnp
    ref = rasterize_jnp(surf.params.xyz, surf.scaling, surf.rotation,
                        surf.opacity, T_cw, K, H, W)
    np.testing.assert_allclose(np.asarray(out["dist"]),
                               np.asarray(ref["dist"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_ring_optimize_matches_single_device(rng, tmp_path, mesh_shape):
    """sharded_optimize_ring (depth-band sharding over "model" + ring
    compositing, tile-DP over "data") must match the single-device pallas
    optimize loop: same iteration count, same EMA loss, same final pool
    up to the depth re-partition's slot permutation (VERDICT r3 ask #3).

    n_model > 1 specifically exercises the channel-loss /n_model
    pre-division and the replicated psum'd loss (the round-3 advisor
    findings); opt_scaling_max is set BELOW the densify init scales so
    the band-local reg term is active — a mis-scaled channel gradient
    (which Adam's scale invariance would otherwise hide) changes the
    channel:reg ratio and the loss scalar, blowing past these
    tolerances.  Residual diffs come from the per-band Pallas early
    exit (each band restarts transmittance at 1, so T_EPS truncation
    composites slightly differently than the monolithic pass)."""
    import synthetic
    from splatloam_tpu.parallel.sharded import sharded_optimize_ring
    from splatloam_tpu.slam.mapper import (KeyframeBatch, MapperPrograms,
                                           sample_geometric_probs)

    cfg = synthetic.make_config(
        tmp_path,
        mapping={"num_iterations": 3, "densify_percentage": 0.1,
                 "opt_scaling_max": 0.05},
        compute={"backend": "pallas", "rebin_every": 4,
                 "tile_list_capacity": 512})
    h, w = 16, 256
    progs = MapperPrograms(cfg, h, w, CAP)
    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    sh_opt = sharded_optimize_ring(mesh, progs.params, progs.hyper,
                                   cfg.mapping, cfg.compute,
                                   cfg.opt.depth_ratio)

    cam = _camera(rng, h, w)
    key = jax.random.PRNGKey(7)
    s_ref, a_ref, _, _ = progs._densify(S.empty_surfels(CAP),
                                        S.empty_adam(CAP), cam, key,
                                        initialize=True)

    kf_cap = 8
    probs = sample_geometric_probs(1, 0.4, kf_cap)
    log_probs = np.full((kf_cap,), -np.inf, np.float32)
    log_probs[0] = np.log(probs[0])

    def pad(x1):
        return jnp.concatenate(
            [x1[None], jnp.zeros((kf_cap - 1,) + x1.shape, x1.dtype)])

    kf = KeyframeBatch(K=pad(cam.K), T_cw=pad(cam.T_cw),
                       depth=pad(cam.depth), valid=pad(cam.valid),
                       log_probs=jnp.asarray(log_probs))
    okey = jax.random.PRNGKey(3)
    s2_ref, a2_ref, ema_ref, it_ref = progs._optimize(s_ref, a_ref, kf,
                                                      okey)
    surf_sh, adam_sh = shard_model_state(mesh, s_ref, a_ref)
    s2_sh, a2_sh, ema_sh, it_sh = sh_opt(surf_sh, adam_sh, kf, okey)
    assert int(it_sh) == int(it_ref) >= 4
    np.testing.assert_allclose(float(ema_sh), float(ema_ref), rtol=1e-4)

    # the ring reshard permutes pool slots: pair the ACTIVE surfels by
    # nearest neighbor (trajectories track to ~mm, surfel spacing is
    # ~dm) and require the pairing to be a bijection
    act_r = np.asarray(s2_ref.active)
    act_s = np.asarray(s2_sh.active)
    xr = np.asarray(s2_ref.params.xyz)[act_r]
    xs = np.asarray(s2_sh.params.xyz)[act_s]
    assert xr.shape == xs.shape
    dist = np.linalg.norm(xs[:, None, :] - xr[None, :, :], axis=-1)
    j = dist.argmin(1)
    assert len(set(j.tolist())) == len(j), "slot pairing not a bijection"
    assert float(dist.min(1).max()) < 0.05

    for name, a, b, tol in [
            ("logit_opacity", s2_sh.params.logit_opacity,
             s2_ref.params.logit_opacity, 0.05),
            ("log_scale", s2_sh.params.log_scale,
             s2_ref.params.log_scale, 0.05),
            ("mu_xyz", a2_sh.mu.xyz, a2_ref.mu.xyz, 5e-3)]:
        np.testing.assert_allclose(np.asarray(a)[act_s],
                                   np.asarray(b)[act_r][j], atol=tol,
                                   err_msg=name)
    assert int(a2_sh.step) == int(a2_ref.step)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_step_matches_single_device(rng, mesh_shape):
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    surf, adam, K, T_cw, depth, valid = _setup(rng)
    hyper = S.AdamHyper()
    ref_surf, ref_adam, ref_loss = _single_device_reference(
        surf, adam, K, T_cw, depth, valid, hyper)

    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    params = RenderParams(height=H, width=W, backend="jnp")
    step = sharded_train_step(mesh, params, hyper,
                              lambda_alpha=0.1, lambda_normal=0.1,
                              scaling_max=0.5, scaling_max_penalty=0.2)
    surf_sh, adam_sh = shard_model_state(mesh, surf, adam)
    new_surf, new_adam, loss = step(surf_sh, adam_sh, K, T_cw, depth,
                                    valid)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(new_surf.params.xyz),
                               np.asarray(ref_surf.params.xyz),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_adam.mu.xyz),
                               np.asarray(ref_adam.mu.xyz), atol=1e-5)
    assert int(new_adam.step) == 1


def test_tile_deal_balances_load(rng):
    """The snake tile deal must equalize per-shard binned counts on a
    geometry where contiguous row blocks are badly imbalanced (dense
    ground band + empty sky) — the docs/ARCHITECTURE.md scaling-model
    claim, measured."""
    from splatloam_tpu.ops.rasterizer import binning, common
    from splatloam_tpu.geometry import se3

    # ground-heavy scene: most splats project into the bottom rows
    n = 3000
    gx = rng.uniform(-10, 10, n)
    gy = rng.uniform(-10, 10, n)
    xyz = np.stack([gx, gy, np.full(n, -1.6)], -1).astype(np.float32)
    xyz[: n // 4, 2] = rng.uniform(0.5, 2.0, n // 4)   # some wall/sky
    nrm = np.tile(np.array([[0, 0, 1.0]], np.float32), (n, 1))
    quat = np.asarray(se3.quat_from_normal(jnp.asarray(nrm)))
    scales = np.full((n, 2), 0.25, np.float32)
    opac = np.full((n,), 0.9, np.float32)
    from splatloam_tpu.geometry import spherical
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(xyz), H, W)
    packed = common.pack_surfels(jnp.asarray(xyz), jnp.asarray(scales),
                                 jnp.asarray(quat), jnp.asarray(opac),
                                 jnp.eye(4), K)
    lists, counts, _ = binning.build_tile_lists_sorted(
        packed, H, W, 8, 32, 512)
    counts = np.asarray(counts)                       # [T] tiles (2 x 8)
    n_sh = 4
    ty, tx = H // 8, W // 32

    # row-block shards: contiguous tile-row bands... with ty=2 use column
    # split of the SAME imbalance story: contiguous tile blocks
    blocks = counts.reshape(n_sh, -1).sum(axis=1)

    # snake deal by count
    order = np.argsort(-counts)
    mat = order.reshape(-1, n_sh)
    mat[1::2] = mat[1::2, ::-1]
    dealt = counts[mat].sum(axis=0)

    imb_block = blocks.max() / max(blocks.mean(), 1.0)
    imb_deal = dealt.max() / max(dealt.mean(), 1.0)
    assert imb_deal < 1.05, (imb_deal, dealt)
    assert imb_deal <= imb_block + 1e-6, (imb_deal, imb_block)


def test_compact_param_comms_tracks_fp32(rng, tmp_path):
    """compact_param_comms (f16 all-gather for non-position params,
    parallel/sharded._gather_model) must track the fp32-comms run: same
    iteration count, EMA loss within a small relative band, positions
    within the f16 quantum's effect on one optimize block.  xyz itself
    still rides fp32, so position agreement stays tight."""
    import synthetic
    from splatloam_tpu.parallel.sharded import sharded_optimize_tiles
    from splatloam_tpu.slam.mapper import (KeyframeBatch, MapperPrograms,
                                           sample_geometric_probs)

    h, w = 16, 256
    results = {}
    for compact in (False, True):
        cfg = synthetic.make_config(
            tmp_path,
            mapping={"num_iterations": 7, "densify_percentage": 0.1},
            compute={"backend": "pallas", "rebin_every": 4,
                     "tile_list_capacity": 512,
                     "compact_param_comms": compact})
        progs = MapperPrograms(cfg, h, w, CAP)
        mesh = make_mesh(data=4, model=2)
        sh_opt = sharded_optimize_tiles(mesh, progs.params, progs.hyper,
                                        cfg.mapping, cfg.compute,
                                        cfg.opt.depth_ratio)
        cam = _camera(rng, h, w)
        key = jax.random.PRNGKey(7)
        s_ref, a_ref, _, _ = progs._densify(
            S.empty_surfels(CAP), S.empty_adam(CAP), cam, key,
            initialize=True)
        kf_cap = 8
        log_probs = np.full((kf_cap,), -np.inf, np.float32)
        log_probs[0] = 0.0

        def pad(x1):
            return jnp.concatenate(
                [x1[None], jnp.zeros((kf_cap - 1,) + x1.shape, x1.dtype)])

        kf = KeyframeBatch(K=pad(cam.K), T_cw=pad(cam.T_cw),
                           depth=pad(cam.depth), valid=pad(cam.valid),
                           log_probs=jnp.asarray(log_probs))
        surf_sh, adam_sh = shard_model_state(mesh, s_ref, a_ref)
        s2, _, ema, it = sh_opt(surf_sh, adam_sh, kf, jax.random.PRNGKey(3))
        results[compact] = (np.asarray(s2.params.xyz), float(ema), int(it))

    xyz32, ema32, it32 = results[False]
    xyz16, ema16, it16 = results[True]
    assert it16 == it32
    assert ema16 == pytest.approx(ema32, rel=0.02)
    # one block of f16-rounded quat/scale/opacity perturbs the gradient
    # flow but must not move converged positions perceptibly
    assert np.median(np.abs(xyz16 - xyz32)) < 5e-3
