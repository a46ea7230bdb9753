"""Mapper: densify -> optimize -> prune, as jitted static-shape programs.

Re-architects ref slam/mapper.py:20-233 for XLA:

  * densify (ref :49-138): candidate mask from rendered alpha + optional
    depth-error quantile; weighted sampling *without replacement* via
    Gumbel-top-k (replaces torch.multinomial); back-projection; KNN scale
    init; normal-aligned rotations; scatter into free surfel slots.
  * optimize (ref :140-214): a single lax.scan over Adam iterations, each
    sampling a keyframe from a padded [K_cap] stack with geometric replay
    probabilities (ref utils/sampling_utils.py:10-19) and applying the
    paper's losses Eq 15-17.
  * prune (ref :216-233): mask-clear by opacity/scale thresholds.

All three are built once per (image size, capacity) by ``MapperPrograms``;
capacity growth triggers an amortized recompile.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Configuration
from ..geometry import se3, spherical
from ..logging_utils import get_logger
from ..model import surfels as S
from ..model.camera import Camera
from ..model.frame import Frame
from ..model.local_model import LocalModel
from ..ops import knn
from ..ops.rasterizer import RenderParams, render

logger = get_logger("mapper")


class KeyframeBatch(NamedTuple):
    """Padded stack of keyframe cameras, leading dim [K_cap]."""
    K: jax.Array       # [Kc, 3, 3]
    T_cw: jax.Array    # [Kc, 4, 4]
    depth: jax.Array   # [Kc, H, W]
    valid: jax.Array   # [Kc, H, W] bool
    log_probs: jax.Array  # [Kc] replay distribution (-inf padding)


def sample_geometric_probs(n: int, last_kf_prob: float | None,
                           kf_cap: int) -> np.ndarray:
    """Keyframe replay distribution, padded to kf_cap.

    Mirrors ref utils/sampling_utils.py:10-19 + slam/mapper.py:143-149:
    P(kf i) proportional to (1-p)^(i-1) * p over the insertion-ordered list;
    uniform when p is None/negative; delta when one keyframe.
    """
    if n == 1:
        probs = np.array([1.0])
    elif last_kf_prob is None or last_kf_prob < 0.0:
        probs = np.full((n,), 1.0 / n)
    else:
        i = np.arange(1, n + 1, dtype=np.float64)
        probs = (1.0 - last_kf_prob) ** (i - 1) * last_kf_prob
        probs /= probs.sum()
    out = np.zeros((kf_cap,), np.float32)
    out[:n] = probs
    return out


def run_block_loop(surfels, adam, log_probs, key, *, num_iters: int,
                   rebin: int, early: bool, patience_blocks: int,
                   es_threshold: float, make_tiles, one_iter,
                   views: int = 1, reshard=None):
    """Shared optimize scaffold: while_loop over rebin-blocks with EMA
    early stopping (used by both the single-device jit program and the
    shard_map'd multi-device program — keeping their iteration schedules,
    keyframe sampling and stopping rules bitwise-identical).

    make_tiles(surfels, kf_idx) -> frozen tile assignment (or None);
    one_iter(surfels, adam, kf_idx, tiles) -> (surfels, adam, loss);
    reshard(surfels, adam, kf_idx) -> (surfels, adam), an optional
    shape-preserving re-layout applied at each block start (the ring
    path's per-view depth partitioning; slot order is free to change —
    every consumer goes through the active mask).
    """
    n_blocks = (num_iters + rebin - 1) // rebin
    keys = jax.random.split(key, n_blocks)

    def block_body(state):
        surf, st, ema, best, stalled, b = state
        kf_idx = jax.random.categorical(
            keys[b], log_probs, shape=(views,) if views > 1 else None)
        if reshard is not None:
            surf, st = reshard(surf, st, kf_idx)
        tiles = make_tiles(surf, kf_idx)

        def inner(_, c2):
            surf, st, ema = c2
            surf, st, loss = one_iter(surf, st, kf_idx, tiles)
            ema = jnp.where(jnp.isnan(ema), loss, 0.1 * loss + 0.9 * ema)
            return (surf, st, ema)

        surf, st, ema = jax.lax.fori_loop(0, rebin, inner, (surf, st, ema))
        improved = ema < best * (1.0 - es_threshold)
        best = jnp.minimum(best, ema)
        stalled = jnp.where(improved, 0, stalled + 1)
        return (surf, st, ema, best, stalled, b + 1)

    def block_cond(state):
        _, _, _, _, stalled, b = state
        keep = b < n_blocks
        if early:
            # early stopping (cfg early_stop_*: declared but unused in
            # the reference; implemented here as a real while_loop exit)
            keep = keep & (stalled < patience_blocks)
        return keep

    state = (surfels, adam, jnp.float32(jnp.nan), jnp.float32(jnp.inf),
             jnp.int32(0), jnp.int32(0))
    surfels, adam, ema, _, _, n_run = jax.lax.while_loop(
        block_cond, block_body, state)
    return surfels, adam, ema, n_run * rebin


def densify_core(surfels: S.Surfels, adam: S.AdamState, camera: Camera,
                 key, pkg, *, mc, max_new: int, height: int, width: int):
    """Densification math on full-image channels (ref slam/mapper.py:49-138).

    ``pkg`` is None on model initialization, else a dict with full-image
    ``rend_alpha`` / ``surf_depth``.  Pure function of full (unsharded)
    arrays so the sharded path can row-shard only the render and reuse
    everything else verbatim.
    """
    valid = camera.valid
    if pkg is None:
        densify_mask = valid
    else:
        mask_opacity = pkg["rend_alpha"] <= mc.densify_threshold_opacity
        densify_mask = mask_opacity & valid
        if mc.densify_threshold_egeom > 0.0:
            est = pkg["surf_depth"]
            geom_loss = jnp.abs(camera.depth - est) * valid
            q95 = jnp.quantile(geom_loss, 0.95)
            mask_depth = (est > camera.depth) & (geom_loss > q95)
            densify_mask = densify_mask | mask_depth

    n_cand = jnp.sum(densify_mask)
    n_samples = (mc.densify_percentage * n_cand).astype(jnp.int32)

    grad = spherical.depth_gradient(camera.depth, valid)
    grad = grad / jnp.maximum(jnp.max(grad), 1e-12)
    weight = jnp.where(densify_mask, grad, 0.0).reshape(-1)
    # no-op conditions (ref :82-91): <2 samples or all-zero weights
    do_densify = (n_samples >= 2) & (jnp.sum(weight) > 1e-5)
    n_samples = jnp.minimum(n_samples,
                            jnp.sum(weight > 0).astype(jnp.int32))
    n_samples = jnp.where(do_densify, n_samples, 0)

    # Gumbel-top-k == weighted sampling without replacement
    g = jax.random.gumbel(key, weight.shape)
    scores = jnp.where(weight > 0, jnp.log(weight) + g, -jnp.inf)
    _, flat_idx = jax.lax.top_k(scores, max_new)
    chosen = jnp.arange(max_new) < jnp.minimum(n_samples, max_new)

    pts_model = spherical.depth_to_points(
        camera.depth, camera.K, se3.invert_T(camera.T_cw))
    new_xyz = pts_model.reshape(-1, 3)[flat_idx]

    # scale init: 3-NN over (new + existing) points (ref :113-117)
    all_pts = jnp.concatenate([new_xyz, surfels.params.xyz], axis=0)
    all_mask = jnp.concatenate([chosen, surfels.active])
    d2 = knn.mean_sq_dist_knn(all_pts, all_mask)[:max_new]
    d2 = jnp.clip(d2, 1e-7, mc.opt_scaling_max ** 2)
    new_log_scale = jnp.tile(0.5 * jnp.log(d2)[:, None], (1, 2))

    # rotation init: sensor-frame normals -> model frame (ref :121-124)
    R_mf = camera.T_cw[:3, :3].T
    n_img = camera.normal.reshape(-1, 3)[flat_idx]
    n_model = n_img @ R_mf.T
    # guard degenerate normals for padding rows
    n_norm = jnp.linalg.norm(n_model, axis=-1, keepdims=True)
    n_model = jnp.where(n_norm > 1e-6, n_model,
                        jnp.array([0.0, 0.0, 1.0]))
    new_quat = se3.quat_from_normal(n_model)

    new_logit_op = jnp.full((max_new,), S.inverse_sigmoid(0.9),
                            jnp.float32)
    new_params = S.SurfelParams(xyz=new_xyz, log_scale=new_log_scale,
                                quat=new_quat,
                                logit_opacity=new_logit_op)
    surfels, adam, n_written = S.insert_surfels(
        surfels, adam, new_params, n_samples)

    sampled_mask = jnp.zeros((height * width,), bool)
    sampled_mask = sampled_mask.at[flat_idx].set(chosen)
    return surfels, adam, n_written, sampled_mask.reshape(height, width)


def prune_core(surfels: S.Surfels, *, mc):
    """Prune mask by opacity/scale thresholds (ref slam/mapper.py:216-233).

    Elementwise over the surfel pool, so it runs unchanged on sharded
    state (GSPMD propagates the "model"-axis sharding through it).
    """
    prune = jnp.zeros((surfels.capacity,), bool)
    if mc.pruning_min_opacity and mc.pruning_min_opacity > 0:
        op = jax.nn.sigmoid(surfels.params.logit_opacity)
        prune = prune | (op < mc.pruning_min_opacity)
    if mc.pruning_min_size and mc.pruning_min_size > 0:
        snorm = jnp.linalg.norm(jnp.exp(surfels.params.log_scale),
                                axis=-1)
        prune = prune | (snorm < mc.pruning_min_size)
    prune = prune & surfels.active
    return S.prune_surfels(surfels, prune), jnp.sum(prune)


class MapperPrograms:
    """Jitted mapping programs specialized to (H, W, capacity)."""

    def __init__(self, cfg: Configuration, height: int, width: int,
                 capacity: int):
        self.cfg = cfg
        mc = cfg.mapping
        oc = cfg.opt
        cc = cfg.compute
        self.height, self.width, self.capacity = height, width, capacity
        # pool-size-adaptive kernel geometry: small pools want bigger
        # tiles (api.adaptive_geometry, measured docs/PERF.md); the pool
        # capacity doubling re-specializes these programs anyway
        if getattr(cc, "auto_tile", False):
            from ..ops.rasterizer.api import adaptive_geometry, \
                fit_geometry
            geo = fit_geometry(adaptive_geometry(capacity), height, width)
            tile_h, tile_w = geo["tile_h"], geo["tile_w"]
            chunk, cap_k = geo["chunk"], geo["tile_list_capacity"]
        else:
            tile_h, tile_w = cc.tile_h, cc.tile_w
            chunk, cap_k = cc.chunk, cc.tile_list_capacity
        # tile lists can't usefully exceed ~capacity/8 entries (scatter and
        # DMA costs scale with T*K); shrink K for small pools
        k_eff = min(int(cap_k),
                    max(int(chunk), (capacity // 8 // chunk) * chunk))
        self.params = RenderParams(
            height=height, width=width, backend=cc.backend.value,
            chunk=chunk, tile_h=tile_h, tile_w=tile_w,
            tile_list_capacity=k_eff, scatter=cc.scatter,
            # mapping losses use expected depth only (+ median iff
            # depth_ratio > 0); the distortion channel is never in the loss
            with_median=oc.depth_ratio > 0, with_dist=False)
        self.max_new = int(np.ceil(
            max(mc.densify_percentage, 1e-3) * height * width)) + 1
        self.hyper = S.AdamHyper(lr_xyz=oc.position_lr,
                                 lr_scale=oc.scaling_lr,
                                 lr_quat=oc.rotation_lr,
                                 lr_opacity=oc.opacity_lr)
        self._densify = jax.jit(partial(self._densify_impl),
                                static_argnames=("initialize",))
        self._optimize = jax.jit(self._optimize_impl)
        self._prune = jax.jit(self._prune_impl)

    # ------------------------------------------------------------------
    # densify (ref slam/mapper.py:49-138)
    # ------------------------------------------------------------------
    def _densify_impl(self, surfels: S.Surfels, adam: S.AdamState,
                      camera: Camera, key, *, initialize: bool):
        if initialize:
            pkg = None
        else:
            pkg = render(surfels.params.xyz, surfels.scaling,
                         surfels.rotation, surfels.opacity,
                         camera.T_cw, camera.K, self.params,
                         self.cfg.opt.depth_ratio)
        return densify_core(surfels, adam, camera, key, pkg,
                            mc=self.cfg.mapping, max_new=self.max_new,
                            height=self.height, width=self.width)

    # ------------------------------------------------------------------
    # optimize (ref slam/mapper.py:140-214)
    # ------------------------------------------------------------------
    def _loss(self, params: S.SurfelParams, active, kf: KeyframeBatch,
              kf_idx, tiles=None):
        mc = self.cfg.mapping
        cam_K = kf.K[kf_idx]
        cam_T = kf.T_cw[kf_idx]
        gt_depth = kf.depth[kf_idx]
        valid = kf.valid[kf_idx]

        scaling = jnp.exp(params.log_scale)
        opacity = jax.nn.sigmoid(params.logit_opacity) * active
        pkg = render(params.xyz, scaling, params.quat, opacity,
                     cam_T, cam_K, self.params, self.cfg.opt.depth_ratio,
                     tiles=tiles)

        est_alpha = pkg["rend_alpha"]
        est_depth = pkg["surf_depth"]
        est_normal = pkg["rend_normal"]
        surf_normal = pkg["surf_normal"]
        validf = valid.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(validf), 1.0)

        # depth L1: mean over ALL pixels of |valid * (est - gt)| (ref :174)
        geom_l1 = jnp.mean(jnp.abs(validf * (est_depth - gt_depth)))
        # Eq 15: normal consistency on valid pixels (ref :177-180)
        ndot = jnp.sum(est_normal * surf_normal, axis=-1)
        normal_loss = jnp.sum((1.0 - ndot) * validf) / n_valid
        normal_loss = normal_loss * mc.opt_lambda_normal
        # Eq 16: BCE(alpha, valid) on valid pixels (targets are 1) (ref :182)
        a = jnp.clip(est_alpha, 1e-7, 1.0 - 1e-7)
        alpha_loss = jnp.sum(-jnp.log(a) * validf) / n_valid
        alpha_loss = alpha_loss * mc.opt_lambda_alpha
        # Eq 17: scale-overflow penalty on active surfels (ref :190-195)
        smax = jnp.max(scaling, axis=-1)
        over = jnp.maximum(smax - mc.opt_scaling_max, 0.0) * active
        reg_scales = mc.opt_scaling_max_penalty * jnp.sum(over)

        return geom_l1 + alpha_loss + normal_loss + reg_scales

    def _loss_multi(self, params: S.SurfelParams, active,
                    kf: KeyframeBatch, kf_idx, tiles=None):
        """views_per_iteration > 1: average the per-view losses of B
        sampled keyframes, rendered through ONE batched kernel launch
        (amortizes per-iteration overhead; B=1 == reference semantics)."""
        from ..ops.rasterizer.api import render_batch
        mc = self.cfg.mapping
        cam_K = kf.K[kf_idx]               # [B, 3, 3]
        cam_T = kf.T_cw[kf_idx]
        gt_depth = kf.depth[kf_idx]        # [B, H, W]
        valid = kf.valid[kf_idx]

        scaling = jnp.exp(params.log_scale)
        opacity = jax.nn.sigmoid(params.logit_opacity) * active
        pkg = render_batch(params.xyz, scaling, params.quat, opacity,
                           cam_T, cam_K, self.params,
                           self.cfg.opt.depth_ratio, tiles=tiles)

        validf = valid.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(validf, axis=(1, 2)), 1.0)  # [B]
        geom_l1 = jnp.mean(jnp.abs(validf * (pkg["surf_depth"]
                                             - gt_depth)), axis=(1, 2))
        ndot = jnp.sum(pkg["rend_normal"] * pkg["surf_normal"], axis=-1)
        normal_loss = (jnp.sum((1.0 - ndot) * validf, axis=(1, 2))
                       / n_valid) * mc.opt_lambda_normal
        a = jnp.clip(pkg["rend_alpha"], 1e-7, 1.0 - 1e-7)
        alpha_loss = (jnp.sum(-jnp.log(a) * validf, axis=(1, 2))
                      / n_valid) * mc.opt_lambda_alpha
        smax = jnp.max(scaling, axis=-1)
        over = jnp.maximum(smax - mc.opt_scaling_max, 0.0) * active
        reg_scales = mc.opt_scaling_max_penalty * jnp.sum(over)

        return jnp.mean(geom_l1 + alpha_loss + normal_loss) + reg_scales

    def _optimize_impl(self, surfels: S.Surfels, adam: S.AdamState,
                       kf: KeyframeBatch, key):
        from ..ops.rasterizer.api import prepare_tiles, prepare_tiles_batch
        mc = self.cfg.mapping
        views = max(1, int(mc.views_per_iteration or 1))
        grad_fn = jax.value_and_grad(
            self._loss if views == 1 else self._loss_multi)
        # amortized rebinning: a keyframe view + its tile lists are held
        # fixed for rebin_every consecutive Adam steps (exact when 1; the
        # binning radius carries a pixel margin to absorb parameter drift)
        rebin = max(1, int(self.cfg.compute.rebin_every))

        def make_tiles(surf, kf_idx):
            scaling = jnp.exp(surf.params.log_scale)
            opacity = jax.nn.sigmoid(surf.params.logit_opacity) * \
                surf.active
            prep = prepare_tiles if views == 1 else prepare_tiles_batch
            return prep(surf.params.xyz, scaling,
                        surf.params.quat, opacity,
                        kf.T_cw[kf_idx], kf.K[kf_idx],
                        self.params,
                        margin_px=self.cfg.compute.bin_margin_px)

        def one_iter(surf, st, kf_idx, tiles):
            loss, grads = grad_fn(surf.params, surf.active, kf, kf_idx,
                                  tiles)
            surf, st = S.adam_step(surf, st, grads, self.hyper)
            return surf, st, loss

        return run_block_loop(
            surfels, adam, kf.log_probs, key,
            num_iters=mc.num_iterations + 1,  # ref :150
            rebin=rebin, early=bool(mc.early_stop_enable),
            patience_blocks=max(1, int((mc.early_stop_patience or 100)
                                       // rebin)),
            es_threshold=float(mc.early_stop_threshold or 0.01),
            make_tiles=make_tiles, one_iter=one_iter, views=views)

    # ------------------------------------------------------------------
    # prune (ref slam/mapper.py:216-233)
    # ------------------------------------------------------------------
    def _prune_impl(self, surfels: S.Surfels):
        return prune_core(surfels, mc=self.cfg.mapping)


class Mapper:
    """Host-side orchestration around MapperPrograms
    (ref slam/mapper.py:20-47).

    With cfg.parallel.data*model > 1 the optimize phase runs through the
    sharded train step (parallel/sharded.py): surfels/Adam sharded over the
    "model" axis, image rows over "data", keyframes sampled host-side per
    iteration.
    """

    def __init__(self, cfg: Configuration):
        self.cfg = cfg
        self.model: LocalModel | None = None
        self._programs: dict[tuple, MapperPrograms] = {}
        self._key = jax.random.PRNGKey(0)
        self._mesh = None
        self._sharded_steps: dict[tuple, object] = {}
        pc = cfg.parallel
        if pc.data * pc.model > 1:
            from ..parallel import make_mesh
            self._mesh = make_mesh(data=pc.data, model=pc.model)

    def register_model(self, model: LocalModel) -> None:
        self.model = model

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def programs_for(self, height: int, width: int,
                     capacity: int) -> MapperPrograms:
        sig = (height, width, capacity)
        if sig not in self._programs:
            self._programs[sig] = MapperPrograms(self.cfg, *sig)
        return self._programs[sig]

    def _stack_keyframes(self, kf_cap: int) -> KeyframeBatch:
        """Keyframe batch from the model's incremental device-side stack
        (no per-update host round trips)."""
        model = self.model
        n = len(model.keyframes)
        if model.kf_stack is None or \
                model.kf_stack["K"].shape[0] != kf_cap:
            model.rebuild_kf_stack()
        stack = model.kf_stack
        probs = sample_geometric_probs(
            n, self.cfg.mapping.prob_view_last_keyframe, kf_cap)
        log_probs = np.full((kf_cap,), -np.inf, np.float32)
        log_probs[:n] = np.log(np.maximum(probs[:n], 1e-30))
        return KeyframeBatch(
            K=stack["K"], T_cw=stack["T_cw"], depth=stack["depth"],
            valid=stack["valid"], log_probs=jnp.asarray(log_probs))

    def _sharded_programs(self, progs: MapperPrograms):
        """Build (once per program signature) the fully device-resident
        sharded densify/optimize/prune programs (parallel/sharded.py).

        Replaces the round-1 host-loop `_optimize_sharded`: the whole
        optimize schedule (keyframe sampling, rebinning, early stop) now
        runs inside ONE jitted shard_map while_loop — no per-iteration
        host sync or keyframe re-staging."""
        from ..parallel.sharded import (sharded_densify, sharded_optimize,
                                        sharded_optimize_ring,
                                        sharded_optimize_tiles,
                                        sharded_prune)

        mc = self.cfg.mapping
        part = self.cfg.parallel.partition
        if part == "auto":
            from ..ops.rasterizer.api import _resolve_backend
            part = ("tiles"
                    if _resolve_backend(progs.params.backend) == "pallas"
                    else "rows")
        builders = {"tiles": sharded_optimize_tiles,
                    "ring": sharded_optimize_ring,
                    "rows": sharded_optimize}
        if part not in builders:
            raise ValueError(f"unknown parallel.partition {part!r}; "
                             f"expected one of {sorted(builders)} or auto")
        opt_builder = builders[part]
        sig = (progs.height, progs.width, progs.capacity)
        if sig not in self._sharded_steps:
            self._sharded_steps[sig] = {
                "densify": sharded_densify(
                    self._mesh, progs.params, mc, progs.max_new,
                    self.cfg.opt.depth_ratio),
                "optimize": opt_builder(
                    self._mesh, progs.params, progs.hyper, mc,
                    self.cfg.compute, self.cfg.opt.depth_ratio),
                "prune": sharded_prune(self._mesh, mc),
            }
        return self._sharded_steps[sig]

    def hyper_for(self, progs: MapperPrograms):
        return progs.hyper

    def render_frame(self, frame: Frame) -> dict:
        """Render the current model at a frame's camera (for the per-frame
        observability images, ref slam/slam.py:81-92)."""
        model = self.model
        cam = frame.camera_in_model()
        progs = self.programs_for(cam.height, cam.width, model.capacity)
        if not hasattr(self, "_render_jit"):
            self._render_jit = jax.jit(
                render, static_argnames=("params", "depth_ratio"))
        s = model.surfels
        if self._mesh is not None:
            # logging-only path: replicate the sharded pool on the default
            # device rather than teaching the render jit its sharding
            s = jax.tree_util.tree_map(
                lambda a: jnp.asarray(np.asarray(a)), s)
        return self._render_jit(
            s.params.xyz, s.scaling, s.rotation, s.opacity, cam.T_cw,
            cam.K, params=progs.params,
            depth_ratio=self.cfg.opt.depth_ratio)

    def update_model(self, frame: Frame, initialize_model: bool = False
                     ) -> None:
        """densify -> optimize -> prune (ref slam/mapper.py:33-47)."""
        model = self.model
        cam = frame.camera_in_model()
        h, w = cam.height, cam.width

        from ..profiling import get_profiler
        prof = get_profiler()
        progs = self.programs_for(h, w, model.capacity)
        model.ensure_free_slots(progs.max_new)
        if model.capacity != progs.capacity:
            progs = self.programs_for(h, w, model.capacity)
        sharded = (self._sharded_programs(progs)
                   if self._mesh is not None else None)
        if sharded is not None:
            # keep the pool device-resident in its sharded layout (no-op
            # once placed; re-shards after host-side capacity growth)
            from ..parallel.sharded import shard_model_state
            model.surfels, model.adam = shard_model_state(
                self._mesh, model.surfels, model.adam)

        with prof.phase("map.densify"):
            if sharded is not None:
                model.surfels, model.adam, n_new, sampled = \
                    sharded["densify"][bool(initialize_model)](
                        model.surfels, model.adam, cam, self._next_key())
            else:
                model.surfels, model.adam, n_new, sampled = progs._densify(
                    model.surfels, model.adam, cam, self._next_key(),
                    initialize=initialize_model)
            n_new = int(n_new)
        logger.info(f"Adding {n_new} new gaussians")
        self._last_densify_mask = sampled
        if self.cfg.logging.enable:
            from ..logging_backends import get_datalogger
            get_datalogger(self.cfg).log_image(
                "frame/densify_mask",
                np.asarray(sampled).astype(np.float32))

        # pad keyframe count to a multiple of keyframe_capacity so the
        # optimize program only recompiles when a new bucket is reached
        bucket = max(int(self.cfg.compute.keyframe_capacity), 1)
        kf_cap = ((len(model.keyframes) + bucket - 1) // bucket) * bucket
        with prof.phase("map.stack_kf"):
            kf = self._stack_keyframes(kf_cap)
        with prof.phase("map.optimize"):
            opt = (sharded["optimize"] if sharded is not None
                   else progs._optimize)
            model.surfels, model.adam, ema, n_iters = opt(
                model.surfels, model.adam, kf, self._next_key())
            ema.block_until_ready()
        logger.debug(f"optimize done after {int(n_iters)} iters, "
                     f"loss_ema={float(ema):.4f}")

        with prof.phase("map.prune"):
            pr = (sharded["prune"] if sharded is not None
                  else progs._prune)
            model.surfels, n_pruned = pr(model.surfels)
            n_pruned = int(n_pruned)
        logger.info(f"Pruning {n_pruned} gaussians")
        self._last_ema = ema
        logger.info(f"Model updated. | No. primitives = "
                    f"{model.no_gaussians}, {model.size_mb:.2f} MB")
