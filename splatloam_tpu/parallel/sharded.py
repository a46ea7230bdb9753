"""Sharded mapping train step: DP over range-image rows x FSDP over surfels.

One optimization iteration of the mapper (render -> losses Eq 15-17 ->
Adam), expressed with shard_map over a ("data", "model") mesh:

  * surfel params/Adam moments live sharded over "model"; a step all-gathers
    the params (bf16-able later), computes, then reduce-scatters gradients
    back to the shard — classic FSDP, over ICI;
  * each "data" shard renders its block of image ROWS (compositing is
    per-pixel, so row blocks are independent); scalar loss terms are
    computed as sums and psum'd across "data" before normalization, making
    the result bitwise-equivalent in expectation to the single-device step;
  * the Adam update runs on the local shard only — no replicated state.

The row shard is expressed by shifting the intrinsics' cy per device, so
the single-device renderer runs unchanged inside shard_map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model import surfels as S
from ..ops.rasterizer import RenderParams, render


def _halo_surf_normal(surf_depth, K_local, T_cw, height, h_local, n_data):
    """surf_normal on a row shard with 1-row halo exchange over "data".

    depth_to_normal needs +-1 rows; neighbors' boundary rows arrive via
    ppermute (ICI neighbor exchange).  Rows at the global image border are
    zeroed exactly like the single-device path.
    """
    from ..geometry import se3, spherical
    up = jax.lax.ppermute(surf_depth[-1:], "data",
                          perm=[(i, i + 1) for i in range(n_data - 1)])
    down = jax.lax.ppermute(surf_depth[:1], "data",
                            perm=[(i + 1, i) for i in range(n_data - 1)])
    ext = jnp.concatenate([up, surf_depth, down], axis=0)
    K_ext = K_local.at[1, 2].add(1.0)  # ext row 0 = local row -1
    normals_ext = spherical.depth_to_normal(ext, K_ext,
                                            se3.invert_T(T_cw))
    normals = normals_ext[1:-1]
    idx = jax.lax.axis_index("data")
    grow = idx * h_local + jnp.arange(h_local)
    border = (grow == 0) | (grow == height - 1)
    return jnp.where(border[:, None, None], 0.0, normals)


def _row_shard_camera(K, height: int, n_data: int):
    """Per-device intrinsics for a block of height/n_data rows."""
    h_local = height // n_data
    idx = jax.lax.axis_index("data")
    row0 = idx * h_local
    K_local = K.at[1, 2].add(-row0.astype(K.dtype))
    return K_local, h_local


def shard_model_state(mesh: Mesh, surfels: S.Surfels, adam: S.AdamState):
    """Place surfel/Adam leaves sharded over the "model" axis."""
    shard = NamedSharding(mesh, P("model"))
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    surfels = S.Surfels(
        params=S.SurfelParams(*(put(a, shard) for a in surfels.params)),
        active=put(surfels.active, shard))
    adam = S.AdamState(
        mu=S.SurfelParams(*(put(a, shard) for a in adam.mu)),
        nu=S.SurfelParams(*(put(a, shard) for a in adam.nu)),
        step=put(adam.step, repl))
    return surfels, adam


def sharded_train_step(mesh: Mesh, params: RenderParams,
                       hyper: S.AdamHyper,
                       lambda_alpha: float, lambda_normal: float,
                       scaling_max: float, scaling_max_penalty: float,
                       depth_ratio: float = 0.0):
    """Build a jitted (surfels, adam, K, T_cw, depth, valid) -> updated
    (surfels, adam, loss) step over the mesh."""
    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    height, width = params.height, params.width
    assert height % n_data == 0, (height, n_data)
    local_params = params._replace(height=height // n_data)

    def step(surf_shard: S.Surfels, adam_shard: S.AdamState,
             K, T_cw, depth_rows, valid_rows):
        # ---- FSDP: materialize full params for compute ----
        full = S.SurfelParams(*(
            jax.lax.all_gather(a, "model", tiled=True)
            for a in surf_shard.params))
        active = jax.lax.all_gather(surf_shard.active, "model", tiled=True)
        K_local, h_local = _row_shard_camera(K, height, n_data)
        validf = valid_rows.astype(jnp.float32)
        # global normalizer (no param dependence): psum OUTSIDE the grad —
        # collectives inside a differentiated function do not transpose to
        # per-shard identity under shard_map, so loss_fn below works purely
        # on LOCAL sums weighted by globally-computed constants.
        v_sum = jnp.maximum(
            jax.lax.psum(jnp.sum(validf), "data"), 1.0)

        def loss_fn(full_params):
            scaling = jnp.exp(full_params.log_scale)
            opacity = jax.nn.sigmoid(full_params.logit_opacity) * active
            pkg = render(full_params.xyz, scaling, full_params.quat,
                         opacity, T_cw, K_local, local_params, depth_ratio)
            l1_sum = jnp.sum(jnp.abs(validf * (pkg["surf_depth"]
                                               - depth_rows)))
            # surf_normal crosses row-shard borders: recompute with halo
            surf_normal = _halo_surf_normal(
                pkg["surf_depth"], K_local, T_cw, height,
                height // n_data, n_data) * pkg["rend_alpha"][..., None]
            ndot = jnp.sum(pkg["rend_normal"] * surf_normal, -1)
            n_sum = jnp.sum((1.0 - ndot) * validf)
            a = jnp.clip(pkg["rend_alpha"], 1e-7, 1.0 - 1e-7)
            a_sum = jnp.sum(-jnp.log(a) * validf)

            smax = jnp.max(scaling, axis=-1)
            over = jnp.maximum(smax - scaling_max, 0.0) * active
            # replicated over data shards; pre-divide so the psum of grads
            # counts it exactly once
            reg = scaling_max_penalty * jnp.sum(over) / n_data
            return (l1_sum / (height * width)
                    + lambda_alpha * a_sum / v_sum
                    + lambda_normal * n_sum / v_sum
                    + reg)

        loss_local, grads = jax.value_and_grad(loss_fn)(full)
        # DP: each data shard's grads cover only its rows; psum over ICI
        # accumulates the exact full-image gradient.
        loss = jax.lax.psum(loss_local, "data")
        grads = S.SurfelParams(*(
            jax.lax.psum(g, "data") for g in grads))
        # ---- FSDP: take the local shard of the gradient.  Along "model"
        # every shard computed the identical full gradient (the data split
        # is on the other axis), so a plain slice replaces the usual
        # reduce-scatter — zero communication on this leg.
        midx = jax.lax.axis_index("model")

        def local_shard(g):
            shard_rows = g.shape[0] // n_model
            return jax.lax.dynamic_slice_in_dim(g, midx * shard_rows,
                                                shard_rows, axis=0)

        grad_shard = S.SurfelParams(*(local_shard(g) for g in grads))
        new_surf, new_adam = S.adam_step(surf_shard, adam_shard,
                                         grad_shard, hyper)
        return new_surf, new_adam, loss

    spec_model = P("model")
    surf_spec = S.Surfels(params=S.SurfelParams(*(spec_model,) * 4),
                          active=spec_model)
    adam_spec = S.AdamState(mu=S.SurfelParams(*(spec_model,) * 4),
                            nu=S.SurfelParams(*(spec_model,) * 4),
                            step=P())
    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(surf_spec, adam_spec, P(), P(), P("data"), P("data")),
        out_specs=(surf_spec, adam_spec, P()),
        check_vma=False)
    return jax.jit(mapped)


# ---------------------------------------------------------------------------
# Production sharded mapper programs: full optimize loop + densify + prune
# running on device-resident sharded state (no per-iteration host sync).
# ---------------------------------------------------------------------------

def _surf_specs():
    spec_model = P("model")
    surf_spec = S.Surfels(params=S.SurfelParams(*(spec_model,) * 4),
                          active=spec_model)
    adam_spec = S.AdamState(mu=S.SurfelParams(*(spec_model,) * 4),
                            nu=S.SurfelParams(*(spec_model,) * 4),
                            step=P())
    return surf_spec, adam_spec


def _gather_model(tree, compact: bool = False):
    """all_gather every leaf along the "model" axis (FSDP materialize).

    ``compact``: gather non-position float leaves in float16 (master
    shards, gradients and all compute stay fp32) — the params gather is
    the largest per-iteration collective (MULTICHIP stats), and
    quat/log_scale/logit_opacity live in [-1, 1]-ish ranges where f16's
    1e-3 absolute error is far below optimization noise.  xyz stays
    fp32: at 50 m range a half-precision position quantum is ~2.4 cm —
    the same order as the depth loss itself (docs/ARCHITECTURE.md
    geometry-precision analysis).  Row bytes 40 -> 26 (-35%)."""
    def ag(a):
        return jax.lax.all_gather(a, "model", tiled=True)

    if not compact:
        return jax.tree_util.tree_map(ag, tree)

    def ag16(a):
        if not jnp.issubdtype(a.dtype, jnp.floating):
            return ag(a)
        return ag(a.astype(jnp.float16)).astype(a.dtype)

    if isinstance(tree, S.SurfelParams):
        return S.SurfelParams(xyz=ag(tree.xyz),
                              log_scale=ag16(tree.log_scale),
                              quat=ag16(tree.quat),
                              logit_opacity=ag16(tree.logit_opacity))
    return jax.tree_util.tree_map(ag16, tree)


def _slice_model(tree, n_model: int):
    """Take the local "model" shard of full-size leaves."""
    midx = jax.lax.axis_index("model")

    def sl(a):
        rows = a.shape[0] // n_model
        return jax.lax.dynamic_slice_in_dim(a, midx * rows, rows, axis=0)

    return jax.tree_util.tree_map(sl, tree)


def _maybe_plan(sub_lists, n_surfels: int, compute_cfg):
    """Gradient-reduction plan for a per-device tile subset, per the
    compute config's ``scatter`` selection: "ranksum" (id-sort +
    rank-windowed one-hot segment sum — measured fastest end-to-end at
    group=128, docs/PERF.md round-5 table), "plan" (occurrence tables),
    or "rmw"/"fused" (None: the in-kernel RMW pool).  See
    api.RenderParams.scatter / docs/PERF.md."""
    from ..ops.rasterizer import binning as BN
    from ..ops.rasterizer import pallas_raster as PR
    scatter = getattr(compute_cfg, "scatter", "rmw")
    if scatter == "ranksum":
        return PR.RanksumPlan(*BN.build_ranksum_plan(
            sub_lists, n_surfels, group=PR._RS_GROUP, gps=PR._RS_GPS,
            trunc_frac=PR._RS_TRUNC))
    if scatter != "plan":
        return None
    return PR.ScatterPlan(*BN.build_scatter_plan(
        sub_lists, n_surfels, m=4,
        ov_cap=max(PR._OV_CHUNK,
                   sub_lists.size // 6 // PR._OV_CHUNK * PR._OV_CHUNK)))


def sharded_optimize(mesh: Mesh, params: RenderParams, hyper: S.AdamHyper,
                     mc, compute_cfg, depth_ratio: float = 0.0):
    """Full mapper optimize loop over the mesh (VERDICT r1 weak #3 fix).

    Device-resident keyframe stack, on-device geometric keyframe sampling,
    rebin-amortized tile lists, EMA early stopping — the exact single-device
    schedule of MapperPrograms._optimize_impl, with each iteration running
    the FSDP("model") x row-DP("data") step of ``sharded_train_step``.
    Works with both the jnp and the Pallas rasterizer backend (the Pallas
    kernels run per-device on the local row block inside shard_map).

    Returns a jitted (surf_shard, adam_shard, kf: KeyframeBatch, key) ->
    (surf_shard, adam_shard, ema_loss, n_iters).
    """
    from ..slam.mapper import run_block_loop

    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    height, width = params.height, params.width
    assert height % n_data == 0, (height, n_data)
    local_params = params._replace(height=height // n_data)
    compact = bool(getattr(compute_cfg, "compact_param_comms", False))
    rebin = max(1, int(compute_cfg.rebin_every))
    margin_px = float(compute_cfg.bin_margin_px)

    def opt(surf_shard: S.Surfels, adam_shard: S.AdamState, kf, key):
        from ..ops.rasterizer.api import prepare_tiles

        def make_tiles(surf, kf_idx):
            full = _gather_model(surf.params, compact)
            active = jax.lax.all_gather(surf.active, "model", tiled=True)
            scaling = jnp.exp(full.log_scale)
            opacity = jax.nn.sigmoid(full.logit_opacity) * active
            K_local, _ = _row_shard_camera(kf.K[kf_idx], height, n_data)
            return prepare_tiles(full.xyz, scaling, full.quat, opacity,
                                 kf.T_cw[kf_idx], K_local, local_params,
                                 margin_px=margin_px)

        def one_iter(surf, st, kf_idx, tiles):
            full = _gather_model(surf.params, compact)
            active = jax.lax.all_gather(surf.active, "model", tiled=True)
            T_cw = kf.T_cw[kf_idx]
            K_local, h_local = _row_shard_camera(kf.K[kf_idx], height,
                                                 n_data)
            depth_rows = kf.depth[kf_idx]
            valid_rows = kf.valid[kf_idx]
            validf = valid_rows.astype(jnp.float32)
            v_sum = jnp.maximum(jax.lax.psum(jnp.sum(validf), "data"), 1.0)

            def loss_fn(full_params):
                scaling = jnp.exp(full_params.log_scale)
                opacity = jax.nn.sigmoid(full_params.logit_opacity) * \
                    active
                pkg = render(full_params.xyz, scaling, full_params.quat,
                             opacity, T_cw, K_local, local_params,
                             depth_ratio, tiles=tiles)
                l1_sum = jnp.sum(jnp.abs(validf * (pkg["surf_depth"]
                                                   - depth_rows)))
                surf_normal = _halo_surf_normal(
                    pkg["surf_depth"], K_local, T_cw, height, h_local,
                    n_data) * pkg["rend_alpha"][..., None]
                ndot = jnp.sum(pkg["rend_normal"] * surf_normal, -1)
                n_sum = jnp.sum((1.0 - ndot) * validf)
                a = jnp.clip(pkg["rend_alpha"], 1e-7, 1.0 - 1e-7)
                a_sum = jnp.sum(-jnp.log(a) * validf)
                smax = jnp.max(scaling, axis=-1)
                over = jnp.maximum(smax - mc.opt_scaling_max, 0.0) * active
                reg = mc.opt_scaling_max_penalty * jnp.sum(over) / n_data
                return (l1_sum / (height * width)
                        + mc.opt_lambda_alpha * a_sum / v_sum
                        + mc.opt_lambda_normal * n_sum / v_sum
                        + reg)

            loss_local, grads = jax.value_and_grad(loss_fn)(full)
            loss = jax.lax.psum(loss_local, "data")
            grads = S.SurfelParams(*(jax.lax.psum(g, "data")
                                     for g in grads))
            grad_shard = _slice_model(grads, n_model)
            surf2, st2 = S.adam_step(surf, st, grad_shard, hyper)
            return surf2, st2, loss

        return run_block_loop(
            surf_shard, adam_shard, kf.log_probs, key,
            num_iters=mc.num_iterations + 1, rebin=rebin,
            early=bool(mc.early_stop_enable),
            patience_blocks=max(1, int((mc.early_stop_patience or 100)
                                       // rebin)),
            es_threshold=float(mc.early_stop_threshold or 0.01),
            make_tiles=make_tiles, one_iter=one_iter)

    from ..slam.mapper import KeyframeBatch
    surf_spec, adam_spec = _surf_specs()
    kf_spec = KeyframeBatch(K=P(), T_cw=P(), depth=P(None, "data"),
                            valid=P(None, "data"), log_probs=P())
    mapped = jax.shard_map(
        opt, mesh=mesh,
        in_specs=(surf_spec, adam_spec, kf_spec, P()),
        out_specs=(surf_spec, adam_spec, P(), P()),
        check_vma=False)
    return jax.jit(mapped)


def sharded_optimize_tiles(mesh: Mesh, params: RenderParams,
                           hyper: S.AdamHyper, mc, compute_cfg,
                           depth_ratio: float = 0.0):
    """Balanced TILE-level data parallelism (docs/ARCHITECTURE.md scaling
    model: the row-block split's bound is per-band load imbalance).

    The rasterizer is tile-based, so the "data" axis can own an arbitrary
    SUBSET of tiles: at each rebin point tiles are ordered by binning
    count and dealt snake-wise across shards, equalizing per-shard
    surfel-pixel pairs regardless of scene geometry.  Losses are computed
    in tile space (the tile grid covers every pixel exactly once); the
    one cross-tile term — surf_normal's finite differences — reassembles
    the full depth image from an O(image) all_gather (~256 KB at
    64x1024, AD-correct under shard_map: its transpose is the matching
    reduce-scatter).

    Semantically identical to ``sharded_optimize`` and to the
    single-device schedule; requires the pallas backend (the jnp golden
    renderer has no tile decomposition).
    """
    from ..ops.rasterizer import binning as BN
    from ..ops.rasterizer import common as CM
    from ..ops.rasterizer import pallas_raster as PR
    from ..geometry import se3, spherical
    from ..slam.mapper import run_block_loop

    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    height, width = params.height, params.width
    tile_h, tile_w = params.tile_h, params.tile_w
    n_tiles = (height // tile_h) * (width // tile_w)
    assert n_tiles % n_data == 0, (n_tiles, n_data)
    t_local = n_tiles // n_data
    compact = bool(getattr(compute_cfg, "compact_param_comms", False))
    rebin = max(1, int(compute_cfg.rebin_every))
    margin_px = float(compute_cfg.bin_margin_px)
    static = PR._StaticArgs(tile_h=tile_h, tile_w=tile_w,
                            chunk=params.chunk, width=width,
                            with_median=params.with_median,
                            with_dist=params.with_dist)

    def opt(surf_shard: S.Surfels, adam_shard: S.AdamState, kf, key):
        from ..ops.rasterizer.api import prepare_tiles

        def make_tiles(surf, kf_idx):
            full = _gather_model(surf.params, compact)
            active = jax.lax.all_gather(surf.active, "model", tiled=True)
            scaling = jnp.exp(full.log_scale)
            opacity = jax.nn.sigmoid(full.logit_opacity) * active
            tiles = prepare_tiles(full.xyz, scaling, full.quat, opacity,
                                  kf.T_cw[kf_idx], kf.K[kf_idx], params,
                                  margin_px=margin_px)
            # balanced snake deal: rank tiles by count (desc), deal rank
            # r to device (r % n) with odd deal-rounds reversed, so every
            # shard gets one tile from each count stratum
            order = jnp.argsort(-tiles.counts)
            mat = order.reshape(t_local, n_data)
            odd = (jnp.arange(t_local) % 2 == 1)[:, None]
            mat = jnp.where(odd, mat[:, ::-1], mat)          # [t_local, n]
            idx = jax.lax.axis_index("data")
            mine = jnp.take(mat, idx, axis=1)                # [t_local]
            sub_lists = tiles.lists[mine]
            plan = _maybe_plan(sub_lists, full.xyz.shape[0], compute_cfg)
            sub = PR.TileAssignment(
                lists=sub_lists, counts=tiles.counts[mine],
                rays_t=tiles.rays_t[mine], pix_t=tiles.pix_t[mine],
                plan=plan)
            # gathered tile row d*t_local+j holds global tile mat[j, d]
            scatter_perm = mat.T.reshape(-1)                 # [n_tiles]
            return sub, mine, scatter_perm

        def one_iter(surf, st, kf_idx, tiles3):
            sub, mine, scatter_perm = tiles3
            full = _gather_model(surf.params, compact)
            active = jax.lax.all_gather(surf.active, "model", tiled=True)
            T_cw = kf.T_cw[kf_idx]
            K = kf.K[kf_idx]
            gt_t = BN.tile_image(kf.depth[kf_idx], tile_h, tile_w)[mine]
            validf = BN.tile_image(kf.valid[kf_idx], tile_h,
                                   tile_w)[mine].astype(jnp.float32)
            v_sum = jnp.maximum(jax.lax.psum(jnp.sum(validf), "data"), 1.0)
            R_wc = T_cw[:3, :3].T
            T_wc = se3.invert_T(T_cw)

            def loss_fn(full_params):
                scaling = jnp.exp(full_params.log_scale)
                opacity = jax.nn.sigmoid(full_params.logit_opacity) * \
                    active
                packed = CM.pack_surfels(full_params.xyz, scaling,
                                         full_params.quat, opacity,
                                         T_cw, K)
                F = BN.pack_features(packed)
                plan1 = (None if sub.plan is None else
                         jax.tree_util.tree_map(lambda x: x[None],
                                                sub.plan))
                out = PR._raster_core(F[None], sub.lists[None],
                                      sub.counts[None], sub.rays_t[None],
                                      sub.pix_t[None], static,
                                      plan1)[0]
                alpha = out[..., 1]                          # [t, P]
                mask = alpha > 0.0
                safe = jnp.where(mask, alpha, 1.0)
                depth_exp = jnp.where(mask, out[..., 0] / safe, 0.0)
                surf_depth_t = depth_exp * (1.0 - depth_ratio) + \
                    out[..., 5] * depth_ratio
                normal_cam = out[..., 2:5] / safe[..., None]
                rend_normal = jnp.where(mask[..., None],
                                        normal_cam @ R_wc.T, 0.0)

                l1_sum = jnp.sum(jnp.abs(validf * (surf_depth_t - gt_t)))
                # cross-tile normal term: reassemble the full depth image
                gath = jax.lax.all_gather(surf_depth_t, "data", tiled=True,
                                          axis=0)            # [n_tiles, P]
                full_t = jnp.zeros_like(gath).at[scatter_perm].set(gath)
                depth_img = BN.untile_image(full_t, height, width,
                                            tile_h, tile_w)
                normals = spherical.depth_to_normal(depth_img, K, T_wc)
                surf_normal = BN.tile_image(normals, tile_h,
                                            tile_w)[mine] * \
                    alpha[..., None]
                ndot = jnp.sum(rend_normal * surf_normal, -1)
                n_sum = jnp.sum((1.0 - ndot) * validf)
                a = jnp.clip(alpha, 1e-7, 1.0 - 1e-7)
                a_sum = jnp.sum(-jnp.log(a) * validf)
                smax = jnp.max(scaling, axis=-1)
                over = jnp.maximum(smax - mc.opt_scaling_max, 0.0) * active
                reg = mc.opt_scaling_max_penalty * jnp.sum(over) / n_data
                return (l1_sum / (height * width)
                        + mc.opt_lambda_alpha * a_sum / v_sum
                        + mc.opt_lambda_normal * n_sum / v_sum
                        + reg)

            loss_local, grads = jax.value_and_grad(loss_fn)(full)
            loss = jax.lax.psum(loss_local, "data")
            grads = S.SurfelParams(*(jax.lax.psum(g, "data")
                                     for g in grads))
            grad_shard = _slice_model(grads, n_model)
            surf2, st2 = S.adam_step(surf, st, grad_shard, hyper)
            return surf2, st2, loss

        return run_block_loop(
            surf_shard, adam_shard, kf.log_probs, key,
            num_iters=mc.num_iterations + 1, rebin=rebin,
            early=bool(mc.early_stop_enable),
            patience_blocks=max(1, int((mc.early_stop_patience or 100)
                                       // rebin)),
            es_threshold=float(mc.early_stop_threshold or 0.01),
            make_tiles=make_tiles, one_iter=one_iter)

    from ..slam.mapper import KeyframeBatch
    surf_spec, adam_spec = _surf_specs()
    kf_spec = KeyframeBatch(K=P(), T_cw=P(), depth=P(),
                            valid=P(), log_probs=P())
    mapped = jax.shard_map(
        opt, mesh=mesh,
        in_specs=(surf_spec, adam_spec, kf_spec, P()),
        out_specs=(surf_spec, adam_spec, P(), P()),
        check_vma=False)
    return jax.jit(mapped)


def sharded_optimize_ring(mesh: Mesh, params: RenderParams,
                          hyper: S.AdamHyper, mc, compute_cfg,
                          depth_ratio: float = 0.0):
    """Beyond-HBM optimize: ring compositing over "model" depth bands x
    tile-DP over "data" (SURVEY §5 long-context row; parallel/ring.py).

    Unlike the FSDP paths (sharded_optimize / sharded_optimize_tiles),
    an ITERATION never materializes the full pool: each "model" shard
    holds one depth band of the surfels (+ its Adam moments), bins and
    renders ONLY its band through the Pallas kernels, and the per-pixel
    segment states (T_seg, channel sums) fold front-to-back over the ICI
    ring (ring_fold).  Gradients w.r.t. a band's params stay on its
    device — the backward of the fold routes pixel cotangents through
    the reverse ring — so per-iteration memory is O(capacity/n_model +
    image + tile lists), the >HBM scaling requirement.

    Once per rebin block the pool is re-partitioned depth-contiguously
    for the block's sampled view (compositing order must be global depth
    order; a band split of the depth argsort gives exactly the
    single-device order).  The reshard itself is the bucketed all-to-all
    of ring.ring_reshard: packed state rows ride an (n-1)-hop ppermute
    ring and only scalar depth keys are ever all-gathered, so per-device
    HBM stays O(band) through the reshard too.
    Requires depth_ratio == 0: the median channel's crossing state is
    not ring-folded (all reference configs satisfy this,
    ref configs */*.yaml depth_ratio).

    Semantics: identical schedule/losses to sharded_optimize_tiles; the
    loss is evaluated in tile space on ring-folded full channels.
    """
    from ..ops.rasterizer import binning as BN
    from ..ops.rasterizer import common as CM
    from ..ops.rasterizer import pallas_raster as PR
    from ..geometry import se3, spherical
    from ..slam.mapper import run_block_loop
    from .ring import ring_fold, ring_reshard

    assert depth_ratio == 0.0, \
        "ring compositing does not fold the median channel"
    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    height, width = params.height, params.width
    tile_h, tile_w = params.tile_h, params.tile_w
    n_tiles = (height // tile_h) * (width // tile_w)
    assert n_tiles % n_data == 0, (n_tiles, n_data)
    t_local = n_tiles // n_data
    compact = bool(getattr(compute_cfg, "compact_param_comms", False))
    rebin = max(1, int(compute_cfg.rebin_every))
    margin_px = float(compute_cfg.bin_margin_px)
    static = PR._StaticArgs(tile_h=tile_h, tile_w=tile_w,
                            chunk=params.chunk, width=width,
                            with_median=False, with_dist=False)

    def opt(surf_shard: S.Surfels, adam_shard: S.AdamState, kf, key):
        from ..ops.rasterizer.api import prepare_tiles

        def reshard(surf, st, kf_idx):
            # depth-contiguous re-partition for this block's view: band d
            # of the global depth argsort lands on model-device d, routed
            # by the O(band)-memory ppermute ring (no full-pool gather)
            T_cw = kf.T_cw[kf_idx]
            p = surf.params.xyz @ T_cw[:3, :3].T + T_cw[:3, 3]
            d_local = jnp.linalg.norm(p, axis=-1)
            d_key = jnp.where(surf.active, d_local, jnp.inf)
            return ring_reshard(surf, st, d_key, "model", n_model)

        def make_tiles(surf, kf_idx):
            # bin ONLY the local depth band (1/n_model of the binning
            # work per device — nothing global is materialized)
            scaling = jnp.exp(surf.params.log_scale)
            opacity = jax.nn.sigmoid(surf.params.logit_opacity) * \
                surf.active
            tiles = prepare_tiles(surf.params.xyz, scaling,
                                  surf.params.quat, opacity,
                                  kf.T_cw[kf_idx], kf.K[kf_idx], params,
                                  margin_px=margin_px)
            # balanced snake deal over "data" from the GLOBAL per-tile
            # load so every model shard picks the same tile subsets
            counts_tot = jax.lax.psum(tiles.counts, "model")
            order = jnp.argsort(-counts_tot)
            mat = order.reshape(t_local, n_data)
            odd = (jnp.arange(t_local) % 2 == 1)[:, None]
            mat = jnp.where(odd, mat[:, ::-1], mat)
            idx = jax.lax.axis_index("data")
            mine = jnp.take(mat, idx, axis=1)
            sub_lists = tiles.lists[mine]
            plan = _maybe_plan(sub_lists, surf.params.xyz.shape[0],
                               compute_cfg)
            sub = PR.TileAssignment(
                lists=sub_lists, counts=tiles.counts[mine],
                rays_t=tiles.rays_t[mine], pix_t=tiles.pix_t[mine],
                plan=plan)
            scatter_perm = mat.T.reshape(-1)
            return sub, mine, scatter_perm

        def one_iter(surf, st, kf_idx, tiles3):
            sub, mine, scatter_perm = tiles3
            T_cw = kf.T_cw[kf_idx]
            K = kf.K[kf_idx]
            gt_t = BN.tile_image(kf.depth[kf_idx], tile_h, tile_w)[mine]
            validf = BN.tile_image(kf.valid[kf_idx], tile_h,
                                   tile_w)[mine].astype(jnp.float32)
            v_sum = jnp.maximum(jax.lax.psum(jnp.sum(validf), "data"), 1.0)
            R_wc = T_cw[:3, :3].T
            T_wc = se3.invert_T(T_cw)
            active = surf.active

            def loss_fn(band_params):
                scaling = jnp.exp(band_params.log_scale)
                opacity = jax.nn.sigmoid(band_params.logit_opacity) * \
                    active
                packed = CM.pack_surfels(band_params.xyz, scaling,
                                         band_params.quat, opacity,
                                         T_cw, K)
                F = BN.pack_features(packed)
                plan1 = (None if sub.plan is None else
                         jax.tree_util.tree_map(lambda x: x[None],
                                                sub.plan))
                out = PR._raster_core(F[None], sub.lists[None],
                                      sub.counts[None], sub.rays_t[None],
                                      sub.pix_t[None], static,
                                      plan1)[0]
                seg = dict(T=out[..., 7], depth_sum=out[..., 0],
                           alpha=out[..., 1], normal_sum=out[..., 2:5])
                ch = ring_fold(seg, "model", n_model)

                alpha = ch["alpha"]                          # [t, P]
                mask = alpha > 0.0
                safe = jnp.where(mask, alpha, 1.0)
                surf_depth_t = jnp.where(mask, ch["depth_sum"] / safe,
                                         0.0)
                normal_cam = ch["normal_sum"] / safe[..., None]
                rend_normal = jnp.where(mask[..., None],
                                        normal_cam @ R_wc.T, 0.0)

                l1_sum = jnp.sum(jnp.abs(validf * (surf_depth_t - gt_t)))
                gath = jax.lax.all_gather(surf_depth_t, "data",
                                          tiled=True, axis=0)
                full_t = jnp.zeros_like(gath).at[scatter_perm].set(gath)
                depth_img = BN.untile_image(full_t, height, width,
                                            tile_h, tile_w)
                normals = spherical.depth_to_normal(depth_img, K, T_wc)
                surf_normal = BN.tile_image(normals, tile_h,
                                            tile_w)[mine] * \
                    alpha[..., None]
                ndot = jnp.sum(rend_normal * surf_normal, -1)
                n_sum = jnp.sum((1.0 - ndot) * validf)
                a = jnp.clip(alpha, 1e-7, 1.0 - 1e-7)
                a_sum = jnp.sum(-jnp.log(a) * validf)
                smax = jnp.max(scaling, axis=-1)
                # Per-device loss is loss_total / (n_data * n_model) in
                # expectation structure: under shard_map AD the grad each
                # device gets is d(sum of all per-device losses)/d(local
                # band params), so every replicated term must be
                # pre-divided by its replication count.  The channel
                # losses come out of ring_fold replicated over "model"
                # (/n_model); the band-local scale reg appears once per
                # band but on every "data" replica (/n_data).
                over = jnp.maximum(smax - mc.opt_scaling_max, 0.0) * \
                    active
                reg = mc.opt_scaling_max_penalty * jnp.sum(over) / n_data
                chan = (l1_sum / (height * width)
                        + mc.opt_lambda_alpha * a_sum / v_sum
                        + mc.opt_lambda_normal * n_sum / v_sum)
                return chan / n_model + reg

            loss_local, grads = jax.value_and_grad(loss_fn)(surf.params)
            # grads live on the band already ("model" needs no explicit
            # collective — ring_fold's transpose routed the pixel
            # cotangents through the reverse ring); psum over "data"
            # accumulates the tile split.  The scalar loss: summing
            # loss_local over BOTH axes reconstitutes exactly
            # chan_total + reg_total (the pre-divisions above cancel the
            # replication counts), and — critically — yields the SAME
            # replicated value on every device, so run_block_loop's EMA
            # early-stop while_loop takes identical trip counts on all
            # shards (divergent counts around collectives would deadlock).
            loss = jax.lax.psum(loss_local, ("data", "model"))
            grads = S.SurfelParams(*(jax.lax.psum(g, "data")
                                     for g in grads))
            surf2, st2 = S.adam_step(surf, st, grads, hyper)
            return surf2, st2, loss

        return run_block_loop(
            surf_shard, adam_shard, kf.log_probs, key,
            num_iters=mc.num_iterations + 1, rebin=rebin,
            early=bool(mc.early_stop_enable),
            patience_blocks=max(1, int((mc.early_stop_patience or 100)
                                       // rebin)),
            es_threshold=float(mc.early_stop_threshold or 0.01),
            make_tiles=make_tiles, one_iter=one_iter, reshard=reshard)

    from ..slam.mapper import KeyframeBatch
    surf_spec, adam_spec = _surf_specs()
    kf_spec = KeyframeBatch(K=P(), T_cw=P(), depth=P(),
                            valid=P(), log_probs=P())
    mapped = jax.shard_map(
        opt, mesh=mesh,
        in_specs=(surf_spec, adam_spec, kf_spec, P()),
        out_specs=(surf_spec, adam_spec, P(), P()),
        check_vma=False)
    return jax.jit(mapped)


def sharded_densify(mesh: Mesh, params: RenderParams, mc, max_new: int,
                    depth_ratio: float = 0.0):
    """Sharded densification: the render (the expensive part) is row-DP
    sharded; mask/top-k/KNN/insert run replicated on gathered full arrays
    via the same ``densify_core`` as the single-device program, then the
    updated pool is sliced back to "model" shards.

    Returns {initialize: jitted fn(surf_sh, adam_sh, camera, key)}.
    """
    from ..model.camera import Camera
    from ..slam.mapper import densify_core

    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    height, width = params.height, params.width
    local_params = params._replace(height=height // n_data)

    def build(initialize: bool):
        def dens(surf_shard: S.Surfels, adam_shard: S.AdamState,
                 cam: Camera, key):
            full = _gather_model(surf_shard.params)
            active = jax.lax.all_gather(surf_shard.active, "model",
                                        tiled=True)
            mu = _gather_model(adam_shard.mu)
            nu = _gather_model(adam_shard.nu)

            def rows_to_full(x):
                return jax.lax.all_gather(x, "data", tiled=True, axis=0)

            depth = rows_to_full(cam.depth)
            normal = rows_to_full(cam.normal)
            valid = rows_to_full(cam.valid)
            cam_full = Camera(K=cam.K, T_cw=cam.T_cw, depth=depth,
                              normal=normal, valid=valid)

            if initialize:
                pkg = None
            else:
                K_local, _ = _row_shard_camera(cam.K, height, n_data)
                scaling = jnp.exp(full.log_scale)
                opacity = jax.nn.sigmoid(full.logit_opacity) * active
                pkg_local = render(full.xyz, scaling, full.quat, opacity,
                                   cam.T_cw, K_local, local_params,
                                   depth_ratio)
                pkg = {"rend_alpha": rows_to_full(pkg_local["rend_alpha"]),
                       "surf_depth": rows_to_full(pkg_local["surf_depth"])}

            surf_full = S.Surfels(params=full, active=active)
            adam_full = S.AdamState(mu=mu, nu=nu, step=adam_shard.step)
            surf2, adam2, n_written, sampled = densify_core(
                surf_full, adam_full, cam_full, key, pkg, mc=mc,
                max_new=max_new, height=height, width=width)

            surf_out = S.Surfels(
                params=_slice_model(surf2.params, n_model),
                active=_slice_model(surf2.active, n_model))
            adam_out = S.AdamState(mu=_slice_model(adam2.mu, n_model),
                                   nu=_slice_model(adam2.nu, n_model),
                                   step=adam2.step)
            return surf_out, adam_out, n_written, sampled

        surf_spec, adam_spec = _surf_specs()
        cam_spec = Camera(K=P(), T_cw=P(), depth=P("data"),
                          normal=P("data"), valid=P("data"))
        mapped = jax.shard_map(
            dens, mesh=mesh,
            in_specs=(surf_spec, adam_spec, cam_spec, P()),
            out_specs=(surf_spec, adam_spec, P(), P()),
            check_vma=False)
        return jax.jit(mapped)

    return {True: build(True), False: build(False)}


def sharded_prune(mesh: Mesh, mc):
    """Prune on sharded state: purely elementwise over the pool, so each
    "model" shard prunes independently (zero communication; the count is
    psum'd)."""
    from ..slam.mapper import prune_core

    def prune(surf_shard: S.Surfels):
        surf2, n_local = prune_core(surf_shard, mc=mc)
        # "data"-axis devices hold identical shard copies; only the
        # "model" axis partitions the pool, so psum over it is the total
        return surf2, jax.lax.psum(n_local, "model")

    surf_spec, _ = _surf_specs()
    mapped = jax.shard_map(
        prune, mesh=mesh, in_specs=(surf_spec,),
        out_specs=(surf_spec, P()), check_vma=False)
    return jax.jit(mapped)
