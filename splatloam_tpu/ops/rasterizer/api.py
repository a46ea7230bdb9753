"""Public rendering API: rasterize + channel decoding.

``render`` mirrors the reference wrapper (ref gaussian_renderer/__init__.py:
11-93): it produces rend_alpha / rend_normal (world frame, alpha-normalized)
/ rend_dist / surf_depth (expected-median blend) / surf_normal (from depth
finite differences) plus radii/visibility, from raw rasterizer channels.

Backend dispatch: "jnp" = golden O(N*P) renderer, "pallas" = tiled TPU
kernels, "auto" = pallas on TPU else jnp.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...geometry import se3, spherical
from .jnp_ref import rasterize_jnp


class RenderParams(NamedTuple):
    """Static rasterizer knobs (hashable: usable as a jit static arg)."""
    height: int
    width: int
    backend: str = "auto"
    chunk: int = 256
    tile_h: int = 8
    tile_w: int = 32
    tile_list_capacity: int = 3072
    # median/distortion channels cost extra prefix scans in the Pallas
    # kernels; the mapping/tracking losses use neither (depth_ratio=0 in
    # all reference configs), so callers may disable them.
    with_median: bool = True
    with_dist: bool = True
    # binner: "sorted" (capped window, fast) or "exact" (unbounded
    # coverage via per-tile scatter; used by parity tests)
    binner: str = "sorted"
    cap_ty: int = 9
    cap_tx: int = 9
    # slot layout consumed by the Pallas kernels: "tiled" = padded [T, K]
    # per-tile lists, "flat" = compacted chunk-aligned slot pool (the
    # per-iteration gather/scatter/DMA cost drops from T*K to ~sum(counts)
    # rows; see pallas_raster.build_flat_lists), "bucketed" = two-capacity
    # tile buckets (top bucket_frac tiles by count keep the full capacity,
    # the rest truncate to bucket_k_small; single-view)
    layout: str = "tiled"
    # bucketed layout knobs (fraction of tiles in the big bucket; small-
    # bucket slot capacity, 0 = one chunk)
    bucket_frac: float = 0.5
    bucket_k_small: int = 0
    # static flat-pool slot budget (chunk multiple); 0 = T*K/2
    flat_capacity: int = 0
    # gradient reduction: "rmw" = in-kernel read-modify-write pool,
    # "plan" = rebin-time occurrence tables + gather-sum, "ranksum" =
    # rebin-time id-sort + rank-windowed one-hot MXU segment sum,
    # "fused" = the RMW reduction folded into the backward kernel (no
    # [NT,K,16] HBM round trip / second launch).
    # Measured e2e on v5e at 100k/64x1024: rmw 17.6 ms/iter, plan 23.5
    # — the plan's rebin-time construction (argsort + compaction
    # scatters over T*K slots) costs more than the RMW it replaces;
    # both alternatives stay selectable for high-rebin /
    # low-duplication regimes (docs/PERF.md has the full table).
    scatter: str = "rmw"
    # RMW scatter: tiles folded into each grid step (amortizes per-step
    # fixed costs; auto-reduced to a divisor of the tile count).
    scatter_tps: int = 1

    SCATTER_MODES = ("rmw", "plan", "ranksum", "fused")


def adaptive_geometry(n_surfels: int) -> dict:
    """Measured-on-v5e kernel geometry by active pool size.

    The round-4 sweep tuned 4x16/c128/768 at 100k surfels, but small
    pools invert the tradeoff: quadrupling the tile count makes 20k-pool
    iterations pay per-tile fixed costs on mostly-empty tiles (measured
    20.5 ms/iter at 20k with the 100k geometry vs 13.7 ms with
    8x32/c256 — docs/PERF.md round-5 table).  Callers that know the
    active surfel count (the mapper re-specializes its programs per
    pool capacity anyway) should merge this into RenderParams.
    """
    if n_surfels <= 48_000:
        geo = dict(tile_h=8, tile_w=32, chunk=256,
                   tile_list_capacity=1024)
    else:
        # chunk 256 at 4x16: 14.63 vs 15.38 ms/iter at c128 (round-5
        # chunk sweep: c256 < c384 < c128 < c768 — docs/PERF.md)
        geo = dict(tile_h=4, tile_w=16, chunk=256,
                   tile_list_capacity=768)
    return geo


def fit_geometry(geo: dict, height: int, width: int) -> dict:
    """Shrink tile dims to divisors of the image (kernel precondition);
    non-standard image sizes keep working at slightly different tiles."""
    geo = dict(geo)
    while height % geo["tile_h"]:
        geo["tile_h"] //= 2
    while width % geo["tile_w"]:
        geo["tile_w"] //= 2
    return geo


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    try:
        return "pallas" if jax.default_backend() == "tpu" else "jnp"
    except Exception:
        return "jnp"


def rasterize(xyz, scaling, rotation, opacity, T_cw, K,
              params: RenderParams, tiles=None):
    """Dispatch to a rasterizer backend; returns the raw channel dict.

    ``tiles``: optional frozen TileAssignment (pallas backend only) to
    amortize binning across iterations; the jnp golden path ignores it.
    """
    backend = _resolve_backend(params.backend)
    if backend == "jnp":
        return rasterize_jnp(xyz, scaling, rotation, opacity, T_cw, K,
                             params.height, params.width, params.chunk)
    if backend == "pallas":
        from .pallas_raster import rasterize_pallas
        return rasterize_pallas(xyz, scaling, rotation, opacity, T_cw, K,
                                params, tiles=tiles)
    raise ValueError(f"unknown rasterizer backend {backend!r}")


def prepare_tiles(xyz, scaling, rotation, opacity, T_cw, K,
                  params: RenderParams, margin_px: float = 0.0):
    """Precompute a frozen TileAssignment (None on the jnp backend)."""
    if _resolve_backend(params.backend) != "pallas":
        return None
    from .pallas_raster import prepare_tiles as _prep
    return _prep(xyz, scaling, rotation, opacity, T_cw, K, params,
                 margin_px=margin_px)


def render(xyz, scaling, rotation, opacity, T_cw, K,
           params: RenderParams, depth_ratio: float = 0.0, tiles=None):
    """Full render + decode (ref gaussian_renderer/__init__.py:40-93).

    Args are *activated* surfel parameters (scaling positive, opacity in
    (0,1), rotation approx. unit quaternion) in the model frame, plus the
    model->camera transform T_cw and spherical intrinsics K.

    Returns a dict:
      rend_alpha  [H, W]
      rend_normal [H, W, 3]  world(model)-frame, alpha-normalized
      rend_dist   [H, W]
      surf_depth  [H, W]
      surf_normal [H, W, 3]  from depth finite differences, x alpha
      rend_median [H, W]
      radii       [N]
      visibility_filter [N] bool
    """
    chans = rasterize(xyz, scaling, rotation, opacity, T_cw, K, params,
                      tiles=tiles)
    return _decode(chans, T_cw, K, depth_ratio)


def _decode(chans, T_cw, K, depth_ratio):
    """Raw channels -> reference render package
    (ref gaussian_renderer/__init__.py:51-92)."""
    alpha = chans["alpha"]
    mask = alpha > 0.0
    safe_alpha = jnp.where(mask, alpha, 1.0)

    # camera->world rotation for the normal channel (ref :57-62)
    R_wc = T_cw[:3, :3].T
    normal_cam = chans["normal_sum"] / safe_alpha[..., None]
    rend_normal = jnp.where(mask[..., None],
                            normal_cam @ R_wc.T, 0.0)

    depth_expected = jnp.where(mask, chans["depth_sum"] / safe_alpha, 0.0)
    surf_depth = depth_expected * (1.0 - depth_ratio) + \
        chans["median"] * depth_ratio

    T_wc = se3.invert_T(T_cw)
    surf_normal = spherical.depth_to_normal(surf_depth, K, T_wc)
    surf_normal = surf_normal * alpha[..., None]

    return {
        "rend_alpha": alpha,
        "rend_normal": rend_normal,
        "rend_dist": chans["dist"],
        "rend_median": chans["median"],
        "surf_depth": surf_depth,
        "surf_normal": surf_normal,
        "radii": chans["radii"],
        "visibility_filter": chans["radii"] > 0,
    }


def render_batch(xyz, scaling, rotation, opacity, T_cw, K,
                 params: RenderParams, depth_ratio: float = 0.0,
                 tiles=None):
    """Multi-view render over a SHARED surfel set: T_cw [B,4,4], K
    [B,3,3] -> render package with a leading [B] axis on every entry.

    On the Pallas backend all B views flatten into ONE kernel grid
    (launch/pipeline overhead amortized across views — the mapper's
    multi-view optimization mode); the jnp golden path vmaps.
    """
    backend = _resolve_backend(params.backend)
    if backend == "pallas":
        from .pallas_raster import rasterize_pallas_batched
        chans = rasterize_pallas_batched(xyz, scaling, rotation, opacity,
                                         T_cw, K, params, tiles=tiles)
    else:
        chans = jax.vmap(
            lambda T, k: rasterize_jnp(xyz, scaling, rotation, opacity,
                                       T, k, params.height, params.width,
                                       params.chunk))(T_cw, K)
    return jax.vmap(_decode, in_axes=(0, 0, 0, None))(chans, T_cw, K,
                                                      depth_ratio)


def prepare_tiles_batch(xyz, scaling, rotation, opacity, T_cw, K,
                        params: RenderParams, margin_px: float = 0.0):
    """Frozen per-view TileAssignments stacked on [B] (None on jnp)."""
    if _resolve_backend(params.backend) != "pallas":
        return None
    from .pallas_raster import prepare_tiles_batched as _prep
    return _prep(xyz, scaling, rotation, opacity, T_cw, K, params,
                 margin_px=margin_px)
