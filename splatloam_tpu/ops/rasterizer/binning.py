"""Tile binning for the Pallas rasterizer (XLA-side, non-differentiable).

The CUDA reference bins splats to 16x16 screen tiles with a global
(tile|depth) radix sort (upstream 2DGS design).  The TPU-native equivalent:

  1. one global depth argsort of all surfels (XLA sort);
  2. a [tiles, N] overlap mask from conservative pixel bounding boxes
     (azimuth-wrapped in x — a splat can straddle the +-pi seam);
  3. per-tile compaction via cumsum + clipped scatter, which preserves the
     depth order without any per-tile sort.

Produces fixed-capacity per-tile index lists (overflow drops the farthest
splats, which are occluded anyway once alpha saturates) plus per-tile
counts used for early termination inside the kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import common


@partial(jax.jit, static_argnames=("height", "width", "tile_h", "tile_w",
                                   "capacity"))
def build_tile_lists(packed: common.PackedSurfels, height: int, width: int,
                     tile_h: int, tile_w: int, capacity: int):
    """Returns (lists [T, K] int32 indices into F (N = padding row),
    counts [T] int32, order [N] the depth sort permutation)."""
    n = packed.depth.shape[0]
    ty = height // tile_h
    tx = width // tile_w
    n_tiles = ty * tx

    sort_key = jnp.where(packed.radius_px > 0, packed.depth, jnp.inf)
    order = jnp.argsort(sort_key)
    cx = packed.center_xy[order, 0]
    cy = packed.center_xy[order, 1]
    rx = packed.extent_px[order, 0]
    ry = packed.extent_px[order, 1]
    alive = packed.radius_px[order] > 0

    # tile centers in continuous pixel coordinates (pixel u center = u-0.5)
    tile_cx = (jnp.arange(tx) * tile_w + tile_w / 2.0 - 0.5)
    tile_cy = (jnp.arange(ty) * tile_h + tile_h / 2.0 - 0.5)

    # overlap tests: [T_axis, N]
    dx = cx[None, :] - tile_cx[:, None]
    dx = dx - jnp.round(dx / width) * width          # azimuth wrap
    ox = jnp.abs(dx) <= (rx[None, :] + tile_w / 2.0)  # [tx, N]
    dy = cy[None, :] - tile_cy[:, None]
    oy = jnp.abs(dy) <= (ry[None, :] + tile_h / 2.0)  # [ty, N]

    mask = (oy[:, None, :] & ox[None, :, :] &
            alive[None, None, :]).reshape(n_tiles, n)

    pos = jnp.cumsum(mask, axis=1) - 1               # [T, N]
    counts = jnp.minimum(pos[:, -1] + 1, capacity).astype(jnp.int32)
    write = mask & (pos < capacity)
    pos = jnp.where(write, pos, capacity)            # clipped -> dropped
    lists = jnp.full((n_tiles, capacity + 1), n, jnp.int32)
    src = jnp.broadcast_to(order[None, :], (n_tiles, n))
    lists = jax.vmap(lambda l, p, s: l.at[p].set(s, mode="drop"))(
        lists, pos, src)
    return lists[:, :capacity], counts, order


@partial(jax.jit, static_argnames=("height", "width", "tile_h", "tile_w",
                                   "capacity", "cap_ty", "cap_tx",
                                   "two_tier"))
def build_tile_lists_sorted(packed: common.PackedSurfels, height: int,
                            width: int, tile_h: int, tile_w: int,
                            capacity: int, cap_ty: int = 9,
                            cap_tx: int = 9, two_tier: bool = True):
    """Sort-based tile lists: ~2x faster than the scatter formulation.

    Tiered capped duplicate expansion, ONE global sort of (tile_id,
    depth_rank) keys, then segment starts via searchsorted + a gather:

      tier 1: every surfel emits its 3x3 window (exact overlap-tested with
              the per-axis extents, so most die before the sort);
      tier 2: surfels whose extent can reach beyond the 3x3 guarantee
              (rx > tile_w or ry > tile_h) emit the cap_ty x cap_tx window,
              need-prioritized under a static budget of max(256, n/16) —
              with tier-3 members force-included (score +inf offset) so a
              tier-3 splat never loses its tier-2 annulus to crowding;
      tier 3: surfels reaching beyond tier 2's guarantee emit the FULL
              (2*ty-1) x tx window (every tile of the image), budget
              max(64, n/256) — coverage for a tier-3 member is therefore
              complete for any extent.

    A window of half-width k tiles GUARANTEES coverage of extents up to
    k*tile (worst-case center at a tile edge); the tier thresholds use
    exactly that, so truncation needs MORE than a budget's worth of splats
    genuinely spanning past the previous tier.  ``two_tier=False`` gives
    every surfel the tier-3 window (the coverage oracle for tests; key
    count explodes, test-sized scenes only).
    """
    sorted_keys, sorted_ids = _emit_sorted_keys(
        packed, height, width, tile_h, tile_w, cap_ty, cap_tx, two_tier)
    n = packed.depth.shape[0]
    n_tiles = (height // tile_h) * (width // tile_w)
    starts = jnp.searchsorted(
        sorted_keys,
        jnp.arange(n_tiles + 1, dtype=jnp.int32) * (n + 1))
    counts = jnp.minimum(starts[1:] - starts[:-1], capacity)
    gidx = starts[:-1, None] + jnp.arange(capacity)[None, :]
    valid = jnp.arange(capacity)[None, :] < counts[:, None]
    ids_at = sorted_ids[jnp.minimum(gidx, sorted_keys.shape[0] - 1)]
    lists = jnp.where(valid, ids_at, n)
    # third slot kept for signature stability (was the depth-sort perm;
    # no caller consumes it)
    return lists.astype(jnp.int32), counts.astype(jnp.int32), None


def _emit_sorted_keys(packed: common.PackedSurfels, height: int,
                      width: int, tile_h: int, tile_w: int,
                      cap_ty: int, cap_tx: int, two_tier: bool = True):
    """Tiered window emission + ONE global (tile, depth-rank) key sort —
    the shared core of build_tile_lists_sorted / build_flat_lists.
    Returns (sorted_keys [E], sorted_ids [E])."""
    n = packed.depth.shape[0]
    ty = height // tile_h
    tx = width // tile_w
    n_tiles = ty * tx
    assert n_tiles * (n + 1) < 2 ** 31, "int32 key space exceeded"

    sort_key = jnp.where(packed.radius_px > 0, packed.depth, jnp.inf)
    order = jnp.argsort(sort_key)
    cx = packed.center_xy[order, 0]
    cy = packed.center_xy[order, 1]
    rx = packed.extent_px[order, 0]
    ry = packed.extent_px[order, 1]
    alive = packed.radius_px[order] > 0
    tcx = jnp.floor((cx + 1.0) / tile_w).astype(jnp.int32)
    tcy = jnp.floor((cy + 1.0) / tile_h).astype(jnp.int32)
    rank = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    big = jnp.iinfo(jnp.int32).max

    def window_keys(dy, dx, cx, cy, rx, ry, alive, tcx, tcy, rank):
        tyy = tcy + dy
        txx = jnp.mod(tcx + dx, tx)
        ccx = txx.astype(jnp.float32) * tile_w + tile_w / 2.0 - 0.5
        ccy = tyy.astype(jnp.float32) * tile_h + tile_h / 2.0 - 0.5
        ddx = cx - ccx
        ddx = ddx - jnp.round(ddx / width) * width
        ddy = cy - ccy
        ok = (alive & (tyy >= 0) & (tyy < ty)
              & (jnp.abs(ddx) <= rx + tile_w / 2.0)
              & (jnp.abs(ddy) <= ry + tile_h / 2.0))
        tile_id = tyy * tx + txx
        return jnp.where(ok, tile_id * (n + 1) + rank, big)

    def emit_window(w_ty, w_tx, skip_ty, skip_tx, args, keys, ids):
        """Emit (w_ty x w_tx) window offsets minus the inner skip window."""
        cx, cy, rx, ry, alive, tcx, tcy, rank, idv = args
        for dy in range(-(w_ty // 2), w_ty - w_ty // 2):
            for dx in range(-(w_tx // 2), w_tx - w_tx // 2):
                if (skip_ty and skip_tx and abs(dy) <= skip_ty // 2
                        and abs(dx) <= skip_tx // 2):
                    continue
                keys.append(window_keys(dy, dx, cx, cy, rx, ry, alive,
                                        tcx, tcy, rank))
                ids.append(idv)

    def top_need(needs, score, budget):
        """Static-budget need-prioritized subset -> gathered args."""
        k = min(n, budget)
        _, bidx = jax.lax.top_k(jnp.where(needs, score, -1.0), k)
        return (cx[bidx], cy[bidx], rx[bidx], ry[bidx],
                alive[bidx] & needs[bidx], tcx[bidx], tcy[bidx],
                bidx, ids_all[bidx])

    # clamp x-windows to the column count: a wider modular window would
    # visit the same column twice and double-composite surfels (rows have
    # no wraparound — their bounds check suffices and never duplicates).
    # Tier 3 is the FULL image window (2*ty-1 rows reach any row from any
    # center; tx columns cover the wrap), so a tier-3 member's coverage
    # is complete whatever its extent — no silent cap at wide images.
    w2_ty, w2_tx = min(cap_ty, 2 * ty - 1), min(cap_tx, tx)
    w3_ty, w3_tx = 2 * ty - 1, tx
    # normalized need (tiles of reach past the center tile)
    score = jnp.maximum(rx * (1.0 / tile_w), ry * (1.0 / tile_h))

    keys, ids = [], []
    ids_all = order.astype(jnp.int32)
    all_args = (cx, cy, rx, ry, alive, tcx, tcy, rank, ids_all)
    w1_ty, w1_tx = min(3, 2 * ty - 1), min(3, tx)
    if not two_tier:
        emit_window(w3_ty, w3_tx, 0, 0, all_args, keys, ids)
    else:
        emit_window(w1_ty, w1_tx, 0, 0, all_args, keys, ids)
        # tier-3 membership decided FIRST: its members must also hold
        # tier-2 membership (tier 3 emits only the annulus beyond w2), so
        # tier 2 force-includes them at +inf priority — their count is
        # <= tier-3's budget <= tier-2's budget, so all of them fit.
        needs3 = ((rx > (w2_tx // 2) * tile_w)
                  | (ry > (w2_ty // 2) * tile_h))
        k3 = min(n, max(64, n // 256))
        _, bidx3 = jax.lax.top_k(jnp.where(needs3, score, -1.0), k3)
        member3 = jnp.zeros((n,), bool).at[bidx3].set(needs3[bidx3])
        if w2_tx > w1_tx or w2_ty > w1_ty:
            needs2 = (rx > tile_w) | (ry > tile_h)
            score2 = jnp.where(member3, jnp.inf, score)
            emit_window(w2_ty, w2_tx, w1_ty, w1_tx,
                        top_need(needs2, score2, max(256, n // 16)),
                        keys, ids)
        if w3_tx > w2_tx or w3_ty > w2_ty:
            args3 = (cx[bidx3], cy[bidx3], rx[bidx3], ry[bidx3],
                     alive[bidx3] & needs3[bidx3], tcx[bidx3], tcy[bidx3],
                     bidx3, ids_all[bidx3])
            emit_window(w3_ty, w3_tx, w2_ty, w2_tx, args3, keys, ids)
    all_keys = jnp.concatenate(keys)
    # carry the ORIGINAL surfel ids through the sort as a value operand:
    # a contiguous slice then replaces the (issue-bound) random
    # `order[ranks]` gather of T*capacity rows the rank-decode needed
    all_ids = jnp.concatenate(ids)
    return jax.lax.sort((all_keys, all_ids), num_keys=1)


@partial(jax.jit, static_argnames=("height", "width", "tile_h", "tile_w",
                                   "capacity", "cap_ty", "cap_tx",
                                   "chunk", "flat_capacity"))
def build_flat_lists(packed: common.PackedSurfels, height: int, width: int,
                     tile_h: int, tile_w: int, capacity: int, chunk: int,
                     flat_capacity: int, cap_ty: int = 9, cap_tx: int = 9):
    """Compacted slot-pool binning for the flat Pallas kernels.

    The padded [T, K] per-tile lists make every consumer pay for the cap:
    the per-iteration feature gather, the kernel block DMAs and the
    gradient scatter all touch T*K slots although only sum(counts) are
    real (~40-45%% on KITTI-scale scenes).  This layout packs each tile's
    depth-ordered segment back-to-back in ONE flat array, padded only to
    the next chunk multiple, so per-iteration slot traffic is
    ~sum(counts) instead of T*K (the issue-bound gather/scatter cost is
    per-row and width-independent — measured 4.3 ns/row on v5e).

    Returns (flat_ids [E] int32 into F with n = the zero pad row,
             tile_of_chunk [E/chunk] int32,
             starts [T+1] int32 flat segment starts (chunk-aligned),
             counts [T] int32 real per-tile counts).

    Truncation: per-tile counts are capped at ``capacity`` exactly like
    the [T, K] layout; additionally, if the chunk-padded total exceeds
    ``flat_capacity``, tiles are filled greedily in tile order and the
    tail tiles lose their deepest entries (generously sized callers never
    hit this — MapperPrograms sizes the budget from the pool capacity).
    """
    n = packed.depth.shape[0]
    ty = height // tile_h
    tx = width // tile_w
    n_tiles = ty * tx
    assert flat_capacity % chunk == 0
    n_chunks = flat_capacity // chunk

    sorted_keys, sorted_ids = _emit_sorted_keys(
        packed, height, width, tile_h, tile_w, cap_ty, cap_tx)
    seg_starts = jnp.searchsorted(
        sorted_keys,
        jnp.arange(n_tiles + 1, dtype=jnp.int32) * (n + 1)
    ).astype(jnp.int32)[:-1]
    seg_ends = jnp.searchsorted(
        sorted_keys,
        (jnp.arange(n_tiles, dtype=jnp.int32) + 1) * (n + 1)
    ).astype(jnp.int32)
    counts = jnp.minimum(seg_ends - seg_starts, capacity)

    pad_t = ((counts + chunk - 1) // chunk) * chunk
    start_t = jnp.concatenate([jnp.zeros((1,), pad_t.dtype),
                               jnp.cumsum(pad_t)])
    room_t = jnp.clip(flat_capacity - start_t[:-1], 0, pad_t)
    counts2 = jnp.minimum(counts, room_t)
    start_clip = jnp.minimum(start_t, flat_capacity)

    pos = jnp.arange(flat_capacity, dtype=jnp.int32)
    tile_of_pos = jnp.searchsorted(start_clip[1:], pos, side="right"
                                   ).astype(jnp.int32)
    tile_of_pos = jnp.minimum(tile_of_pos, n_tiles - 1)
    j = pos - start_clip[tile_of_pos]
    src = seg_starts[tile_of_pos] + j
    valid = j < counts2[tile_of_pos]
    ids_at = sorted_ids[jnp.clip(src, 0, sorted_ids.shape[0] - 1)]
    flat_ids = jnp.where(valid, ids_at, n).astype(jnp.int32)
    tile_of_chunk = tile_of_pos[::chunk]
    return flat_ids, tile_of_chunk, start_clip.astype(jnp.int32), counts2


@partial(jax.jit, static_argnames=("n_surfels", "m", "ov_cap"))
def build_scatter_plan(lists: jax.Array, n_surfels: int, m: int = 4,
                       ov_cap: int = 0):
    """Occurrence tables for the gather-sum gradient reduction.

    The per-iteration gradient scatter (dFg rows -> per-surfel dF) is the
    hot loop's single largest cost when done as an in-kernel RMW pool
    (measured ~9 ms/iter in context at 100k/64x1024 on v5e, vs ~2 ms for
    this plan).  Instead, invert the tile lists ONCE per rebin: for each
    surfel, the flat slot positions of its first ``m`` occurrences
    (``occ`` [N+1, m], dummy slot = T*K), plus a compacted overflow list
    of (slot, id) pairs for occurrences beyond m.  The per-iteration
    reduction is then ONE [N+1, m]-row gather + a trailing-axis sum —
    exact per-surfel tree sums, no read-modify-write — with the few
    overflow rows folded in by the count-aware RMW mini-kernel.

    Returns (occ [N+1, m] int32, ov_slots [ov_cap] int32 (pad T*K),
    ov_ids [ov_cap] int32 (pad n_surfels), n_ov scalar int32).
    """
    tk = lists.size
    n = n_surfels
    if ov_cap <= 0:
        ov_cap = max(8, tk // 4)
    ids = lists.reshape(-1)
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    starts = jnp.searchsorted(ids_sorted,
                              jnp.arange(n + 2, dtype=jnp.int32))
    cnt = starts[1:] - starts[:-1]                      # [N+1]
    j = jnp.arange(m, dtype=jnp.int32)
    idx = starts[:-1, None] + j[None, :]
    valid = j[None, :] < jnp.minimum(cnt, m)[:, None]
    occ = jnp.where(valid, order[jnp.clip(idx, 0, tk - 1)], tk)
    # overflow: occurrence rank >= m, excluding the padding id n (its
    # dFg rows are zero and its dF row is discarded anyway)
    r = jnp.arange(tk, dtype=jnp.int32) - starts[:-1][ids_sorted]
    is_ov = (r >= m) & (ids_sorted != n)
    ovpos = jnp.cumsum(is_ov) - 1
    wpos = jnp.where(is_ov, ovpos, ov_cap)
    ov_slots = jnp.full((ov_cap,), tk, jnp.int32).at[wpos].set(
        order, mode="drop")
    ov_ids = jnp.full((ov_cap,), n, jnp.int32).at[wpos].set(
        ids_sorted, mode="drop")
    n_ov = jnp.minimum(jnp.sum(is_ov), ov_cap).astype(jnp.int32)
    return (occ.astype(jnp.int32), ov_slots, ov_ids, n_ov)


@partial(jax.jit, static_argnames=("n_surfels", "group", "gps",
                                   "trunc_frac", "ov_cap"))
def build_ranksum_plan(lists: jax.Array, n_surfels: int,
                       group: int = 1024, gps: int = 8,
                       trunc_frac: float = 0.0, ov_cap: int = 0):
    """Rank-space sorted segment-sum plan for the gradient reduction.

    One argsort of the flat tile lists by surfel id (amortized over the
    rebin window); per iteration the reduction is then ONE fused
    gather+transpose of the dFg rows into id-sorted order followed by a
    Pallas kernel that one-hot-matmuls each ``group``-entry block into a
    dense RANK-indexed accumulator (see pallas_raster._ranksum_kernel).
    Ranks are dense over the DISTINCT ids that appear, so any block of
    ``group`` sorted entries spans at most ``group`` consecutive rank
    rows — the kernel's write window — regardless of how sparse the
    binned id set is.  The serial read-modify-write of the RMW pool
    becomes MXU matmuls + one windowed vector add per block.

    Returns (pos [E] int32 flat entry positions in id-sorted order,
    ranks [E] int32 (pad -1), w_first [E/group] int32,
    rank_of_id [N+1] int32) with E = ceil(T*K / (gps*group)) *
    gps*group; absent ids map to the never-written dummy rank row.
    ``lists`` may be any flat slot layout — only its flat positions and
    id values matter.
    """
    tk = lists.size
    n_plus1 = n_surfels + 1
    ids = lists.reshape(-1)
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    is_new = jnp.concatenate([jnp.ones((1,), bool),
                              ids_sorted[1:] != ids_sorted[:-1]])
    rank = (jnp.cumsum(is_new) - 1).astype(jnp.int32)       # [TK]

    step = gps * group
    r_alloc = _ranksum_alloc(n_plus1, group)
    rank_of_id = jnp.full((n_plus1,), r_alloc - 1,
                          jnp.int32).at[ids_sorted].set(rank)

    if trunc_frac and 0.0 < trunc_frac < 1.0:
        # SORTED TRUNCATION: binning pads carry id == n_surfels, the
        # largest id, so they form a contiguous SUFFIX of the sorted
        # order — the main path keeps only the first e_cap entries (the
        # dominant per-iteration gather shrinks ~1/trunc_frac-fold) and
        # any REAL entries spilled past e_cap (they'd be the largest-id
        # reals, first within the suffix) ride a small count-aware RMW
        # overflow list, exactly like build_scatter_plan's.  Entries
        # beyond e_cap + ov_cap are dropped — same semantics as the
        # tile-list capacity truncation that produced these slots.
        e_cap = max(step, int(tk * trunc_frac) // step * step)
        if e_cap >= tk:
            trunc_frac = 0.0
        else:
            if ov_cap <= 0:
                ov_cap = step
            pos = order[:e_cap].astype(jnp.int32)
            rank_p = rank[:e_cap]
            w_first = jnp.maximum(rank_p[::group], 0)
            n_real = jnp.sum(ids != n_surfels, dtype=jnp.int32)
            ov_slots = order[e_cap:e_cap + ov_cap].astype(jnp.int32)
            ov_ids = ids_sorted[e_cap:e_cap + ov_cap]
            n_ov = jnp.clip(n_real - e_cap, 0, ov_cap).astype(jnp.int32)
            return (pos, rank_p, w_first, rank_of_id, ov_slots, ov_ids,
                    n_ov)

    e_pad = (tk + step - 1) // step * step
    pad = e_pad - tk
    # pad entries gather row 0 but carry rank -1: their one-hot column
    # is all-zero, so they contribute nothing
    pos = jnp.concatenate([order.astype(jnp.int32),
                           jnp.zeros((pad,), jnp.int32)])
    rank_p = jnp.concatenate([rank, jnp.full((pad,), -1, jnp.int32)])
    w_first = jnp.maximum(rank_p[::group], 0)               # [E/group]
    return pos, rank_p, w_first, rank_of_id


def _ranksum_alloc(n_plus1: int, group: int) -> int:
    """Accumulator row count: every write window [w, w+group) with
    w <= max rank <= n_plus1-1 fits, and the last row (the dummy rank
    for absent ids) is never written."""
    return (n_plus1 + group + 7) // 8 * 8


@partial(jax.jit, static_argnames=("height", "width", "tile_h", "tile_w"))
def tile_rays(K: jax.Array, height: int, width: int, tile_h: int,
              tile_w: int):
    """Per-tile pixel rays and coordinates.

    Returns (rays [T, P, 3], pix [T, P, 2]) with P = tile_h*tile_w, tiles
    in row-major (ty, tx) order, pixels row-major within the tile.
    """
    rays, pix = common.pixel_grid(K, height, width)
    ty, tx = height // tile_h, width // tile_w

    def to_tiles(a):
        c = a.shape[-1]
        a = a.reshape(ty, tile_h, tx, tile_w, c)
        return a.transpose(0, 2, 1, 3, 4).reshape(ty * tx,
                                                  tile_h * tile_w, c)

    return to_tiles(rays), to_tiles(pix)


def untile_px(chans_tiled: jax.Array, height: int, width: int, tile_h: int,
              tile_w: int) -> jax.Array:
    """[T, P, C_ch] (pixel-major kernel output) -> [C_ch, H, W]."""
    ty, tx = height // tile_h, width // tile_w
    n_ch = chans_tiled.shape[2]
    a = chans_tiled.reshape(ty, tx, tile_h, tile_w, n_ch)
    return a.transpose(4, 0, 2, 1, 3).reshape(n_ch, height, width)


def tile_image(img: jax.Array, tile_h: int, tile_w: int) -> jax.Array:
    """[H, W] or [H, W, C] image -> [T, P(, C)] in kernel tile order
    (tiles row-major over (ty, tx), pixels row-major within a tile)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    height, width = img.shape[:2]
    ty, tx = height // tile_h, width // tile_w
    a = img.reshape(ty, tile_h, tx, tile_w, img.shape[-1])
    a = a.transpose(0, 2, 1, 3, 4).reshape(ty * tx, tile_h * tile_w,
                                           img.shape[-1])
    return a[..., 0] if squeeze else a


def untile_image(tiled: jax.Array, height: int, width: int, tile_h: int,
                 tile_w: int) -> jax.Array:
    """[T, P] per-tile scalar map -> [H, W] (inverse of tile_image)."""
    ty, tx = height // tile_h, width // tile_w
    a = tiled.reshape(ty, tx, tile_h, tile_w)
    return a.transpose(0, 2, 1, 3).reshape(height, width)


def pack_features(packed: common.PackedSurfels) -> jax.Array:
    """PackedSurfels -> F [N+1, 16] (last row = zero padding target).

    Layout: 0:3 p | 3:6 gu | 6:9 gv | 9:12 n | 12 opacity | 13 depth |
    14 cx | 15 cy.
    """
    n = packed.depth.shape[0]
    F = jnp.concatenate([
        packed.p, packed.gu, packed.gv, packed.n,
        packed.opacity[:, None], packed.depth[:, None],
        packed.center_xy], axis=1)
    return jnp.concatenate([F, jnp.zeros((1, 16), F.dtype)], axis=0)



def build_bucketed_lists(packed: common.PackedSurfels, height: int,
                         width: int, tile_h: int, tile_w: int,
                         k_big: int, k_small: int, q_big: int,
                         cap_ty: int = 9, cap_tx: int = 9):
    """Two-capacity tile buckets (the "bucketed two-capacity launches"
    candidate of docs/PERF.md, measured round 5).

    Tile occupancy is extremely bimodal on LiDAR range images (bench
    scene at 4x16/margin 1.5: p50 = 77 binned surfels, p90 = 768): one
    padded [T, K] layout taxes every slot-level consumer — the
    per-iteration feature gather, kernel block DMAs, and the gradient
    reduction — with the worst-case capacity.  Here the ``q_big``
    highest-count tiles keep ``k_big`` slots and the rest truncate to
    ``k_small`` (depth-ordered lists drop the FARTHEST surfels — the
    same semantics as the capacity cap itself), cutting padded slots to
    ~55% of T*K at the measured distribution.

    Returns (lists_b [q_big, k_big], counts_b, idx_b [q_big],
             lists_s [T-q_big, k_small], counts_s, idx_s) with idx_*
    sorted ascending (raster order within each bucket).
    """
    lists, counts, _ = build_tile_lists_sorted(
        packed, height, width, tile_h, tile_w, k_big, cap_ty, cap_tx)
    order = jnp.argsort(-counts)
    idx_b = jnp.sort(order[:q_big])
    idx_s = jnp.sort(order[q_big:])
    lists_b = lists[idx_b]
    counts_b = counts[idx_b]
    lists_s = lists[idx_s][:, :k_small]
    counts_s = jnp.minimum(counts[idx_s], k_small)
    return (lists_b, counts_b, idx_b.astype(jnp.int32),
            lists_s, counts_s, idx_s.astype(jnp.int32))
