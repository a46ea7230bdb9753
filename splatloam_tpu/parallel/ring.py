"""Ring alpha-compositing over depth-partitioned surfel shards.

The beyond-HBM scaling path (SURVEY.md §5 "long-context analog"): when a
submap's surfel pool exceeds one chip's HBM, shard the POOL itself over
the "model" axis and never materialize it — the ring-attention analog for
alpha compositing.

Front-to-back alpha blending is associative over depth-contiguous
SEGMENTS: a segment's effect on a pixel is the pair
(T_seg = prod(1-a_i),  S_seg = sum_i w_i * payload_i) and two segments
combine as

    S = S_front + T_front * S_back,      T = T_front * T_back.

The depth-distortion channel also folds: with A = sum w (alpha), D =
sum w*m (depth_sum) per segment,

    dist = dist_f + T_f * (A_f * D_b - D_f * A_b) + T_f^2 * dist_b

(derived by substituting the global prefix sums A_f + T_f*A_b^prefix into
the per-splat accumulator; validated against the monolithic jnp dist
channel in tests/test_parallel.py).  The MEDIAN channel needs the
transmittance 0.5-crossing position — per-segment state would be the
crossing flag + depth, combinable in principle, but no loss consumes it
(reference configs set depth_ratio=0), so ring paths require
depth_ratio == 0 and skip it.

If device d holds the d-th depth bucket of the surfels (for the current
view), each device renders ONLY its shard and the per-pixel (T, S)
carries fold across devices front-to-back.  Carries are O(pixels) — tiny
next to the pool — and ride the ICI ring via ppermute, one hop per step:
after n-1 hops device 0 holds the in-order composite, broadcast back via
a masked psum.  Memory per device stays O(pool/n_devices + image).

`ring_render` is the standalone renderer (jnp golden or Pallas backend);
`parallel/sharded.py:sharded_optimize_ring` wires the same fold into the
mapper's full optimize loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..model import surfels as S
from ..ops.rasterizer import RenderParams
from ..ops.rasterizer.jnp_ref import rasterize_jnp


def ring_combine(front: dict, back: dict) -> dict:
    """Associative combine of two depth-adjacent segment states.

    Keys: "T" [.., H, W]-like transmittance, "alpha", "depth_sum",
    "normal_sum" (trailing [3]), optional "dist".
    """
    out = dict(
        T=front["T"] * back["T"],
        depth_sum=front["depth_sum"] + front["T"] * back["depth_sum"],
        alpha=front["alpha"] + front["T"] * back["alpha"],
        normal_sum=front["normal_sum"]
        + front["T"][..., None] * back["normal_sum"],
    )
    if "dist" in front:
        out["dist"] = (front["dist"]
                       + front["T"] * (front["alpha"] * back["depth_sum"]
                                       - front["depth_sum"] * back["alpha"])
                       + front["T"] ** 2 * back["dist"])
    return out


def ring_fold(seg: dict, axis: str, n_devices: int) -> dict:
    """Fold per-device segment states front-to-back over a mesh axis.

    Device d must hold depth bucket d (ascending).  Segments rotate
    backward one hop per step while each device extends its accumulator
    with the next-deeper bucket; after n-1 hops device 0 holds the
    in-order composite of buckets [0..n-1] (other devices hold wrapped
    orders), broadcast to all via a masked psum.  Differentiable: the
    ppermute/psum transposes are the reverse ring.
    """
    bwd = [(i, (i - 1) % n_devices) for i in range(n_devices)]

    def hop(carry, _):
        acc, rot = carry
        rot = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis, perm=bwd), rot)
        return (ring_combine(acc, rot), rot), None

    (full, _), _ = jax.lax.scan(hop, (seg, seg), None,
                                length=n_devices - 1)
    idx = jax.lax.axis_index(axis)
    mask = (idx == 0).astype(jnp.float32)
    return jax.tree_util.tree_map(
        lambda a: jax.lax.psum(a * mask.reshape((1,) * a.ndim), axis),
        full)


def _pack_state_rows(params: S.SurfelParams, active, mu: S.SurfelParams,
                     nu: S.SurfelParams):
    """Stack (params, active, Adam moments) into [rows, 31] float rows so
    one scatter/ppermute moves a slot's entire state."""
    def cat(p):
        return [p.xyz, p.log_scale, p.quat, p.logit_opacity[:, None]]
    return jnp.concatenate(
        cat(params) + [active.astype(jnp.float32)[:, None]]
        + cat(mu) + cat(nu), axis=1)


def _unpack_state_rows(rows):
    def take(base):
        return S.SurfelParams(
            xyz=rows[:, base:base + 3],
            log_scale=rows[:, base + 3:base + 5],
            quat=rows[:, base + 5:base + 9],
            logit_opacity=rows[:, base + 9])
    return take(0), rows[:, 10] > 0.5, take(11), take(21)


def ring_reshard(surf: S.Surfels, st: S.AdamState, d_key, axis: str,
                 n_model: int):
    """Depth-contiguous re-partition of a "model"-sharded pool WITHOUT
    materializing it: an (n-1)-hop ppermute ring routes each slot's
    packed (params, active, Adam-moment) row to its destination band.

    Only the scalar depth KEYS are all-gathered (4 bytes/slot — ~3% of a
    124-byte packed state row); per-device HBM stays at O(2 * band) rows
    (the in-transit buffer + the output band), so the reshard honours
    the same >HBM bound as the ring compositing itself.  This replaces
    the prototype transient-all_gather reshard (which briefly held the
    full pool on every device).

    Device m ends holding exactly the slots whose global depth rank is
    in [m*rows, (m+1)*rows) — bitwise the same layout as all-gathering
    the pool and slicing the global argsort (jnp.argsort is stable, and
    every device sorts the identical gathered key vector).
    """
    rows = d_key.shape[0]
    midx = jax.lax.axis_index(axis)
    d_full = jax.lax.all_gather(d_key, axis, tiled=True)
    perm = jnp.argsort(d_full)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    my_rank = jax.lax.dynamic_slice_in_dim(inv, midx * rows, rows)

    packed = _pack_state_rows(surf.params, surf.active, st.mu, st.nu)
    out = jnp.zeros_like(packed)
    buf, brank = packed, my_rank
    bwd = [(i, (i - 1) % n_model) for i in range(n_model)]
    for h in range(n_model):
        mine = (brank // rows) == midx
        dst = jnp.where(mine, brank % rows, rows)    # rows -> dropped
        out = out.at[dst].set(buf, mode="drop")
        if h < n_model - 1:
            buf = jax.lax.ppermute(buf, axis, perm=bwd)
            brank = jax.lax.ppermute(brank, axis, perm=bwd)

    params2, active2, mu2, nu2 = _unpack_state_rows(out)
    return (S.Surfels(params=params2, active=active2),
            S.AdamState(mu=mu2, nu=nu2, step=st.step))


def depth_partition_shards(surfels: S.Surfels, T_cw, n_shards: int):
    """Per-view depth bucketing: returns a [C] permutation placing the
    pool in ascending camera-depth order, padded inactive slots last, so
    an even split into n_shards yields depth-contiguous buckets.

    (In the production >HBM path this reshard is an all-to-all of pool
    slices per keyframe; here it is a host-side gather.)
    """
    xyz_h = jnp.concatenate([surfels.params.xyz,
                             jnp.ones((surfels.capacity, 1))], axis=1)
    depth = jnp.linalg.norm((xyz_h @ T_cw.T)[:, :3], axis=-1)
    key = jnp.where(surfels.active, depth, jnp.inf)
    return jnp.argsort(key)


def _shard_channels(params_shard: S.SurfelParams, active_shard, T_cw, K,
                    params: RenderParams, with_dist: bool):
    """Render ONE depth bucket -> its segment state dict."""
    scaling = jnp.exp(params_shard.log_scale)
    opacity = jax.nn.sigmoid(params_shard.logit_opacity) * active_shard
    if params.backend == "pallas":
        from ..ops.rasterizer.pallas_raster import rasterize_pallas
        chans = rasterize_pallas(params_shard.xyz, scaling,
                                 params_shard.quat, opacity, T_cw, K,
                                 params._replace(with_median=False,
                                                 with_dist=with_dist))
    else:
        chans = rasterize_jnp(params_shard.xyz, scaling,
                              params_shard.quat, opacity, T_cw, K,
                              params.height, params.width, params.chunk)
    seg = dict(T=chans["final_T"], depth_sum=chans["depth_sum"],
               alpha=chans["alpha"], normal_sum=chans["normal_sum"])
    if with_dist:
        seg["dist"] = chans["dist"]
    return seg


def ring_render(mesh: Mesh, params: RenderParams, with_dist: bool = False):
    """Build a jitted ring-composited renderer.

    fn(surf_perm: Surfels permuted depth-ascending, T_cw, K) ->
    channel dict (depth_sum/alpha/normal_sum[/dist]/T as in the
    single-device rasterizer).  The pool arrives sharded P("model") —
    each device holds one depth bucket and renders only it, through the
    jnp golden renderer or the Pallas kernels (params.backend); the
    median channel is not folded (see module docstring).
    """
    n_model = mesh.shape["model"]

    def step(params_shard: S.SurfelParams, active_shard, T_cw, K):
        seg = _shard_channels(params_shard, active_shard, T_cw, K,
                              params, with_dist)
        return ring_fold(seg, "model", n_model)

    spec_model = P("model")
    param_spec = S.SurfelParams(*(spec_model,) * 4)
    out_spec = {"T": P(), "depth_sum": P(), "alpha": P(),
                "normal_sum": P()}
    if with_dist:
        out_spec["dist"] = P()
    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(param_spec, spec_model, P(), P()),
        out_specs=out_spec,
        check_vma=False)
    return jax.jit(mapped)
