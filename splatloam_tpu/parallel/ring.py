"""Ring alpha-compositing over depth-partitioned surfel shards.

The beyond-HBM scaling path (SURVEY.md §5 "long-context analog"): when a
submap's surfel pool exceeds one chip's HBM, shard the POOL itself over
the "model" axis and never materialize it — the ring-attention analog for
alpha compositing.

Front-to-back alpha blending is associative over depth-contiguous
SEGMENTS: a segment's effect on a pixel is the pair
(T_seg = prod(1-a_i),  S_seg = sum_i w_i * payload_i) and two segments
combine as

    S = S_front + T_front * S_back,      T = T_front * T_back,

so if device d holds the d-th depth bucket of the surfels (for the
current view), each device renders ONLY its shard and the per-pixel
(T, S) carries fold across devices front-to-back.  Carries are O(pixels)
— tiny next to the pool — and ride the ICI ring via ppermute, one hop per
step: device d accumulates the prefix composite of buckets 0..d and the
last device ends with the full image.  Memory per device stays
O(pool/n_devices + image).

This module is the correctness-level prototype on the virtual CPU mesh
(jnp renderer): `depth_partition_shards` builds the per-view depth
bucketing, `ring_render` folds the ring.  The median/distortion channels
need per-segment crossing state and are not folded here (mapping losses
use neither, ref configs depth_ratio=0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..model import surfels as S
from ..ops.rasterizer import RenderParams
from ..ops.rasterizer.jnp_ref import rasterize_jnp


def depth_partition_shards(surfels: S.Surfels, T_cw, n_shards: int):
    """Per-view depth bucketing: returns a [C] permutation placing the
    pool in ascending camera-depth order, padded inactive slots last, so
    an even split into n_shards yields depth-contiguous buckets.

    (In the production >HBM path this reshard is a one-hop ppermute of
    pool slices per keyframe; here it is a host-side gather.)
    """
    xyz_h = jnp.concatenate([surfels.params.xyz,
                             jnp.ones((surfels.capacity, 1))], axis=1)
    depth = jnp.linalg.norm((xyz_h @ T_cw.T)[:, :3], axis=-1)
    key = jnp.where(surfels.active, depth, jnp.inf)
    return jnp.argsort(key)


def ring_render(mesh: Mesh, params: RenderParams):
    """Build a jitted ring-composited renderer.

    fn(surf_perm: Surfels permuted depth-ascending, T_cw, K) ->
    channel dict (depth_sum/alpha/normal_sum/final_T as in the
    single-device rasterizer).  The pool arrives sharded P("model") —
    each device holds one depth bucket and renders only it.
    """
    n_model = mesh.shape["model"]
    height, width = params.height, params.width

    def step(params_shard: S.SurfelParams, active_shard, T_cw, K):
        scaling = jnp.exp(params_shard.log_scale)
        opacity = jax.nn.sigmoid(params_shard.logit_opacity) * \
            active_shard
        chans = rasterize_jnp(params_shard.xyz, scaling,
                              params_shard.quat, opacity, T_cw, K,
                              height, width, params.chunk)
        # local segment state: (T_seg, S_seg...)
        seg = dict(T=chans["final_T"],
                   depth_sum=chans["depth_sum"],
                   alpha=chans["alpha"],
                   normal_sum=chans["normal_sum"])

        # ring fold: segments rotate backward one hop per step while each
        # device extends its accumulator with the next-deeper bucket —
        # after n-1 hops device 0 holds the in-order composite of buckets
        # [0..n-1] (other devices hold wrapped orders; only device 0's is
        # the valid front-to-back result, broadcast back via psum-mask).
        def combine(front, back):
            return dict(
                T=front["T"] * back["T"],
                depth_sum=front["depth_sum"] + front["T"]
                * back["depth_sum"],
                alpha=front["alpha"] + front["T"] * back["alpha"],
                normal_sum=front["normal_sum"]
                + front["T"][..., None] * back["normal_sum"],
            )

        bwd = [(i, (i - 1) % n_model) for i in range(n_model)]

        def hop(carry, _):
            acc, rot = carry
            rot = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, "model", perm=bwd), rot)
            return (combine(acc, rot), rot), None

        (full, _), _ = jax.lax.scan(hop, (seg, seg), None,
                                    length=n_model - 1)
        idx = jax.lax.axis_index("model")
        mask = (idx == 0).astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(
                a * mask.reshape((1,) * a.ndim), "model"), full)
        return out

    spec_model = P("model")
    param_spec = S.SurfelParams(*(spec_model,) * 4)
    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(param_spec, spec_model, P(), P()),
        out_specs={"T": P(), "depth_sum": P(), "alpha": P(),
                   "normal_sum": P()},
        check_vma=False)
    return jax.jit(mapped)
