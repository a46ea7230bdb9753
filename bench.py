#!/usr/bin/env python3
"""Headline benchmark: rasterizer forward+backward throughput on one chip.

Workload matches the reference's hot loop (SURVEY.md §3.3 / BASELINE.md
config 2): 100k surfels rendered+differentiated through a 64x1024 spherical
range image — the mapper runs this 200-500x per keyframe.  Prints ONE JSON
line: rays/s (pixels * iters / sec, fwd+bwd through the full loss chain).

vs_baseline: ratio against 5.0e7 rays/s, our estimate of the reference CUDA
``diff-surfel-spherical-rasterization`` fwd+bwd on a desktop GPU (~1.3 ms
per 64x1024 fwd+bwd iteration at 100k splats; the repo publishes no numbers
— see BASELINE.md).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from splatloam_tpu.cli import _enable_compilation_cache
_enable_compilation_cache()

BASELINE_RAYS_PER_S = 5.0e7
H, W = 64, 1024
N_SURFELS = 100_000
ITERS = 30


def make_scene(rng, n):
    from splatloam_tpu.geometry import se3, spherical
    theta = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(-2.0, 4.0, n)
    r = rng.uniform(6.0, 50.0, n)
    xyz = np.stack([r * np.cos(theta), r * np.sin(theta), z],
                   -1).astype(np.float32)
    k = n // 3
    xyz[:k] = np.stack([rng.uniform(-40, 40, k), rng.uniform(-40, 40, k),
                        np.full(k, -1.7)], -1)
    normals = -xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
    quat = np.asarray(se3.quat_from_normal(jnp.asarray(normals)))
    scales = rng.uniform(0.05, 0.3, (n, 2)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(xyz), H, W)
    return (jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quat),
            jnp.asarray(opac), jnp.eye(4), jnp.asarray(K))


def main():
    from splatloam_tpu.ops.rasterizer import RenderParams, render
    from splatloam_tpu.ops.rasterizer.api import prepare_tiles

    on_tpu = jax.default_backend() == "tpu"
    # the mapper's production configuration: median/dist channels off (not
    # in the loss), tile lists rebuilt once per REBIN-iteration block
    params = RenderParams(height=H, width=W,
                          backend="pallas" if on_tpu else "jnp",
                          chunk=256, tile_h=8, tile_w=32,
                          tile_list_capacity=3072,
                          with_median=False, with_dist=False)
    REBIN = 8
    rng = np.random.default_rng(0)
    args = make_scene(rng, N_SURFELS)
    gt_depth = jnp.ones((H, W)) * 10.0
    valid = jnp.ones((H, W), bool)

    def loss(xyz, scales, quat, opac, tiles):
        pkg = render(xyz, scales, quat, opac, args[4], args[5], params,
                     tiles=tiles)
        l1 = jnp.mean(jnp.abs(pkg["surf_depth"] - gt_depth) * valid)
        an = jnp.mean(-jnp.log(jnp.clip(pkg["rend_alpha"], 1e-7, 1.0)))
        nl = jnp.mean(1.0 - jnp.sum(pkg["rend_normal"] *
                                    pkg["surf_normal"], -1))
        return l1 + 0.1 * an + 0.1 * nl

    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3))

    @jax.jit
    def block(xyz, scales, quat, opac):
        tiles = prepare_tiles(xyz, scales, quat, opac, args[4], args[5],
                              params, margin_px=4.0)

        def body(_, p):
            g = grad_fn(*p, tiles)
            # small SGD step so every iteration is distinct work (the real
            # mapper applies Adam here)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-5 * b, p, g)

        return jax.lax.fori_loop(0, REBIN, body,
                                 (xyz, scales, quat, opac))

    g = block(*args[:4])
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        g = block(*args[:4])
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0
    total_iters = ITERS * REBIN

    rays_per_s = H * W * total_iters / dt
    msplats_per_s = N_SURFELS * total_iters / dt / 1e6
    print(json.dumps({
        "metric": "render_fwd_bwd_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
        "extra": {
            "msplats_per_s": round(msplats_per_s, 2),
            "iter_ms": round(dt / total_iters * 1e3, 3),
            "surfels": N_SURFELS, "image": [H, W],
            "backend": params.backend,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
