#!/usr/bin/env python3
"""Micro-benchmark for the Pallas rasterizer: forward-only, backward-only,
and binning timings on the bench.py scene, for kernel optimization work.

Usage: python tools/kernel_bench.py [--n 100000] [--chunk 256]
         [--tile-h 8] [--tile-w 32] [--cap 3072] [--iters 20]
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def run_multiview(opts, params, args):
    """Batched B-view fwd+bwd throughput (shared surfels, B poses)."""
    from splatloam_tpu.ops.rasterizer.api import (prepare_tiles_batch,
                                                  render_batch)
    B = opts.views
    H, W = opts.h, opts.w
    xyz, scales, quat, opac, _, K = args
    angs = np.linspace(0, 0.3, B)
    T_b = jnp.stack([jnp.asarray(np.array(
        [[np.cos(a), -np.sin(a), 0, 0.2 * i],
         [np.sin(a), np.cos(a), 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32)) for i, a in enumerate(angs)])
    K_b = jnp.stack([K] * B)
    tiles = prepare_tiles_batch(xyz, scales, quat, opac, T_b, K_b,
                                params, margin_px=4.0)
    jax.block_until_ready(tiles.lists)

    from splatloam_tpu.ops.rasterizer.pallas_raster import \
        rasterize_pallas_batched

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(opts.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / opts.iters
        print(json.dumps({"op": f"{name} x{B}views",
                          "ms": round(dt * 1e3, 3),
                          "rays_per_s_M":
                              round(B * H * W / dt / 1e6, 3)}))

    @jax.jit
    def fwd_raw(xyz, s, q, o):
        c = rasterize_pallas_batched(xyz, s, q, o, T_b, K_b, params,
                                     tiles=tiles)
        return c["depth_sum"], c["alpha"]

    timeit("fwd_raw", fwd_raw, xyz, scales, quat, opac)

    def loss_raw(xyz, s, q, o):
        c = rasterize_pallas_batched(xyz, s, q, o, T_b, K_b, params,
                                     tiles=tiles)
        return jnp.mean(jnp.abs(c["depth_sum"])) + jnp.mean(c["alpha"])

    timeit("fwd+bwd_raw", jax.jit(jax.grad(loss_raw, argnums=(0, 1, 2, 3))),
           xyz, scales, quat, opac)

    def loss(xyz, s, q, o):
        pkg = render_batch(xyz, s, q, o, T_b, K_b, params, tiles=tiles)
        return (jnp.mean(jnp.abs(pkg["surf_depth"] - 10.0))
                + 0.1 * jnp.mean(pkg["rend_alpha"]))

    timeit("fwd+bwd", jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))),
           xyz, scales, quat, opac)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--tile-h", type=int, default=4)
    ap.add_argument("--tile-w", type=int, default=16)
    ap.add_argument("--cap", type=int, default=768)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--median", action="store_true")
    ap.add_argument("--dist", action="store_true")
    ap.add_argument("--layout", default="tiled",
                    choices=["tiled", "flat"])
    ap.add_argument("--flat-cap", type=int, default=0)
    ap.add_argument("--views", type=int, default=1,
                    help="batched multi-view rendering (B poses, "
                         "shared surfels, one kernel grid)")
    ap.add_argument("--scatter", default="rmw",
                    choices=["rmw", "plan", "ranksum", "fused"])
    ap.add_argument("--mv", action="store_true",
                    help="use the multiview path even at --views 1 "
                         "(comparable B-scaling table rows)")
    opts = ap.parse_args()

    from splatloam_tpu.cli import _enable_compilation_cache
    _enable_compilation_cache()
    import bench
    from splatloam_tpu.ops.rasterizer import RenderParams
    from splatloam_tpu.ops.rasterizer.api import prepare_tiles
    from splatloam_tpu.ops.rasterizer.pallas_raster import rasterize_pallas

    H, W = opts.h, opts.w
    bench.H, bench.W = H, W
    params = RenderParams(height=H, width=W, backend="pallas",
                          chunk=opts.chunk, tile_h=opts.tile_h,
                          tile_w=opts.tile_w, tile_list_capacity=opts.cap,
                          with_median=opts.median, with_dist=opts.dist,
                          layout=opts.layout, flat_capacity=opts.flat_cap,
                          scatter=opts.scatter)
    rng = np.random.default_rng(0)
    args = bench.make_scene(rng, opts.n, H, W)

    if opts.views > 1 or opts.mv:
        return run_multiview(opts, params, args)

    tiles = prepare_tiles(*args, params, margin_px=4.0)
    jax.block_until_ready(tiles.counts)
    occ = np.asarray(tiles.counts)
    print(f"# tiles: mean count {occ.mean():.0f}, max {occ.max()}, "
          f"pairs {occ.sum() * opts.tile_h * opts.tile_w / 1e6:.0f}M")

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(opts.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / opts.iters
        print(json.dumps({"op": name, "ms": round(dt * 1e3, 3)}))
        return dt

    # binning
    timeit("prepare_tiles", jax.jit(
        lambda *a: prepare_tiles(*a, params, margin_px=4.0)), *args)

    # forward only
    @jax.jit
    def fwd(*a):
        out = rasterize_pallas(*a, params, tiles=tiles)
        return out["depth_sum"], out["alpha"], out["normal_sum"]

    timeit("forward", fwd, *args)

    # forward+backward
    def loss(xyz, scales, quat, opac, T, K):
        out = rasterize_pallas(xyz, scales, quat, opac, T, K, params,
                               tiles=tiles)
        return (jnp.sum(out["depth_sum"]) * 0.01 + jnp.sum(out["alpha"])
                + 0.1 * jnp.sum(out["normal_sum"]))

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    t_fb = timeit("fwd+bwd", grad, *args)
    print(json.dumps({"op": "rays_per_s_fwd_bwd",
                      "value": round(H * W / t_fb / 1e6, 3),
                      "unit": "Mrays/s"}))


if __name__ == "__main__":
    main()
