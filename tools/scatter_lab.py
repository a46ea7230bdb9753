#!/usr/bin/env python3
"""In-context scatter-path experiments on the bench block (TPU).

Measures the production optimize block (bench._build_block: one rebin +
16 fwd+bwd+SGD iterations) under different gradient-reduction variants,
plus standalone probes for individual suspects (the dFg transpose, the
permutation gather).  One mode per process (RASTER_ABLATE is read at
trace time).

Usage: python tools/scatter_lab.py --mode rmw|plan|fakescatter|nobwd
       python tools/scatter_lab.py --mode transpose|permgather
"""
import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ap = argparse.ArgumentParser()
ap.add_argument("--mode", required=True)
ap.add_argument("--rebin", type=int, default=16)
ap.add_argument("--blocks", type=int, default=4)
ap.add_argument("--n", type=int, default=100_000)
ap.add_argument("--tile-h", type=int, default=4)
ap.add_argument("--tile-w", type=int, default=16)
ap.add_argument("--chunk", type=int, default=128)
ap.add_argument("--cap", type=int, default=768)
opts = ap.parse_args()

LABEL = opts.mode  # full requested mode, kept for the result line
if opts.mode in ("fakescatter", "nobwd", "noplan"):
    os.environ["RASTER_ABLATE"] = opts.mode
if "+" in opts.mode:
    base, ablate = opts.mode.split("+", 1)
    os.environ["RASTER_ABLATE"] = ablate
    opts.mode = base

from splatloam_tpu.cli import _enable_compilation_cache

_enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import bench
from splatloam_tpu.ops.rasterizer import RenderParams


def emit(**kw):
    print(json.dumps(kw), flush=True)


def sync():
    # force a D2H so the relay switches to synchronous dispatch
    jax.block_until_ready(jnp.zeros(()) + 1.0)
    float(jnp.zeros(()))


def timeit(name, fn, *a, iters=4):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    emit(op=name, ms=round(dt * 1e3, 3))
    return dt


def main():
    rng = np.random.default_rng(0)
    sync()

    if opts.mode == "probes":
        bt, K = 1024, 768
        x = jnp.asarray(rng.standard_normal((bt, 16, K)), jnp.float32)
        f = jax.jit(lambda x: jnp.swapaxes(x, 1, 2)
                    .reshape(bt * K, 16) + 0.0)
        timeit("dFg transpose [1024,16,768]->[786k,16]", f, x, iters=20)
        perm = jnp.asarray(rng.permutation(bt * K), jnp.int32)
        rows = jnp.asarray(
            rng.standard_normal((bt * K, 16)), jnp.float32)
        g = jax.jit(lambda r, p: r[p] + 0.0)
        timeit("perm gather 786k x 16f rows", g, rows, perm, iters=20)
        return

    if opts.mode == "rmwprobe":
        # standalone RMW scatter at the PRODUCTION in-context shapes
        # (margin 1.5, 4x16/c128/768) across tiles-per-step variants:
        # separates the kernel's own cost from block-coupling effects
        import jax.numpy as jnp
        from splatloam_tpu.ops.rasterizer.api import prepare_tiles
        from splatloam_tpu.ops.rasterizer import pallas_raster as PR
        params = RenderParams(height=bench.H, width=bench.W,
                              backend="pallas", chunk=128, tile_h=4,
                              tile_w=16, tile_list_capacity=768,
                              with_median=False, with_dist=False)
        args = bench.make_scene(rng, opts.n)
        tiles = prepare_tiles(*args, params, margin_px=1.5)
        jax.block_until_ready(tiles.counts)
        bt, K = tiles.lists.shape
        emit(op="rows", real=int(np.asarray(tiles.counts).sum()),
             padded=bt * K)
        dFg = jnp.asarray(rng.standard_normal((bt, K, 16)), jnp.float32)
        ids = PR._flat_view_ids(tiles.lists[None], opts.n + 1)
        for tps in (1, 4, 8, 16):
            f = jax.jit(lambda d, i, c, tps=tps: PR._scatter_rows(
                d, i, c, opts.n + 1, tps=tps))
            timeit(f"rmw_scatter tps={tps}", f, dFg, ids, tiles.counts,
                   iters=20)
        return

    if opts.mode == "rsplanbuild":
        from splatloam_tpu.ops.rasterizer import binning as BN
        from splatloam_tpu.ops.rasterizer.api import prepare_tiles
        params = RenderParams(height=bench.H, width=bench.W,
                              backend="pallas", chunk=128, tile_h=4,
                              tile_w=16, tile_list_capacity=768,
                              with_median=False, with_dist=False)
        args = bench.make_scene(rng, opts.n)
        tiles = prepare_tiles(*args, params, margin_px=1.5)
        jax.block_until_ready(tiles.counts)
        f = jax.jit(lambda l: BN.build_ranksum_plan(l, opts.n))
        timeit("build_ranksum_plan(T*K)", f, tiles.lists, iters=10)
        return

    scatter = opts.mode if opts.mode in ("plan", "ranksum",
                                         "fused") else "rmw"
    tps = 1
    layout = "tiled"
    if opts.mode.startswith("rmw") and opts.mode[3:].isdigit():
        tps = int(opts.mode[3:])      # e.g. --mode rmw8
    if opts.mode == "bucketed":       # two-capacity buckets + fused RMW
        layout, scatter = "bucketed", "fused"
    elif opts.mode == "bucketedrs":   # two-capacity buckets + ranksum
        layout, scatter = "bucketed", "ranksum"
    elif opts.mode == "flat":         # compacted slot pool + flat RMW
        layout = "flat"
    params = RenderParams(height=bench.H, width=bench.W, backend="pallas",
                          chunk=opts.chunk, tile_h=opts.tile_h,
                          tile_w=opts.tile_w,
                          tile_list_capacity=opts.cap,
                          with_median=False, with_dist=False,
                          scatter=scatter, scatter_tps=tps,
                          layout=layout, bucket_k_small=opts.chunk,
                          bucket_frac=0.5)
    args = bench.make_scene(rng, opts.n)
    block = bench._build_block(args, params, opts.rebin)
    g = block(*args[:4])
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(opts.blocks):
        g = block(*args[:4])
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / (opts.blocks * opts.rebin)
    emit(op=f"block[{LABEL}] per-iter", n=opts.n,
         geo=f"{opts.tile_h}x{opts.tile_w}/c{opts.chunk}/k{opts.cap}",
         ms=round(dt * 1e3, 3),
         mrays_per_s=round(bench.H * bench.W / dt / 1e6, 3))


if __name__ == "__main__":
    main()
