#!/usr/bin/env python3
"""End-to-end SLAM throughput on synthetic KITTI-scale data (one chip).

Runs the full per-frame pipeline (preprocess -> track -> map) on a
synthetic world at 64x1024 with production-ish settings and prints the
phase profile + frames/s.  Usage:  python tools/bench_slam_e2e.py [n_frames]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import numpy as np

from splatloam_tpu.cli import _enable_compilation_cache
_enable_compilation_cache()


def main(n_frames=12):
    import synthetic
    from splatloam_tpu.config import from_dict, Configuration
    from splatloam_tpu.preprocessing import Preprocessor
    from splatloam_tpu.profiling import get_profiler
    from splatloam_tpu.slam import SLAM

    cfg = synthetic.make_config(
        Path("/tmp/bench_slam"),
        preprocessing={"image_height": 64, "image_width": 1024,
                       "depth_min": 1.0, "depth_max": 50.0},
        mapping={"num_iterations": 200, "densify_percentage": 0.3,
                 "densify_threshold_opacity": 0.2,
                 "pruning_min_opacity": 0.1,
                 "opt_scaling_max": 0.25, "opt_scaling_max_penalty": 1.0,
                 "lmodel_threshold_ngaussians": 150000},
        tracking={"method": "gsaligner", "keyframe_threshold_nframes": -1,
                  "keyframe_threshold_distance": 2.0,
                  "keyframe_threshold_fitness": 0.3},
        compute={"backend": "auto", "initial_capacity": 16384,
                 "keyframe_capacity": 16, "chunk": 256,
                 "tile_h": 16, "tile_w": 32, "tile_list_capacity": 4096,
                 "rebin_every": 8})
    rng = np.random.default_rng(0)
    pre = Preprocessor(cfg)
    slam = SLAM(cfg)
    poses = synthetic.straight_trajectory(n_frames, step=0.8)
    prof = get_profiler()

    # generate clouds up front (dataset IO is not what we measure here)
    clouds = [synthetic.sensor_cloud(rng, p, n=120000, radius=20.0,
                                     floor_r=18.0) for p in poses]

    t_start = time.perf_counter()
    t_warm = None
    for i, (cloud, pose) in enumerate(zip(clouds, poses)):
        with prof.phase("preprocess"):
            frame = pre(cloud, 0.1 * i, pose)
        with prof.phase("process"):
            slam.process(frame)
        if i == 1:
            t_warm = time.perf_counter()  # after compile warm-up frames
        print(f"frame {i}: {time.perf_counter() - t_start:.1f}s elapsed, "
              f"{slam.local_models[-1].no_gaussians} surfels", flush=True)
    total = time.perf_counter() - t_start
    steady = time.perf_counter() - t_warm if t_warm else total
    print(prof.report())
    print(f"TOTAL {total:.1f}s for {n_frames} frames "
          f"({(n_frames - 2) / steady:.2f} fps steady-state)")

    # quality: render last keyframe vs its measurement
    import jax.numpy as jnp
    from splatloam_tpu.ops.rasterizer import RenderParams, render
    model = slam.local_models[-1]
    kf = model.keyframes[-1]
    cam = kf.camera_in_model()
    cc = cfg.compute
    params = RenderParams(height=cam.height, width=cam.width,
                          backend=cc.backend.value, chunk=cc.chunk,
                          tile_h=cc.tile_h, tile_w=cc.tile_w,
                          tile_list_capacity=cc.tile_list_capacity)
    s = model.surfels
    out = render(s.params.xyz, s.scaling, s.rotation, s.opacity,
                 cam.T_cw, cam.K, params)
    v = np.asarray(cam.valid)
    l1 = np.abs(np.asarray(out["surf_depth"]) - np.asarray(cam.depth))[v]
    print(f"last-keyframe depth L1: median {np.median(l1):.4f} m, "
          f"mean {l1.mean():.4f} m")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
