#!/usr/bin/env python3
"""Reconstruction-parity run (VERDICT r1 next-step #6).

Full pipeline in mapping-GT mode (ref configs *-mapping-gt.yaml:
tracking.method=gt, keyframe every 5 frames) on a synthetic mid-size
"urban canyon" sequence at KITTI geometry (64x1024, 60 frames), then TSDF
meshing and `evaluate_recon` against the ground-truth world cloud — the
protocol of ref utils/eval_utils.py:67-154 (10M mesh samples, 2 cm voxel
downsample, truncated NN both ways, F-score @ 0.2 m).

Prints one JSON line per stage; final line = recon metrics.
Usage: python tools/recon_parity.py [--frames 60] [--out DIR]
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def make_world(rng, n=600_000):
    """Urban canyon: ground strip, two facade walls, pillars, end wall."""
    pts = []
    L, W2, H = 40.0, 7.0, 4.0

    def wall(n, x0, x1, y, z0, z1, axis="y"):
        a = rng.uniform(x0, x1, n)
        b = rng.uniform(z0, z1, n)
        if axis == "y":
            return np.stack([a, np.full(n, y), b], -1)
        return np.stack([np.full(n, y), a, b], -1)

    k = n // 6
    pts.append(wall(k, -5.0, L, -W2, -1.8, H))          # left facade
    pts.append(wall(k, -5.0, L, W2, -1.8, H))           # right facade
    pts.append(wall(k // 2, -W2, W2, L, -1.8, H, "x"))  # end wall
    gx = rng.uniform(-5.0, L, 2 * k)
    gy = rng.uniform(-W2, W2, 2 * k)
    pts.append(np.stack([gx, gy, np.full(2 * k, -1.8)], -1))  # ground
    # pillars/boxes along the canyon
    for i in range(6):
        cx, cy = 4.0 + 5.5 * i, (-1) ** i * 3.0
        m = k // 6
        th = rng.uniform(-np.pi, np.pi, m)
        r = 0.6
        pts.append(np.stack([cx + r * np.cos(th), cy + r * np.sin(th),
                             rng.uniform(-1.8, 1.2, m)], -1))
    return np.concatenate(pts).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default="/tmp/recon_parity")
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--voxel", type=float, default=0.08)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke testing)")
    opts = ap.parse_args()

    import jax
    if opts.cpu:
        jax.config.update("jax_platforms", "cpu")
    from splatloam_tpu.cli import _enable_compilation_cache
    _enable_compilation_cache()
    from splatloam_tpu.config import Configuration, from_dict
    from splatloam_tpu.eval.odometry import evaluate_rpe
    from splatloam_tpu.eval.recon import evaluate_recon
    from splatloam_tpu.eval.tsdf import save_mesh_ply
    from splatloam_tpu.logging_backends import reset_datalogger
    from splatloam_tpu.postprocessing import ResultGraph, mesh_tsdf
    from splatloam_tpu.preprocessing import Preprocessor
    from splatloam_tpu.slam import SLAM

    out = pathlib.Path(opts.out)
    out.mkdir(parents=True, exist_ok=True)
    on_tpu = jax.default_backend() == "tpu"
    cfg = from_dict(Configuration, {
        "preprocessing": {"image_height": opts.height,
                          "image_width": opts.width,
                          "depth_min": 1.0, "depth_max": 60.0,
                          "enable_normal_estimation": False,
                          "enable_ground_segmentation": False},
        # mapping-GT protocol (ref configs/maicity/maicity-01-mapping-gt)
        "tracking": {"method": "gt", "keyframe_threshold_nframes": 5,
                     "keyframe_threshold_distance": -1,
                     "keyframe_threshold_fitness": -1},
        "mapping": {"num_iterations": opts.iters,
                    "densify_percentage": 0.4,
                    "densify_threshold_opacity": 0.5,
                    "densify_threshold_egeom": 0.2,
                    "prob_view_last_keyframe": 0.4,
                    "pruning_min_opacity": 0.05,
                    "opt_scaling_max": 1.0,
                    "lmodel_threshold_nkeyframes": 30,
                    "lmodel_threshold_ngaussians": 400_000},
        "compute": {"backend": "pallas" if on_tpu else "jnp",
                    # the jnp golden renderer materializes O(N x pixels)
                    # blocks: cap the pool on CPU smoke runs
                    "initial_capacity": 65536 if on_tpu else 8192,
                    "keyframe_capacity": 8},
        "logging": {"enable": False},
        "output": {"folder": str(out / "results"), "writer": "tum"},
    })
    reset_datalogger()
    rng = np.random.default_rng(3)
    world = make_world(rng)
    ref_file = out / "ref_cloud.ply"
    save_mesh_ply(ref_file, world.astype(np.float64),
                  np.empty((0, 3), np.int64))

    pre = Preprocessor(cfg)
    slam = SLAM(cfg)
    observed = []       # what the sensor actually saw (world frame)
    t0 = time.perf_counter()
    for i in range(opts.frames):
        T = np.eye(4)
        T[0, 3] = 0.5 * i
        idx = rng.choice(len(world), 120_000, replace=False)
        Tinv = np.linalg.inv(T)
        cloud = (world[idx] @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(
            np.float32)
        frame = pre(cloud, 0.1 * i, T)
        slam.process(frame)
        # observed-world reference: back-project the frame's valid range
        # pixels (the protocol of the reference datasets, whose GT maps
        # are themselves the OBSERVED world — unobserved geometry must
        # not count against completeness)
        from splatloam_tpu.geometry.spherical import depth_to_points
        pts = np.asarray(depth_to_points(frame.camera.depth,
                                         frame.camera.K)).reshape(-1, 3)
        v = np.asarray(frame.camera.valid).reshape(-1)
        pw = pts[v][::4] @ T[:3, :3].T + T[:3, 3]
        observed.append(pw.astype(np.float32))
    wall = time.perf_counter() - t0
    res = slam.save_results()
    n_gauss = sum(m.no_gaussians for m in slam.local_models)
    print(json.dumps({"stage": "slam", "frames": opts.frames,
                      "wall_s": round(wall, 1),
                      "s_per_frame": round(wall / opts.frames, 2),
                      "submaps": len(slam.local_models),
                      "gaussians": n_gauss}), flush=True)

    gt = [np.eye(4) for _ in slam.world_T_odom]
    for i, T in enumerate(gt):
        T[0, 3] = 0.5 * i
    rpe_mean, _ = evaluate_rpe(slam.world_T_odom, gt, is_kitti=True)
    # GT tracking: odometry must equal the GT trajectory (RPE ~ 0)
    print(json.dumps({"stage": "eval_odom", "rpe_mean": rpe_mean}),
          flush=True)

    graph = ResultGraph.from_yaml(res / "graph.yaml")
    obs_file = out / "ref_observed.ply"
    save_mesh_ply(obs_file, np.concatenate(observed).astype(np.float64),
                  np.empty((0, 3), np.int64))

    from splatloam_tpu.postprocessing import mesh_poisson
    meshes = {}
    verts, faces = mesh_tsdf(graph, cfg, res,
                             voxel_size=opts.voxel, trunc=3 * opts.voxel)
    meshes["tsdf"] = (verts, faces)
    # grid Poisson, unscreened + screened (the 3-way mesher comparison
    # of VERDICT r3 ask #8 / r4 ask #5; Open3D's octree screened solver
    # substitutes for "poisson_screened" automatically when installed)
    for name, screen in (("poisson", 0.0), ("poisson_screened", 6.0)):
        try:
            vp, fp = mesh_poisson(graph, cfg, res, kf_interval=-1,
                                  kf_samples=None, min_opacity=0.5,
                                  poisson_depth=None,
                                  poisson_width=opts.voxel,
                                  poisson_min_density=0.01,
                                  max_depth_dist=0.1,
                                  use_median_depth=False,
                                  screen_voxels=screen)
            meshes[name] = (vp, fp)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"stage": f"mesh_{name}",
                              "error": str(e)[:200]}), flush=True)

    for method, (verts, faces) in meshes.items():
        mesh_file = out / f"mesh_{method}.ply"
        save_mesh_ply(mesh_file, verts, faces)
        print(json.dumps({"stage": f"mesh_{method}",
                          "vertices": int(len(verts)),
                          "faces": int(len(faces))}), flush=True)
        for tag, ref in (("full_world", ref_file),
                         ("observed", obs_file)):
            metrics = evaluate_recon(ref, mesh_file,
                                     down_sample_res=0.02, threshold=0.2,
                                     truncation_acc=0.5,
                                     truncation_com=0.5,
                                     mesh_sample_point=2_000_000)
            metrics["stage"] = f"eval_recon_{method}_{tag}"
            metrics["device"] = str(jax.devices()[0])
            print(json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
