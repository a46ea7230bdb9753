"""Synthetic LiDAR world for integration tests: a cylinder room + floor."""
import numpy as np


def scene_cloud_world(rng, n=16000, radius=10.0, zmin=-1.5, zmax=2.5,
                      floor_z=-1.5, floor_r=8.0):
    theta = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(zmin, zmax, n)
    wall = np.stack([radius * np.cos(theta), radius * np.sin(theta), z], -1)
    rr = np.sqrt(rng.uniform(0.0, 1.0, n // 2)) * floor_r
    ang = rng.uniform(-np.pi, np.pi, n // 2)
    floor = np.stack([rr * np.cos(ang), rr * np.sin(ang),
                      np.full(n // 2, floor_z)], -1)
    # two flat pillars break the rotational symmetry (otherwise yaw is
    # unobservable for ICP-style registration)
    m = n // 4
    p1 = np.stack([np.full(m, 4.0), rng.uniform(-1.5, 1.5, m),
                   rng.uniform(floor_z, 1.5, m)], -1)
    p2 = np.stack([rng.uniform(-2.0, 0.0, m), np.full(m, -5.0),
                   rng.uniform(floor_z, 1.0, m)], -1)
    return np.concatenate([wall, floor, p1, p2]).astype(np.float32)


def sensor_cloud(rng, pose, **kw):
    """World cloud seen from `pose` (4x4 sensor->world): sensor frame."""
    world = scene_cloud_world(rng, **kw)
    Tinv = np.linalg.inv(pose)
    return (world @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)


def straight_trajectory(n_frames, step=0.4):
    poses = []
    for i in range(n_frames):
        T = np.eye(4)
        T[0, 3] = i * step
        poses.append(T)
    return poses


def make_config(tmp_path, **overrides):
    from splatloam_tpu.config import Configuration, from_dict

    base = {
        "preprocessing": {"image_height": 16, "image_width": 128,
                          "depth_min": 0.5, "depth_max": 30.0,
                          "enable_normal_estimation": False,
                          "enable_ground_segmentation": False},
        "mapping": {"num_iterations": 100, "densify_percentage": 0.6,
                    "densify_threshold_opacity": 0.5,
                    "prob_view_last_keyframe": 0.4,
                    "pruning_min_opacity": 0.05,
                    "opt_scaling_max": 1.0,
                    "lmodel_threshold_ngaussians": 60000},
        "tracking": {"method": "gt", "keyframe_threshold_nframes": 2,
                     "keyframe_threshold_distance": -1,
                     "keyframe_threshold_fitness": -1},
        "compute": {"backend": "jnp", "initial_capacity": 2048,
                    "keyframe_capacity": 8, "chunk": 256},
        "logging": {"enable": False},
        "output": {"folder": str(tmp_path / "results"), "writer": "tum"},
    }

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    merge(base, overrides)
    return from_dict(Configuration, base)
