"""Longer-horizon quality regression: odometry RPE + map accuracy on a
synthetic sequence (CPU, golden renderer)."""
import numpy as np
import pytest

import synthetic
from splatloam_tpu.eval.odometry import evaluate_rpe
from splatloam_tpu.logging_backends import reset_datalogger
from splatloam_tpu.preprocessing import Preprocessor
from splatloam_tpu.slam import SLAM


@pytest.mark.slow
def test_odometry_rpe_on_synthetic_sequence(tmp_path, rng):
    reset_datalogger()
    cfg = synthetic.make_config(
        tmp_path,
        mapping={"num_iterations": 80, "densify_percentage": 0.5},
        tracking={"method": "gsaligner", "keyframe_threshold_nframes": -1,
                  "keyframe_threshold_distance": 1.0,
                  "keyframe_threshold_fitness": 0.3})
    pre = Preprocessor(cfg)
    slam = SLAM(cfg)
    n_frames = 10
    poses = synthetic.straight_trajectory(n_frames, step=0.35)
    for i, pose in enumerate(poses):
        cloud = synthetic.sensor_cloud(rng, pose)
        slam.process(pre(cloud, 0.1 * i, pose))

    assert len(slam.world_T_odom) == n_frames
    mean, std = evaluate_rpe(
        [np.asarray(p) for p in slam.world_T_odom], poses,
        slam.timestamps, [0.1 * i for i in range(n_frames)])
    # delta-normalized relative drift under 12% on the synthetic world at
    # this (coarse) resolution
    assert mean < 0.12, f"RPE mean {mean}"

    # absolute endpoint error under half a step
    end_err = np.linalg.norm(slam.world_T_odom[-1][:3, 3]
                             - poses[-1][:3, 3])
    assert end_err < 0.25, f"endpoint error {end_err}"
