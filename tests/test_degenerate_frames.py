"""Degenerate inputs must not crash or poison the SLAM state."""
import numpy as np

import synthetic
from splatloam_tpu.logging_backends import reset_datalogger
from splatloam_tpu.preprocessing import Preprocessor
from splatloam_tpu.slam import SLAM


def test_empty_and_sparse_frames(tmp_path, rng):
    reset_datalogger()
    cfg = synthetic.make_config(
        tmp_path, mapping={"num_iterations": 10},
        tracking={"method": "gt", "keyframe_threshold_nframes": 1,
                  "keyframe_threshold_distance": -1,
                  "keyframe_threshold_fitness": -1})
    pre = Preprocessor(cfg)
    slam = SLAM(cfg)

    # normal first frame
    pose0 = np.eye(4)
    slam.process(pre(synthetic.sensor_cloud(rng, pose0), 0.0, pose0))

    # frame with every point outside the depth gates (-> all-invalid image)
    pose1 = synthetic.straight_trajectory(2, 0.4)[1]
    far_cloud = rng.normal(size=(5000, 3)).astype(np.float32)
    far_cloud = 500.0 * far_cloud / np.linalg.norm(far_cloud, axis=1,
                                                   keepdims=True)
    frame = pre(far_cloud, 0.1, pose1)
    assert not bool(np.asarray(frame.camera.valid).any())
    slam.process(frame)  # becomes a keyframe with nothing to densify

    # a frame with only a handful of points
    tiny = synthetic.sensor_cloud(rng, pose1)[:40]
    slam.process(pre(tiny, 0.2, pose1))

    # recovery: a normal frame afterwards still maps fine
    pose3 = synthetic.straight_trajectory(4, 0.4)[3]
    slam.process(pre(synthetic.sensor_cloud(rng, pose3), 0.3, pose3))
    model = slam.local_models[-1]
    assert model.no_gaussians > 0
    surf = model.surfels
    assert bool(np.isfinite(np.asarray(surf.params.xyz)).all())
    assert len(slam.world_T_odom) == 4
    assert np.isfinite(np.stack(slam.world_T_odom)).all()
