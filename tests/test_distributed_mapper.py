"""SLAM mapping with cfg.parallel > 1 on the virtual 8-device CPU mesh."""
import numpy as np

import synthetic
from splatloam_tpu.logging_backends import reset_datalogger
from splatloam_tpu.preprocessing import Preprocessor
from splatloam_tpu.slam import SLAM


def test_slam_with_sharded_mapper(tmp_path, rng):
    reset_datalogger()
    cfg = synthetic.make_config(
        tmp_path,
        mapping={"num_iterations": 40},
        parallel={"data": 4, "model": 2},
        compute={"backend": "jnp", "initial_capacity": 2048,
                 "keyframe_capacity": 8})
    pre = Preprocessor(cfg)
    slam = SLAM(cfg)
    poses = synthetic.straight_trajectory(3, step=0.4)
    for i, pose in enumerate(poses):
        cloud = synthetic.sensor_cloud(rng, pose)
        slam.process(pre(cloud, 0.1 * i, pose))

    model = slam.local_models[-1]
    assert model.no_gaussians > 300
    # the sharded-optimized model must fit the first keyframe decently
    import jax.numpy as jnp
    from splatloam_tpu.ops.rasterizer import RenderParams, render
    kf = model.keyframes[0]
    cam = kf.camera_in_model()
    params = RenderParams(height=cam.height, width=cam.width,
                          backend="jnp")
    s = model.surfels
    out = render(s.params.xyz, s.scaling, s.rotation, s.opacity,
                 cam.T_cw, cam.K, params)
    valid = np.asarray(cam.valid)
    l1 = np.abs(np.asarray(out["surf_depth"]) - np.asarray(cam.depth))
    assert np.median(l1[valid]) < 0.5
