"""SLAM mapping with cfg.parallel > 1 on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import synthetic
from splatloam_tpu.logging_backends import reset_datalogger
from splatloam_tpu.preprocessing import Preprocessor
from splatloam_tpu.slam import SLAM


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_slam_with_sharded_mapper(tmp_path, rng, backend):
    """backend=jnp exercises the row-block partition, backend=pallas the
    auto-selected count-balanced tile partition (mapper integration of
    sharded_optimize_tiles)."""
    reset_datalogger()
    n_iters = 40 if backend == "jnp" else 16
    cfg = synthetic.make_config(
        tmp_path,
        mapping={"num_iterations": n_iters},
        parallel={"data": 4, "model": 2},
        compute={"backend": backend, "initial_capacity": 2048,
                 "keyframe_capacity": 8, "rebin_every": 8})
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
                          backend="jnp")  # oracle render for the check
    s = model.surfels
    out = render(s.params.xyz, s.scaling, s.rotation, s.opacity,
                 cam.T_cw, cam.K, params)
    valid = np.asarray(cam.valid)
    l1 = np.abs(np.asarray(out["surf_depth"]) - np.asarray(cam.depth))
    assert np.median(l1[valid]) < 0.5
