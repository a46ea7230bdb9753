"""End-to-end SLAM on a synthetic world (mapping-GT and odometry modes)."""
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from splatloam_tpu.logging_backends import reset_datalogger
from splatloam_tpu.model.frame import Frame
from splatloam_tpu.preprocessing import Preprocessor
from splatloam_tpu.slam import SLAM


def _run_slam(tmp_path, rng, n_frames=5, **cfg_overrides):
    reset_datalogger()
    cfg = synthetic.make_config(tmp_path, **cfg_overrides)
    pre = Preprocessor(cfg)
    slam = SLAM(cfg)
    poses = synthetic.straight_trajectory(n_frames, step=0.4)
    for i, pose in enumerate(poses):
        cloud = synthetic.sensor_cloud(rng, pose)
        frame = pre(cloud, timestamp=0.1 * i, gt_pose=pose)
        slam.process(frame)
    return cfg, slam, poses


def test_mapping_gt_end_to_end(tmp_path, rng):
    # 60 iterations suffice for the depth-L1 gate at this scene size and
    # keep the e2e smoke inside the fast tier's 3-minute budget
    cfg, slam, poses = _run_slam(tmp_path, rng,
                                 mapping={"num_iterations": 60})
    assert len(slam.world_T_odom) == 5
    # GT tracking: odometry must equal the ground truth trajectory
    for est, gt in zip(slam.world_T_odom, poses):
        np.testing.assert_allclose(est, gt, atol=1e-5)
    model = slam.local_models[-1]
    assert model.no_gaussians > 500

    # the optimized model must fit the first keyframe's depth well
    from splatloam_tpu.ops.rasterizer import RenderParams, render
    kf = model.keyframes[0]
    cam = kf.camera_in_model()
    params = RenderParams(height=cam.height, width=cam.width, backend="jnp")
    surf = model.surfels
    out = render(surf.params.xyz, surf.scaling, surf.rotation, surf.opacity,
                 cam.T_cw, cam.K, params)
    valid = np.asarray(cam.valid)
    l1 = np.abs(np.asarray(out["surf_depth"]) - np.asarray(cam.depth))
    med = np.median(l1[valid])
    assert med < 0.25, f"median depth L1 after mapping: {med}"

    # results artifacts (ref slam/slam.py:130-170 contract)
    result_dir = slam.save_results()
    assert (result_dir / "cfg.yaml").is_file()
    assert (result_dir / "odom.txt").is_file()
    assert (result_dir / "graph.yaml").is_file()
    plys = list((result_dir / "models").glob("*.ply"))
    assert len(plys) == len(slam.local_models)

    # graph round-trips and the PLY loads
    from splatloam_tpu.io.ply import load_surfel_ply
    from splatloam_tpu.postprocessing import ResultGraph
    graph = ResultGraph.from_yaml(result_dir / "graph.yaml")
    assert len(graph.models) == len(slam.local_models)
    assert len(graph.frames) == sum(len(m.keyframes)
                                    for m in slam.local_models)
    xyz, opac, scale, quat = load_surfel_ply(plys[0])
    assert len(xyz) == slam.local_models[0].no_gaussians


@pytest.mark.slow
def test_odometry_mode_end_to_end(tmp_path, rng):
    cfg, slam, poses = _run_slam(
        tmp_path, rng, n_frames=4,
        tracking={"method": "gsaligner", "keyframe_threshold_nframes": 2,
                  "keyframe_threshold_distance": -1,
                  "keyframe_threshold_fitness": 0.3})
    # tracked odometry should follow the straight 0.4 m/frame trajectory
    errs = [np.linalg.norm(est[:3, 3] - gt[:3, 3])
            for est, gt in zip(slam.world_T_odom, poses)]
    assert max(errs) < 0.15, f"odometry errors {errs}"


def test_submap_rollover(tmp_path, rng):
    cfg, slam, _ = _run_slam(
        tmp_path, rng, n_frames=8,
        mapping={"num_iterations": 10, "lmodel_threshold_nkeyframes": 2,
                 "densify_percentage": 0.2},
        tracking={"method": "gt", "keyframe_threshold_nframes": 1,
                  "keyframe_threshold_distance": -1,
                  "keyframe_threshold_fitness": -1})
    assert len(slam.local_models) >= 2
    # submap origins chain: world_T_model of model k+1 expressed in world
    for m in slam.local_models:
        assert m.world_T_model.shape == (4, 4)
    # odometry continuity across the rollover: gt tracking means the world
    # trajectory must still match the straight line exactly, and each
    # rollover's origin must equal the world pose of its first keyframe
    poses = synthetic.straight_trajectory(8, step=0.4)
    for est, gt in zip(slam.world_T_odom, poses):
        np.testing.assert_allclose(est, gt, atol=1e-5)
    for m in slam.local_models:
        first_kf_world = m.world_T_model @ m.keyframes[0].model_T_frame
        # first keyframe of each submap sits at the submap origin
        np.testing.assert_allclose(m.keyframes[0].model_T_frame,
                                   np.eye(4), atol=1e-6)
        assert np.all(np.isfinite(first_kf_world))
