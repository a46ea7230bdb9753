"""Coverage for paths not exercised elsewhere: PCA normals, multi-submap
checkpointing, sanity checks, crop_recon."""
import numpy as np
import pytest

import synthetic
from splatloam_tpu.logging_backends import reset_datalogger


def test_pca_normals_path(tmp_path, rng):
    from splatloam_tpu.preprocessing import Preprocessor
    reset_datalogger()
    cfg = synthetic.make_config(
        tmp_path,
        preprocessing={"enable_normal_estimation": True,
                       "enable_ground_segmentation": False})
    pre = Preprocessor(cfg)
    frame = pre(synthetic.sensor_cloud(rng, np.eye(4), n=4000), 0.0,
                np.eye(4))
    nrm = np.asarray(frame.camera.normal)
    valid = np.asarray(frame.camera.valid)
    lens = np.linalg.norm(nrm[valid], axis=-1)
    assert np.all(lens > 0.9) and np.all(lens < 1.1)
    # PCA normals oriented toward the sensor: dot with -ray > 0
    import jax.numpy as jnp
    from splatloam_tpu.geometry import spherical
    rays = np.asarray(spherical.pixel_rays(
        frame.camera.K, frame.camera.height, frame.camera.width))
    dots = np.sum(nrm[valid] * -rays[valid], axis=-1)
    assert (dots > 0).mean() > 0.95


def test_ground_segmentation_up_normals(tmp_path, rng):
    """Ground points get up-facing normals, walls keep theirs (the intent
    the reference leaves as a TODO, ref scene/preprocessing.py:93-117)."""
    from splatloam_tpu.preprocessing import Preprocessor
    cfg = synthetic.make_config(
        tmp_path,
        preprocessing={"enable_normal_estimation": False,
                       "enable_ground_segmentation": True})
    pre = Preprocessor(cfg)
    n = 4000
    th = rng.uniform(-np.pi, np.pi, n // 2)
    wall = np.stack([8 * np.cos(th), 8 * np.sin(th),
                     rng.uniform(-1.0, 2.0, n // 2)], -1)
    gx = rng.uniform(-7, 7, n // 2)
    gy = rng.uniform(-7, 7, n // 2)
    ground = np.stack([gx, gy, np.full(n // 2, -1.5)
                       + rng.normal(0, 0.01, n // 2)], -1)
    cloud = np.concatenate([wall, ground]).astype(np.float32)
    nrm = pre.compute_normals(cloud, np.ones(n, bool))
    gz = nrm[n // 2:, 2]
    wz = nrm[:n // 2, 2]
    assert (gz > 0.99).mean() > 0.9, (gz > 0.99).mean()
    assert (np.abs(wz) < 0.5).mean() > 0.9
    # full pipeline runs without raising
    frame = pre(cloud, 0.0, np.eye(4))
    assert bool(np.asarray(frame.camera.valid).any())


def test_checkpoint_multiple_submaps(tmp_path, rng):
    from splatloam_tpu.checkpoint import load_checkpoint, save_checkpoint
    from splatloam_tpu.preprocessing import Preprocessor
    from splatloam_tpu.slam import SLAM
    reset_datalogger()
    cfg = synthetic.make_config(
        tmp_path,
        mapping={"num_iterations": 10, "lmodel_threshold_nkeyframes": 2,
                 "densify_percentage": 0.2},
        tracking={"method": "gt", "keyframe_threshold_nframes": 1,
                  "keyframe_threshold_distance": -1,
                  "keyframe_threshold_fitness": -1})
    pre = Preprocessor(cfg)
    slam = SLAM(cfg)
    poses = synthetic.straight_trajectory(8, step=0.4)
    for i, pose in enumerate(poses):
        slam.process(pre(synthetic.sensor_cloud(rng, pose), 0.1 * i, pose))
    assert len(slam.local_models) >= 2
    save_checkpoint(tmp_path / "ck", slam)

    slam2 = SLAM(cfg)
    n = load_checkpoint(tmp_path / "ck", slam2)
    assert n == 8
    assert len(slam2.local_models) == len(slam.local_models)
    for m1, m2 in zip(slam.local_models, slam2.local_models):
        assert m1.no_gaussians == m2.no_gaussians
        np.testing.assert_allclose(np.asarray(m1.world_T_model),
                                   np.asarray(m2.world_T_model))
    # restored run keeps processing without error
    extra_pose = synthetic.straight_trajectory(10, step=0.4)[-1]
    slam2.process(pre(synthetic.sensor_cloud(rng, extra_pose), 0.9,
                      extra_pose))


def test_pipeline_sanity_check_gt_requires_sync(tmp_path):
    from splatloam_tpu.cli import pipeline_sanity_check
    from splatloam_tpu.config import TrackingMethod

    class FakeLoader:
        traj_reader = None

    cfg = synthetic.make_config(tmp_path)
    cfg.tracking.method = TrackingMethod.gt
    cfg.data.skip_clouds_wno_sync = False
    from splatloam_tpu.io.trajectory import (TrajectoryReader_NULL,
                                             TrajectoryReader_TUM)
    from splatloam_tpu.config import TrajectoryReaderConfig
    loader = FakeLoader()
    loader.traj_reader = TrajectoryReader_NULL(TrajectoryReaderConfig())
    with pytest.raises(SystemExit):
        pipeline_sanity_check(cfg, loader)


def test_crop_recon_cli(tmp_path, rng):
    from splatloam_tpu.cli import main
    from splatloam_tpu.eval.tsdf import save_mesh_ply
    from splatloam_tpu.io.ply import read_ply, write_ply

    # reference cloud: sphere; estimate mesh: plane patch near part of it
    d = rng.normal(size=(5000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = tmp_path / "ref.ply"
    write_ply(ref, {"x": 2 * d[:, 0], "y": 2 * d[:, 1], "z": 2 * d[:, 2]})
    verts = np.array([[2, -1, -1], [2, 1, -1], [2, 1, 1], [2, -1, 1]],
                     float)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    mesh = tmp_path / "est.ply"
    save_mesh_ply(mesh, verts, faces)
    out = tmp_path / "crop.ply"
    main(["crop_recon", str(ref), str(mesh), "--output", str(out),
          "--mesh-sample-point", "5000", "--threshold-dist", "0.8"])
    cropped = read_ply(out)
    n_crop = len(cropped["x"])
    assert 0 < n_crop < 5000  # kept only points near the plane patch
    assert np.all(cropped["x"] > 0.5)  # the +x hemisphere side
