import numpy as np

from splatloam_tpu.config import (Configuration, TrajectoryReaderConfig,
                                  TrajectoryReaderType, from_dict,
                                  load_configuration, save_configuration)
from splatloam_tpu.io import ply as plyio
from splatloam_tpu.io import rotations as rot
from splatloam_tpu.io.trajectory import (TrajectoryReader_KITTI,
                                         TrajectoryReader_TUM,
                                         TrajectoryWriter_KITTI,
                                         TrajectoryWriter_TUM)


def _random_poses(rng, n=10):
    poses = []
    for _ in range(n):
        w = rng.normal(size=3) * 0.5
        q = np.concatenate([[1.0], w])
        q /= np.linalg.norm(q)
        T = np.eye(4)
        T[:3, :3] = rot.rotmat_from_quat(q)
        T[:3, 3] = rng.normal(size=3) * 5
        poses.append(T)
    return poses


def test_surfel_ply_roundtrip(rng):
    n = 100
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    opac = rng.normal(size=(n,)).astype(np.float32)
    scale = rng.normal(size=(n, 2)).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/model.ply"
        plyio.save_surfel_ply(path, xyz, opac, scale, quat)
        x2, o2, s2, q2 = plyio.load_surfel_ply(path)
    np.testing.assert_allclose(x2, xyz, rtol=1e-6)
    np.testing.assert_allclose(o2, opac, rtol=1e-6)
    np.testing.assert_allclose(s2, scale, rtol=1e-6)
    np.testing.assert_allclose(q2, quat, rtol=1e-6)


def test_tum_trajectory_roundtrip(rng, tmp_path):
    poses = _random_poses(rng)
    ts = [0.1 * i for i in range(len(poses))]
    path = tmp_path / "odom.txt"
    TrajectoryWriter_TUM.write(path, [p.copy() for p in poses], ts)
    reader = TrajectoryReader_TUM(TrajectoryReaderConfig(
        reader_type=TrajectoryReaderType.tum, filename=str(path)))
    assert len(reader.poses) == len(poses)
    for p, p2 in zip(poses, reader.poses):
        np.testing.assert_allclose(p2, p, atol=2e-4)
    # timestamped access with tolerance
    np.testing.assert_allclose(reader(0.2 + 1e-5), poses[2], atol=2e-4)
    try:
        reader(99.0)
        assert False, "expected RuntimeError"
    except RuntimeError:
        pass


def test_kitti_trajectory_roundtrip(rng, tmp_path):
    poses = _random_poses(rng)
    path = tmp_path / "poses.txt"
    TrajectoryWriter_KITTI.write(path, [p.copy() for p in poses])
    reader = TrajectoryReader_KITTI(TrajectoryReaderConfig(
        reader_type=TrajectoryReaderType.kitti, filename=str(path)))
    for p, p2 in zip(poses, reader):
        np.testing.assert_allclose(p2, p, atol=1e-5)


def test_quat_numpy_matches_jax(rng):
    import jax.numpy as jnp

    from splatloam_tpu.geometry import se3
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R_np = rot.rotmat_from_quat(q)
        R_jax = np.asarray(se3.quat_to_rotmat(jnp.asarray(q, jnp.float32)))
        np.testing.assert_allclose(R_np, R_jax, atol=1e-6)
        q2 = rot.quat_from_rotmat(R_np)
        qs = -q if q[0] < 0 else q
        np.testing.assert_allclose(q2, qs, atol=1e-6)


def test_config_inherit_and_overrides(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        "preprocessing:\n  image_height: 64\n  image_width: 1024\n"
        "mapping:\n  num_iterations: 300\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        f"inherit_from: {base}\nmapping:\n  num_iterations: 200\n"
        "tracking:\n  method: gt\n")
    cfg = load_configuration(child, ["opt.position_lr=0.1",
                                     "mapping.densify_percentage=0.5"])
    assert cfg.preprocessing.image_height == 64      # inherited
    assert cfg.mapping.num_iterations == 200         # overridden by child
    assert cfg.tracking.method.value == "gt"
    assert cfg.opt.position_lr == 0.1                # CLI override
    assert cfg.mapping.densify_percentage == 0.5
    # round-trip save
    out = tmp_path / "saved.yaml"
    save_configuration(out, cfg)
    cfg2 = load_configuration(out)
    assert cfg2.mapping.num_iterations == 200


def test_reference_configs_load():
    """All ported dataset configs must parse into the typed tree."""
    from pathlib import Path
    import os
    os.chdir("/root/repo")
    configs = sorted(Path("configs").glob("*/*.yaml"))
    assert len(configs) >= 13
    for c in configs:
        cfg = load_configuration(c)
        assert isinstance(cfg, Configuration)
        assert cfg.preprocessing.image_width in (0, 1024)
