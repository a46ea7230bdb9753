"""CLI end-to-end on a tiny synthetic KITTI-format dataset."""
import subprocess
import sys

import numpy as np
import pytest

import synthetic

REPO = "/root/repo"


def _make_kitti_dataset(tmp_path, rng, n_frames=4):
    """Write a synthetic sequence in KITTI layout (velodyne/*.bin,
    times.txt, calib.txt, poses.txt)."""
    seq = tmp_path / "seq00"
    velo = seq / "velodyne"
    velo.mkdir(parents=True)
    poses = synthetic.straight_trajectory(n_frames, step=0.4)
    times, pose_rows = [], []
    for i, pose in enumerate(poses):
        cloud = synthetic.sensor_cloud(rng, pose, n=6000)
        xyzi = np.concatenate(
            [cloud, np.zeros((len(cloud), 1), np.float32)], axis=1)
        xyzi.astype("<f4").tofile(velo / f"{i:06d}.bin")
        times.append(f"{0.1 * i:.6f}")
        pose_rows.append(" ".join(f"{x:.6f}"
                                  for x in pose[:3].reshape(-1)))
    (seq / "times.txt").write_text("\n".join(times) + "\n")
    (seq / "calib.txt").write_text(
        "Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    gt = tmp_path / "poses.txt"
    gt.write_text("\n".join(pose_rows) + "\n")
    return seq, gt


def _write_cfg(tmp_path, seq, gt):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
data:
  dataset_type: kitti
  cloud_reader:
    cloud_folder: {seq}
  trajectory_reader:
    filename: {gt}
  skip_clouds_wno_sync: true
preprocessing:
  image_height: 16
  image_width: 128
  depth_min: 0.5
  depth_max: 30.0
  enable_normal_estimation: false
  enable_ground_segmentation: false
mapping:
  num_iterations: 40
  densify_percentage: 0.5
  lmodel_threshold_ngaussians: 30000
tracking:
  method: gt
  keyframe_threshold_nframes: 2
  keyframe_threshold_distance: -1
  keyframe_threshold_fitness: -1
compute:
  backend: jnp
  initial_capacity: 2048
  keyframe_capacity: 8
logging:
  enable: false
output:
  folder: {tmp_path / "results"}
  writer: kitti
""")
    return cfg


@pytest.mark.slow
def test_cli_slam_mesh_eval(tmp_path, rng):
    seq, gt = _make_kitti_dataset(tmp_path, rng)
    cfg = _write_cfg(tmp_path, seq, gt)
    env = {"PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "HOME": "/root"}

    def run(*args):
        r = subprocess.run([sys.executable, f"{REPO}/run.py", *args],
                           capture_output=True, text=True, timeout=560,
                           cwd=REPO, env=env)
        assert r.returncode == 0, f"{args}:\n{r.stdout}\n{r.stderr}"
        return r

    run("slam", str(cfg), "mapping.num_iterations=30")
    results = sorted((tmp_path / "results").iterdir())
    assert results, "no result folder written"
    rdir = results[-1]
    for artifact in ("cfg.yaml", "odom.txt", "graph.yaml"):
        assert (rdir / artifact).is_file()

    # odometry eval against the GT file (kitti format, index-aligned)
    r = run("eval_odom", str(rdir))
    assert "RPE=" in r.stdout
    rpe = float(r.stdout.split("RPE=")[1].split()[0])
    assert rpe < 1e-3  # gt tracking -> exact trajectory

    # meshing (TSDF + marching tetrahedra)
    mesh_out = tmp_path / "mesh.ply"
    run("mesh", str(rdir), "-o", str(mesh_out), "--voxel-size", "0.25",
        "--trunc", "0.75")
    assert mesh_out.is_file()

    # Poisson meshing (Open3D absent -> self-contained FFT grid solver)
    mesh_psn = tmp_path / "mesh_poisson.ply"
    run("mesh", str(rdir), "-o", str(mesh_psn), "--method", "poisson",
        "--poisson-width", "0.25")
    assert mesh_psn.is_file() and mesh_psn.stat().st_size > 1000

    # recon eval: mesh against the measured world cloud
    world = synthetic.scene_cloud_world(rng, n=20000)
    from splatloam_tpu.io.ply import write_ply
    ref = tmp_path / "ref_cloud.ply"
    write_ply(ref, {"x": world[:, 0], "y": world[:, 1], "z": world[:, 2]})
    r = run("eval_recon", str(ref), str(mesh_out),
            "--mesh-sample-point", "200000", "--down-sample-res", "0.1")
    assert "C-L1=" in r.stdout


def test_generate_dummy_cfg(tmp_path):
    from splatloam_tpu.cli import main
    out = tmp_path / "dummy.yaml"
    main(["generate_dummy_cfg", str(out)])
    from splatloam_tpu.config import load_configuration
    cfg = load_configuration(out)
    assert cfg.mapping.num_iterations == 500
