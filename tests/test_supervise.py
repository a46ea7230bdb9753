"""Elastic-recovery supervisor: crash mid-run -> restart from checkpoint.

The reference aborts on the first error (SURVEY.md §5 failure-detection
row); `run.py slam --supervise` must instead resume from the latest
mid-run checkpoint and complete, and must NOT loop forever when a crash
makes no forward progress.
"""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.test_cli import REPO, _make_kitti_dataset

ENV = {"PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
       "PATH": "/usr/bin:/bin", "HOME": "/root"}


def _write_cfg(tmp_path, seq, gt, ckpt_dir):
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
  num_iterations: 20
  densify_percentage: 0.5
  lmodel_threshold_ngaussians: 30000
tracking:
  method: gt
  keyframe_threshold_nframes: 2
compute:
  backend: jnp
  initial_capacity: 4096
output:
  folder: {tmp_path / "results"}
  writer: kitti
  checkpoint_dir: {ckpt_dir}
  checkpoint_every_keyframes: 1
logging:
  enable: false
""")
    return cfg


@pytest.mark.slow
def test_supervise_recovers_from_mid_run_fault(tmp_path, rng):
    seq, gt = _make_kitti_dataset(tmp_path, rng, n_frames=6)
    ckpt_dir = tmp_path / "ckpt"
    cfg = _write_cfg(tmp_path, seq, gt, ckpt_dir)

    r = subprocess.run(
        [sys.executable, f"{REPO}/run.py", "slam", str(cfg), "--supervise"],
        capture_output=True, text=True, timeout=560, cwd=REPO,
        env={**ENV, "SPLATLOAM_FAULT_AT_FRAME": "4"})
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr}"

    # the fault really fired once (sentinel written by the injection)
    assert (ckpt_dir / ".fault_injected").exists()

    # the resumed run completed the whole sequence
    results = sorted((tmp_path / "results").iterdir())
    assert results, "no result folder written"
    odom = np.loadtxt(results[-1] / "odom.txt")
    assert odom.shape[0] == 6, f"odometry rows: {odom.shape}"

    # checkpoints advanced past the fault (they fire per keyframe, so the
    # last manifest may lag the end of the run by up to the keyframe gap)
    with open(ckpt_dir / "manifest.json") as f:
        assert json.load(f)["n_frames_processed"] > 4


@pytest.mark.slow
def test_supervise_gives_up_without_progress(tmp_path, rng):
    seq, gt = _make_kitti_dataset(tmp_path, rng, n_frames=6)
    # NO checkpoint dir: the injected fault re-fires on every restart
    # (no sentinel, no resume) -> the supervisor must terminate
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
  num_iterations: 5
  lmodel_threshold_ngaussians: 30000
tracking:
  method: gt
  keyframe_threshold_nframes: 2
compute:
  backend: jnp
  initial_capacity: 4096
output:
  folder: {tmp_path / "results"}
  writer: kitti
logging:
  enable: false
""")
    r = subprocess.run(
        [sys.executable, f"{REPO}/run.py", "slam", str(cfg), "--supervise",
         "--max-restarts", "2"],
        capture_output=True, text=True, timeout=560, cwd=REPO,
        env={**ENV, "SPLATLOAM_FAULT_AT_FRAME": "1"})
    assert r.returncode != 0
    assert r.stdout.count("injected fault") + \
        r.stderr.count("injected fault") >= 2
