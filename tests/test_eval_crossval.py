"""Cross-validation of the eval stack against closed-form fixtures.

evo / Open3D are not installable in this image (no egress), so instead of
comparing against their outputs we validate the re-implemented protocols
(ref utils/eval_utils.py:16-154) against fixtures whose metric values are
derivable analytically — any deviation in pair windowing, delta
normalization, pose relation, truncation, or sampling shows up as a
departure from the closed form.
"""
import numpy as np

from splatloam_tpu.eval.odometry import evaluate_rpe
from splatloam_tpu.eval.recon import evaluate_recon
from splatloam_tpu.eval.tsdf import save_mesh_ply


def _line_trajectory(n=101, spacing=1.0):
    poses = []
    for i in range(n):
        T = np.eye(4)
        T[0, 3] = i * spacing
        poses.append(T)
    return poses


def test_rpe_linear_scale_drift_closed_form():
    """est = (1+a) * gt positions, identity rotations: every pair's error
    is a * path(i,j), and path(i,j) in [0.9, 1.1] * delta by the 10%
    window, so the delta-normalized mean MUST lie in [0.9a, 1.1a] and the
    std below 0.2a/sqrt(12)-ish.  (evo's rpe point_distance with
    all_pairs + delta normalization obeys the same closed form.)"""
    a = 0.02
    gt = _line_trajectory()
    est = []
    for p in gt:
        q = p.copy()
        q[:3, 3] = q[:3, 3] * (1.0 + a)
        est.append(q)
    mean, std = evaluate_rpe(est, gt, is_kitti=True)
    assert 0.9 * a <= mean <= 1.1 * a, mean
    assert std <= 0.1 * a, std


def test_rpe_rotation_sensitivity_closed_form():
    """est translations equal gt but every est pose rotated by yaw b:
    the point_distance relation gives |Rz(b)^T d - d| = 2 sin(b/2) |d|
    per pair, so mean/delta in [0.9, 1.1] * 2 sin(b/2)."""
    b = 0.05
    gt = _line_trajectory()
    Rz = np.array([[np.cos(b), -np.sin(b), 0],
                   [np.sin(b), np.cos(b), 0], [0, 0, 1]])
    est = []
    for p in gt:
        q = p.copy()
        q[:3, :3] = Rz
        est.append(q)
    expected = 2 * np.sin(b / 2)
    mean, _ = evaluate_rpe(est, gt, is_kitti=True)
    assert 0.9 * expected <= mean <= 1.1 * expected, (mean, expected)


def _plane_cloud(z, spacing, extent=10.0):
    xs = np.arange(0.0, extent + 1e-9, spacing)
    gx, gy = np.meshgrid(xs, xs)
    return np.stack([gx.ravel(), gy.ravel(),
                     np.full(gx.size, z)], -1).astype(np.float64)


def _plane_mesh(z, spacing=0.5, extent=10.0):
    xs = np.arange(0.0, extent + 1e-9, spacing)
    n = len(xs)
    gx, gy = np.meshgrid(xs, xs)
    verts = np.stack([gx.ravel(), gy.ravel(),
                      np.full(gx.size, z)], -1)
    faces = []
    for r in range(n - 1):
        for c in range(n - 1):
            i = r * n + c
            faces.append([i, i + 1, i + n])
            faces.append([i + 1, i + n + 1, i + n])
    return verts, np.asarray(faces)


def test_recon_offset_plane_closed_form(tmp_path):
    """Estimate mesh = reference plane offset by d=0.1 m: every truncated
    NN distance is sqrt(d^2 + eps^2) with eps bounded by half the
    reference grid pitch (0.01 m), so accuracy = completeness = Chamfer
    = d within 0.1 cm, and precision/recall/F-score = 100%."""
    d = 0.1
    ref = _plane_cloud(0.0, spacing=0.01)
    est_v, est_f = _plane_mesh(d)
    ref_file = tmp_path / "ref.ply"
    est_file = tmp_path / "est.ply"
    save_mesh_ply(ref_file, ref, np.empty((0, 3), np.int64))
    save_mesh_ply(est_file, est_v, est_f)
    r = evaluate_recon(ref_file, est_file, down_sample_res=0.0,
                       mesh_sample_point=200_000, gt_bbox_mask_on=False)
    assert abs(r["MAE_accuracy (cm)"] - d * 100) < 0.1, r
    assert abs(r["MAE_completeness (cm)"] - d * 100) < 0.1, r
    assert abs(r["Chamfer_L1 (cm)"] - d * 100) < 0.1, r
    assert r["Precision [Accuracy] (%)"] == 100.0
    assert r["Recall [Completeness] (%)"] == 100.0
    assert abs(r["F-score (%)"] - 100.0) < 1e-9


def test_recon_offset_beyond_threshold(tmp_path):
    """d=0.3 m > 0.2 m inlier threshold: distances stay exact (0.3 m)
    but precision/recall/F-score drop to 0."""
    d = 0.3
    ref = _plane_cloud(0.0, spacing=0.01)
    est_v, est_f = _plane_mesh(d)
    ref_file = tmp_path / "ref.ply"
    est_file = tmp_path / "est.ply"
    save_mesh_ply(ref_file, ref, np.empty((0, 3), np.int64))
    save_mesh_ply(est_file, est_v, est_f)
    r = evaluate_recon(ref_file, est_file, down_sample_res=0.0,
                       mesh_sample_point=200_000, gt_bbox_mask_on=False)
    assert abs(r["MAE_accuracy (cm)"] - d * 100) < 0.1, r
    assert r["Precision [Accuracy] (%)"] == 0.0
    assert r["F-score (%)"] == 0.0


def test_recon_truncation_caps_completeness(tmp_path):
    """Completeness uses truncation WITHOUT outlier removal
    (ref eval_utils.py:131-136): an estimate far beyond truncation (1 m
    offset, 0.5 m truncation) must clamp ref->est distances to exactly
    0.5 m while accuracy (with outlier removal) comes back empty/NaN."""
    ref = _plane_cloud(0.0, spacing=0.05)
    est_v, est_f = _plane_mesh(1.0)
    ref_file = tmp_path / "ref.ply"
    est_file = tmp_path / "est.ply"
    save_mesh_ply(ref_file, ref, np.empty((0, 3), np.int64))
    save_mesh_ply(est_file, est_v, est_f)
    r = evaluate_recon(ref_file, est_file, down_sample_res=0.0,
                       mesh_sample_point=100_000, gt_bbox_mask_on=False)
    assert abs(r["MAE_completeness (cm)"] - 50.0) < 1e-6, r
    assert np.isnan(r["MAE_accuracy (cm)"])
