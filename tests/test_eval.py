import numpy as np

from splatloam_tpu.eval.odometry import evaluate_rpe
from splatloam_tpu.eval.recon import (evaluate_recon, load_mesh,
                                      sample_mesh_uniform, voxel_downsample)
from splatloam_tpu.eval.tsdf import (fuse_points_tsdf, marching_cubes,
                                     save_mesh_ply)


def _circle_trajectory(n=200, radius=30.0):
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n * 0.6
        T = np.eye(4)
        T[:3, :3] = np.array([[np.cos(a), -np.sin(a), 0],
                              [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.0]
        poses.append(T)
    return poses


def test_rpe_zero_for_identical():
    poses = _circle_trajectory()
    ts = [0.1 * i for i in range(len(poses))]
    mean, std = evaluate_rpe(poses, poses, ts, ts)
    assert mean < 1e-9 and std < 1e-9


def test_rpe_detects_drift(rng):
    poses = _circle_trajectory()
    ts = [0.1 * i for i in range(len(poses))]
    drifted = []
    for i, p in enumerate(poses):
        q = p.copy()
        q[:3, 3] = q[:3, 3] + np.array([5e-3 * i, 0, 0])  # linear drift
        drifted.append(q)
    mean, std = evaluate_rpe(drifted, poses, ts, ts)
    assert 1e-4 < mean < 0.2
    # larger drift -> larger RPE
    drifted2 = [p.copy() for p in drifted]
    for i, q in enumerate(drifted2):
        q[:3, 3] = q[:3, 3] + np.array([0, 2e-2 * i, 0])
    mean2, _ = evaluate_rpe(drifted2, poses, ts, ts)
    assert mean2 > mean


def test_tsdf_mesh_sphere(tmp_path, rng):
    # oriented points on a sphere of radius 2 -> mesh ~ sphere
    n = 20000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = 2.0 * d
    normals = d  # outward
    tsdf, origin = fuse_points_tsdf(pts, normals, voxel_size=0.15,
                                    trunc=0.45)
    verts, faces = marching_cubes(tsdf, origin, 0.15)
    assert len(verts) > 200 and len(faces) > 200
    radii = np.linalg.norm(verts, axis=1)
    assert abs(np.median(radii) - 2.0) < 0.08
    # mesh round-trips through PLY with faces
    mesh_path = tmp_path / "sphere.ply"
    save_mesh_ply(mesh_path, verts, faces)
    v2, f2 = load_mesh(mesh_path)
    assert len(v2) == len(verts) and len(f2) == len(faces)

    # evaluate_recon of the mesh against dense sphere samples: small chamfer
    ref_path = tmp_path / "ref.ply"
    from splatloam_tpu.io.ply import write_ply
    write_ply(ref_path, {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})
    metrics = evaluate_recon(ref_path, mesh_path, down_sample_res=0.05,
                             mesh_sample_point=50000)
    assert metrics["Chamfer_L1 (cm)"] < 10.0
    assert metrics["F-score (%)"] > 90.0


def test_mesh_sampling_and_downsample(rng):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2]])
    pts = sample_mesh_uniform(verts, faces, 5000)
    # all samples inside the triangle (barycentric non-negative)
    assert np.all(pts[:, 2] == 0)
    assert np.all(pts[:, 0] >= -1e-9) and np.all(pts[:, 1] >= -1e-9)
    assert np.all(pts[:, 0] + pts[:, 1] <= 1 + 1e-9)
    down = voxel_downsample(pts, 0.2)
    assert len(down) < 40


def test_associate_trajectories_tum_semantics():
    """Exact-match test against evo's documented association (the TUM
    RGB-D tools' associate.py: all pairs within max_diff, globally
    sorted by |dt|, greedy unique endpoints).  A first-come
    nearest-neighbor loop fails this on near-duplicate stamps: est
    t=0.09 would steal ref t=0.10 from the exact est t=0.10 match."""
    from splatloam_tpu.eval.odometry import associate_trajectories
    import numpy as np

    def pose(x):
        T = np.eye(4)
        T[0, 3] = x
        return T

    ref_ts = [0.0, 0.10, 0.20]
    est_ts = [0.09, 0.10]
    ref_poses = [pose(10 + i) for i in range(3)]
    est_poses = [pose(20 + i) for i in range(2)]
    ref, est = associate_trajectories(ref_ts, ref_poses, est_ts,
                                      est_poses, max_diff=0.05)
    # global greedy: (0.10, 0.10) wins at |dt|=0; est 0.09's only other
    # candidate (ref 0.0 at 0.09, ref 0.2 at 0.11) exceeds max_diff
    assert len(ref) == 1
    assert ref[0][0, 3] == 11 and est[0][0, 3] == 21

    # dense near-duplicates: every exact pair must win over off-by-one
    ref_ts = [0.0, 0.1, 0.2, 0.3]
    est_ts = [0.102, 0.1, 0.3, 0.299]
    ref_p = [pose(i) for i in range(4)]
    est_p = [pose(10 + i) for i in range(4)]
    ref, est = associate_trajectories(ref_ts, ref_p, est_ts, est_p,
                                      max_diff=0.05)
    got = sorted((e[0, 3], r[0, 3]) for r, e in zip(ref, est))
    # est 0.1 <-> ref 0.1 (exact), est 0.102 <-> ref ... only 0.1 in
    # range but taken -> est 0.102 has 0.1 (used) within 0.05; 0.0/0.2
    # are 0.098/0.102 out of range -> dropped.  est 0.3 exact, est
    # 0.299 -> ref 0.3 used, others out of range -> dropped.
    assert got == [(11.0, 1.0), (12.0, 3.0)]
