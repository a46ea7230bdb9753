"""Self-contained grid Poisson reconstruction (eval.tsdf.poisson_grid):
geometric accuracy + open-scan hallucination trimming (the reference's
headline meshing is Open3D Poisson with density trimming,
ref scene/postprocessing.py:94-216; this is the Open3D-free equivalent).
"""
import numpy as np
from scipy.spatial import cKDTree

from splatloam_tpu.eval.tsdf import poisson_grid


def _cylinder_samples(rng, n=30_000, radius=4.0, zlim=1.5):
    th = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(-zlim, zlim, n)
    pts = np.stack([radius * np.cos(th), radius * np.sin(th), z], -1)
    normals = np.stack([-np.cos(th), -np.sin(th), np.zeros(n)], -1)
    return pts.astype(np.float32), normals.astype(np.float32)


def test_poisson_grid_cylinder_accuracy(rng):
    pts, nrm = _cylinder_samples(rng)
    voxel = 0.15
    verts, faces = poisson_grid(pts, nrm, voxel_size=voxel)
    assert len(verts) > 500 and len(faces) > 500

    # vertices lie on the cylinder to within ~a voxel
    r = np.linalg.norm(verts[:, :2], axis=1)
    err = np.abs(r - 4.0)
    assert np.median(err) < voxel, np.median(err)
    assert np.quantile(err, 0.95) < 2 * voxel

    # the surface is covered: every sample has a nearby mesh vertex
    d, _ = cKDTree(verts).query(pts[::50], k=1)
    assert np.quantile(d, 0.95) < 2 * voxel

    # no hallucinated geometry away from the samples (density trimming)
    d2, _ = cKDTree(pts).query(verts, k=1)
    assert d2.max() < 6 * voxel, d2.max()


def test_poisson_grid_open_plane(rng):
    """An OPEN surface (no inside/outside): the grid solve + support mask
    must still produce a plane patch without wrap-around sheets."""
    n = 20_000
    pts = np.stack([rng.uniform(-3, 3, n), rng.uniform(-3, 3, n),
                    np.zeros(n)], -1).astype(np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (n, 1))
    verts, faces = poisson_grid(pts, nrm, voxel_size=0.2)
    assert len(verts) > 200
    assert np.quantile(np.abs(verts[:, 2]), 0.95) < 0.2
    # extent stays within the sampled patch (+ dilation margin)
    assert np.abs(verts[:, :2]).max() < 3.0 + 1.0


def test_poisson_grid_empty():
    v, f = poisson_grid(np.zeros((0, 3)), np.zeros((0, 3)), 0.2)
    assert len(v) == 0 and len(f) == 0
