"""Execute the rerun DataLogger against a spec-shaped FAKE rerun module.

rerun-sdk is not installable in this image, so `DataLoggerRR` — the
default logging backend of every reference config (ref run.py:64-65
spawns a rerun viewer per run) — would otherwise ship untested.  The
fake below implements exactly the rerun 0.19+ API surface the backend
uses (init/send_blueprint/spawn/log/set_time + the archetype
constructors), records every call, and validates array shapes, so the
whole logging path (blueprint layout, image normalization, ellipsoid
extents, quaternion reordering, transform decomposition) runs for real.
"""
import sys
import types

import numpy as np
import pytest


class _Recorder:
    def __init__(self):
        self.calls = []


def _make_fake_rerun(rec: _Recorder):
    rr = types.ModuleType("rerun")

    def record(name):
        def f(*a, **k):
            rec.calls.append((name, a, k))
            return f"{name}-ok"
        return f

    rr.init = record("init")
    rr.send_blueprint = record("send_blueprint")
    rr.spawn = record("spawn")
    rr.serve_grpc = record("serve_grpc")
    rr.connect_grpc = record("connect_grpc")
    rr.set_time = record("set_time")
    rr.log = record("log")

    class Image:
        def __init__(self, arr):
            arr = np.asarray(arr)
            assert arr.dtype == np.uint8, arr.dtype
            self.arr = arr

    class DepthImage:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    class Points3D:
        def __init__(self, pts):
            pts = np.asarray(pts)
            assert pts.ndim == 2 and pts.shape[1] == 3, pts.shape
            self.pts = pts

    class Scalars:
        def __init__(self, v):
            self.v = float(v)

    class Quaternion:
        def __init__(self, xyzw):
            xyzw = np.asarray(xyzw)
            assert xyzw.shape[-1] == 4
            self.xyzw = xyzw

    class Transform3D:
        def __init__(self, translation=None, mat3x3=None, axis_length=None):
            assert np.asarray(translation).shape == (3,)
            assert np.asarray(mat3x3).shape == (3, 3)
            self.translation = translation

    class Ellipsoids3D:
        def __init__(self, centers=None, half_sizes=None, quaternions=None,
                     colors=None, fill_mode=None):
            centers = np.asarray(centers)
            half = np.asarray(half_sizes)
            assert centers.shape[1] == 3
            assert half.shape == (centers.shape[0], 3)
            assert np.asarray(colors).shape == (centers.shape[0], 3)
            self.n = centers.shape[0]

    rr.Image, rr.DepthImage, rr.Points3D = Image, DepthImage, Points3D
    rr.Scalars, rr.Quaternion = Scalars, Quaternion
    rr.Transform3D, rr.Ellipsoids3D = Transform3D, Ellipsoids3D
    rr.components = types.SimpleNamespace(
        FillMode=types.SimpleNamespace(Solid="solid"))

    bp = types.ModuleType("rerun.blueprint")

    class _View:
        def __init__(self, origin=None, contents=None):
            self.origin, self.contents = origin, contents

    bp.Blueprint = bp.Horizontal = bp.Vertical = _View
    bp.Spatial2DView = bp.Spatial3DView = _View
    rr.blueprint = bp
    return rr, bp


@pytest.fixture
def fake_rerun(monkeypatch):
    rec = _Recorder()
    rr, bp = _make_fake_rerun(rec)
    monkeypatch.setitem(sys.modules, "rerun", rr)
    monkeypatch.setitem(sys.modules, "rerun.blueprint", bp)
    # the module caches `import rerun as rr` at import time: force reload
    sys.modules.pop("splatloam_tpu.logging_backends.rerun_logging", None)
    yield rec
    sys.modules.pop("splatloam_tpu.logging_backends.rerun_logging", None)


def test_rerun_backend_full_surface(fake_rerun, tmp_path):
    import jax.numpy as jnp

    from splatloam_tpu.config import Configuration, from_dict
    from splatloam_tpu.logging_backends.rerun_logging import DataLoggerRR
    from splatloam_tpu.model import surfels as S

    cfg = from_dict(Configuration, {"logging": {"rerun_spawn": True}})
    lg = DataLoggerRR(cfg)
    names = [c[0] for c in fake_rerun.calls]
    assert names[:3] == ["init", "send_blueprint", "spawn"]

    lg.set_timestamp(1.25)
    lg.log_image("frame/depth_in", np.random.default_rng(0).random((4, 8)))
    lg.log_depth_image("frame/depth", np.ones((4, 8)))
    lg.log_pointcloud("world/scan", np.zeros((5, 3)))
    lg.log_scalar("loss", 0.25)
    T = np.eye(4); T[:3, 3] = (1, 2, 3)
    lg.log_transform("world/frame", T)

    # a real (small) surfel pool through the ellipsoid path
    surf = S.empty_surfels(16)
    adam = S.empty_adam(16)
    newp = S.SurfelParams(
        xyz=jnp.asarray(np.random.default_rng(1).random((3, 3)),
                        jnp.float32),
        log_scale=jnp.full((3, 2), -2.0),
        quat=jnp.asarray([[1, 0, 0, 0]] * 3, jnp.float32),
        logit_opacity=jnp.full((3,), 1.0))
    surf, adam, _ = S.insert_surfels(surf, adam, newp, jnp.int32(3))
    lg.log_model("world/model", surf)

    names = [c[0] for c in fake_rerun.calls]
    assert names.count("log") == 6  # image/depth/cloud/scalar/transform + ellipsoids
    assert names.count("set_time") == 1

    # empty pool: must not log
    n_before = len(fake_rerun.calls)
    lg.log_model("world/model", S.empty_surfels(8))
    assert len(fake_rerun.calls) == n_before


def test_rerun_backend_grpc_modes(fake_rerun):
    from splatloam_tpu.config import Configuration, from_dict
    from splatloam_tpu.logging_backends.rerun_logging import DataLoggerRR

    cfg = from_dict(Configuration,
                    {"logging": {"rerun_spawn": False, "rerun_serve_grpc": True}})
    DataLoggerRR(cfg)
    assert "serve_grpc" in [c[0] for c in fake_rerun.calls]

    fake_rerun.calls.clear()
    cfg = from_dict(Configuration, {"logging": {
        "rerun_spawn": False,
        "rerun_connect_grpc_url": "rerun+http://127.0.0.1:9876/proxy"}})
    DataLoggerRR(cfg)
    kinds = [c[0] for c in fake_rerun.calls]
    assert "connect_grpc" in kinds and "spawn" not in kinds
