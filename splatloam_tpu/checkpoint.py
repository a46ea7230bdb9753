"""Mid-run checkpoint / resume (new; the reference persists only end-of-run
artifacts — SURVEY §5: TPUs preempt, so in-flight SLAM state must snapshot).

Snapshot contents: per-submap surfel params + Adam state + keyframe
cameras/poses + odometry so far.  Stored as plain .npz bundles (one per
submap) + a manifest, so resume needs no orbax server-side machinery and
files stay inspectable; orbax is available in this image but brings async
machinery we don't need for ~MB-scale states.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .logging_utils import get_logger
from .model import surfels as S
from .model.camera import Camera
from .model.frame import Frame

logger = get_logger("checkpoint")

FORMAT_VERSION = 1


def _frame_arrays(frame: Frame, prefix: str) -> dict:
    cam = frame.camera
    return {
        f"{prefix}_K": np.asarray(cam.K),
        f"{prefix}_T_cw": np.asarray(cam.T_cw),
        f"{prefix}_depth": np.asarray(cam.depth),
        f"{prefix}_normal": np.asarray(cam.normal),
        f"{prefix}_valid": np.asarray(cam.valid),
        f"{prefix}_meta": np.array([frame.timestamp]),
        f"{prefix}_model_T_frame": np.asarray(frame.model_T_frame),
        f"{prefix}_world_T_frame": np.asarray(frame.world_T_frame),
    }


def _frame_from_arrays(d, prefix: str) -> Frame:
    import jax.numpy as jnp
    cam = Camera(K=jnp.asarray(d[f"{prefix}_K"]),
                 T_cw=jnp.asarray(d[f"{prefix}_T_cw"]),
                 depth=jnp.asarray(d[f"{prefix}_depth"]),
                 normal=jnp.asarray(d[f"{prefix}_normal"]),
                 valid=jnp.asarray(d[f"{prefix}_valid"]))
    frame = Frame(camera=cam, timestamp=float(d[f"{prefix}_meta"][0]),
                  model_T_frame=d[f"{prefix}_model_T_frame"],
                  world_T_frame=d[f"{prefix}_world_T_frame"])
    return frame


def save_checkpoint(directory: str | Path, slam) -> Path:
    """Snapshot a SLAM instance's full in-flight state."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    manifest = {
        "version": FORMAT_VERSION,
        "n_models": len(slam.local_models),
        "n_frames_processed": len(slam.frames),
        "timestamps": [float(t) for t in slam.timestamps],
        "date_start": slam.date_start,
    }
    np.save(directory / "world_T_odom.npy",
            np.stack(slam.world_T_odom) if slam.world_T_odom
            else np.zeros((0, 4, 4)))
    np.save(directory / "keyframe_T_frame.npy",
            np.asarray(slam.tracker.keyframe_T_frame))
    for mid, model in enumerate(slam.local_models):
        arrays = {
            "world_T_model": np.asarray(model.world_T_model),
            "active": np.asarray(model.surfels.active),
            "adam_step": np.asarray(model.adam.step),
            "n_keyframes": np.array([len(model.keyframes)]),
        }
        for name, arr in zip(S.SurfelParams._fields, model.surfels.params):
            arrays[f"param_{name}"] = np.asarray(arr)
        for name, arr in zip(S.SurfelParams._fields, model.adam.mu):
            arrays[f"mu_{name}"] = np.asarray(arr)
        for name, arr in zip(S.SurfelParams._fields, model.adam.nu):
            arrays[f"nu_{name}"] = np.asarray(arr)
        for k, frame in enumerate(model.keyframes):
            arrays.update(_frame_arrays(frame, f"kf{k}"))
        np.savez_compressed(directory / f"model_{mid:04d}.npz", **arrays)
    with open(directory / "manifest.json", "w") as f:
        json.dump(manifest, f)
    logger.info(f"checkpoint saved to {directory} "
                f"({manifest['n_frames_processed']} frames, "
                f"{manifest['n_models']} submaps)")
    return directory


def load_checkpoint(directory: str | Path, slam) -> int:
    """Restore state into a freshly-constructed SLAM; returns the number of
    frames already processed (the caller skips that many inputs)."""
    import jax.numpy as jnp

    from .model.local_model import LocalModel

    directory = Path(directory)
    with open(directory / "manifest.json") as f:
        manifest = json.load(f)
    assert manifest["version"] == FORMAT_VERSION
    odom = np.load(directory / "world_T_odom.npy")
    slam.world_T_odom = [odom[i] for i in range(len(odom))]
    slam.timestamps = list(manifest["timestamps"])
    slam.date_start = manifest["date_start"]
    slam.local_models = []
    for mid in range(manifest["n_models"]):
        d = np.load(directory / f"model_{mid:04d}.npz")
        model = LocalModel(slam.cfg)
        model.world_T_model = d["world_T_model"]
        params = S.SurfelParams(*(jnp.asarray(d[f"param_{n}"])
                                  for n in S.SurfelParams._fields))
        model.surfels = S.Surfels(params=params,
                                  active=jnp.asarray(d["active"]))
        model.adam = S.AdamState(
            mu=S.SurfelParams(*(jnp.asarray(d[f"mu_{n}"])
                                for n in S.SurfelParams._fields)),
            nu=S.SurfelParams(*(jnp.asarray(d[f"nu_{n}"])
                                for n in S.SurfelParams._fields)),
            step=jnp.asarray(d["adam_step"]))
        for k in range(int(d["n_keyframes"][0])):
            model.keyframes.append(_frame_from_arrays(d, f"kf{k}"))
        slam.local_models.append(model)
    # frames list only tracks count + timestamps for the writer; keyframes
    # carry the cameras.  Rebuild slam.frames as the keyframe set.
    slam.frames = [kf for m in slam.local_models for kf in m.keyframes]
    slam.frames = slam.frames[:manifest["n_frames_processed"]] \
        if len(slam.frames) >= manifest["n_frames_processed"] else \
        slam.frames + [slam.frames[-1]] * (manifest["n_frames_processed"]
                                           - len(slam.frames))
    last = slam.local_models[-1]
    slam.mapper.register_model(last)
    slam.tracker.register_model(last)
    slam.tracker.register_keyframe(last.keyframes[-1])
    slam.tracker.keyframe_T_frame = np.load(
        directory / "keyframe_T_frame.npy")
    logger.info(f"checkpoint restored: {manifest['n_frames_processed']} "
                f"frames, {manifest['n_models']} submaps")
    return manifest["n_frames_processed"]
