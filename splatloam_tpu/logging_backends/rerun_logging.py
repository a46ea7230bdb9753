"""rerun.io backend (ref utils/logging_backends/rerun_logging.py:12-91).

Only importable when the optional rerun-sdk is installed; surfels are logged
as ellipsoids, images off device_get'd arrays.
"""
from __future__ import annotations

import numpy as np
import rerun as rr

from ..logging_utils import get_logger

logger = get_logger("rerun")


class DataLoggerRR:
    def __init__(self, cfg):
        lc = cfg.logging
        rr.init("splatloam_tpu")
        if lc.rerun_spawn:
            rr.spawn()
        elif lc.rerun_serve_grpc:
            rr.serve_grpc()
        elif lc.rerun_connect_grpc_url:
            rr.connect_grpc(lc.rerun_connect_grpc_url)

    def set_timestamp(self, timestamp: float) -> None:
        rr.set_time("time", timestamp=timestamp)

    def log_image(self, topic: str, image) -> None:
        rr.log(topic, rr.Image(np.asarray(image)))

    def log_depth_image(self, topic: str, image) -> None:
        rr.log(topic, rr.DepthImage(np.asarray(image)))

    def log_model(self, topic: str, surfels) -> None:
        from ..model.surfels import compact_arrays
        arrs = compact_arrays(surfels)
        if len(arrs["xyz"]) == 0:
            return
        scales = np.exp(arrs["log_scale"])
        half_sizes = np.concatenate(
            [scales, np.full((len(scales), 1), 1e-3)], axis=-1)
        quats = np.asarray(arrs["quat"])
        rr.log(topic, rr.Ellipsoids3D(
            centers=arrs["xyz"], half_sizes=half_sizes,
            quaternions=rr.Quaternion(
                xyzw=np.roll(quats, -1, axis=-1))))

    def log_transform(self, topic: str, T) -> None:
        T = np.asarray(T)
        rr.log(topic, rr.Transform3D(translation=T[:3, 3],
                                     mat3x3=T[:3, :3]))

    def log_pointcloud(self, topic: str, points) -> None:
        rr.log(topic + "/cloud", rr.Points3D(np.asarray(points)))

    def log_scalar(self, topic: str, value: float) -> None:
        rr.log(topic, rr.Scalars(float(value)))
