"""LocalModel: one bounded submap = surfel pool + keyframes + origin pose.

Host-side counterpart of ref slam/local_model.py:7-49 with TPU additions:
capacity doubling for the static-shape surfel pool and pad-to-fixed keyframe
stacking for jit-stable mapping.
"""
from __future__ import annotations

import numpy as np

from ..config import Configuration
from ..logging_utils import get_logger
from .frame import Frame
from . import surfels as S

logger = get_logger("local_model")


class LocalModel:
    def __init__(self, cfg: Configuration):
        self.cfg = cfg
        self.keyframes: list[Frame] = []
        self.world_T_model = np.eye(4, dtype=np.float64)
        cap = int(cfg.compute.initial_capacity)
        self.surfels = S.empty_surfels(cap)
        self.adam = S.empty_adam(cap)

    def insert_keyframe(self, frame: Frame) -> None:
        self.keyframes.append(frame)

    def require_new_model(self) -> bool:
        """Submap rollover predicate (ref slam/local_model.py:19-35)."""
        thr_g = self.cfg.mapping.lmodel_threshold_ngaussians
        thr_k = self.cfg.mapping.lmodel_threshold_nkeyframes
        ret = False
        if thr_g and thr_g > 0:
            ret = ret or (self.no_gaussians > thr_g)
        if thr_k and thr_k > 0:
            ret = ret or (len(self.keyframes) > thr_k)
        return ret

    def ensure_free_slots(self, needed: int) -> None:
        """Double capacity until `needed` free slots exist (host-side)."""
        free = self.capacity - self.no_gaussians
        if free >= needed:
            return
        new_cap = self.capacity
        while new_cap - self.no_gaussians < needed:
            new_cap *= 2
        max_cap = self.cfg.mapping.lmodel_threshold_ngaussians
        if max_cap and max_cap > 0:
            # a bit of headroom over the rollover threshold is fine; cap
            # runaway growth at 2x the threshold
            new_cap = min(new_cap, max(2 * int(max_cap), self.capacity))
        if new_cap > self.capacity:
            logger.info(f"growing surfel capacity {self.capacity} -> "
                        f"{new_cap}")
            self.surfels, self.adam = S.grow_capacity(
                self.surfels, self.adam, new_cap)

    @property
    def capacity(self) -> int:
        return self.surfels.capacity

    @property
    def no_gaussians(self) -> int:
        return int(self.surfels.num_active)

    @property
    def size_mb(self) -> float:
        # ref slam/local_model.py:41-45: (3+4+2+1) float32 per surfel
        return (10 * 4 * self.no_gaussians) / (1024.0 ** 2)
