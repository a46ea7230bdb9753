"""Device-mesh construction for multi-chip mapping.

The reference is strictly single-GPU (SURVEY.md §2.4); this layer is new.
Axes:
  "data"  — range-image ROWS are sharded across devices (the sequence/
            context-parallel analog: alpha compositing is per-pixel, so row
            blocks render independently and gradients psum over ICI);
  "model" — the surfel pool + Adam state are sharded FSDP-style: params
            all-gather before a step, gradients reduce-scatter back.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from ..logging_utils import get_logger

logger = get_logger("parallel")


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """Mesh over (data, model); data defaults to n_devices // model."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, \
        f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    logger.info(f"mesh: data={data} model={model} on {arr.shape} devices")
    return Mesh(arr, ("data", "model"))


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (jax.distributed); no-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
