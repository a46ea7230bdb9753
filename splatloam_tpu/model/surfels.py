"""Fixed-capacity surfel parameter store with a masked Adam optimizer.

TPU-first redesign of the reference's GaussianModel
(ref scene/gaussian_model.py:20-316): XLA needs static shapes, so instead of
torch's dynamic cat/index optimizer-state surgery (densification_postfix
:267-299 / prune_points :239-265) the surfel pool is a padded [capacity]
pytree with an ``active`` mask:

  * densify = scatter new params into free slots + zero their Adam moments
  * prune   = clear mask bits (slot is recycled by a later densify)
  * growth  = host-side capacity doubling (recompile amortized, outside jit)

Parameterization matches the reference: xyz [C,3]; log-scale [C,2] (exp
activation); wxyz quaternion [C,4] (normalized on use); logit opacity [C]
(sigmoid activation).  Adam uses per-field learning rates with eps=1e-15 and
a single global step count, mirroring torch.optim.Adam(...) at
ref scene/gaussian_model.py:97-121.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SurfelParams(NamedTuple):
    """The trainable leaves (everything Adam touches)."""
    xyz: jax.Array            # [C, 3]
    log_scale: jax.Array      # [C, 2]
    quat: jax.Array           # [C, 4] wxyz
    logit_opacity: jax.Array  # [C]


class Surfels(NamedTuple):
    params: SurfelParams
    active: jax.Array         # [C] bool

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    # --- activations (ref scene/gaussian_model.py:39-44) ---
    @property
    def scaling(self) -> jax.Array:
        return jnp.exp(self.params.log_scale)

    @property
    def opacity(self) -> jax.Array:
        """Activated opacity, already masked by ``active``."""
        return jax.nn.sigmoid(self.params.logit_opacity) * self.active

    @property
    def rotation(self) -> jax.Array:
        return self.params.quat  # normalized inside quat_to_rotmat

    @property
    def num_active(self) -> jax.Array:
        return jnp.sum(self.active)


class AdamState(NamedTuple):
    mu: SurfelParams
    nu: SurfelParams
    step: jax.Array  # scalar int32


class AdamHyper(NamedTuple):
    """Per-field lrs (ref opt config) + shared Adam constants."""
    lr_xyz: float = 5e-4
    lr_scale: float = 5e-3
    lr_quat: float = 1e-3
    lr_opacity: float = 5e-2
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-15


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def empty_surfels(capacity: int) -> Surfels:
    params = SurfelParams(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        log_scale=jnp.zeros((capacity, 2), jnp.float32),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32),
                      (capacity, 1)),
        logit_opacity=jnp.full((capacity,), -10.0, jnp.float32),
    )
    return Surfels(params=params, active=jnp.zeros((capacity,), bool))


def empty_adam(capacity: int) -> AdamState:
    zeros = empty_surfels(capacity).params._replace(
        quat=jnp.zeros((capacity, 4), jnp.float32),
        logit_opacity=jnp.zeros((capacity,), jnp.float32))
    zeros = SurfelParams(*(jnp.zeros_like(a) for a in zeros))
    return AdamState(mu=zeros, nu=zeros, step=jnp.zeros((), jnp.int32))


def adam_step(surfels: Surfels, state: AdamState, grads: SurfelParams,
              hyper: AdamHyper) -> tuple[Surfels, AdamState]:
    """One masked Adam update; inactive slots are left untouched."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    c1 = 1.0 - hyper.b1 ** t
    c2 = 1.0 - hyper.b2 ** t
    lrs = SurfelParams(xyz=hyper.lr_xyz, log_scale=hyper.lr_scale,
                       quat=hyper.lr_quat, logit_opacity=hyper.lr_opacity)
    active = surfels.active

    def upd(p, g, m, v, lr):
        mask = active.reshape((-1,) + (1,) * (p.ndim - 1))
        g = jnp.where(mask, g, 0.0)
        m = hyper.b1 * m + (1 - hyper.b1) * g
        v = hyper.b2 * v + (1 - hyper.b2) * g * g
        update = lr * (m / c1) / (jnp.sqrt(v / c2) + hyper.eps)
        return p - jnp.where(mask, update, 0.0), m, v

    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lr in zip(surfels.params, grads, state.mu, state.nu,
                              lrs):
        p2, m2, v2 = upd(p, g, m, v, lr)
        new_p.append(p2)
        new_m.append(m2)
        new_v.append(v2)
    return (Surfels(params=SurfelParams(*new_p), active=active),
            AdamState(mu=SurfelParams(*new_m), nu=SurfelParams(*new_v),
                      step=step))


def insert_surfels(surfels: Surfels, state: AdamState,
                   new_params: SurfelParams, n_new: jax.Array
                   ) -> tuple[Surfels, AdamState, jax.Array]:
    """Scatter up to n_new rows of new_params into free slots.

    ``new_params`` leaves have a static leading dim [M] (padded); only the
    first min(n_new, free) rows are written.  Replaces the optimizer-state
    cat of ref scene/gaussian_model.py:267-316: new slots get zeroed Adam
    moments while the global step count is preserved (same semantics as
    torch Adam after a cat).

    Returns (surfels, adam_state, n_written).
    """
    cap = surfels.capacity
    m = new_params.xyz.shape[0]
    if m > cap:  # static shapes: drop overflow rows beyond capacity
        new_params = SurfelParams(*(a[:cap] for a in new_params))
        m = cap
    # free slots first (stable: lowest indices first)
    order = jnp.argsort(surfels.active.astype(jnp.int32), stable=True)
    slots = order[:m]
    n_free = cap - jnp.sum(surfels.active)
    n_write = jnp.minimum(jnp.minimum(n_new, n_free), m)
    write = jnp.arange(m) < n_write

    def scatter(dst, src):
        mask = write.reshape((-1,) + (1,) * (dst.ndim - 1))
        src = jnp.where(mask, src, dst[slots])
        return dst.at[slots].set(src)

    params = SurfelParams(*(scatter(d, s)
                            for d, s in zip(surfels.params, new_params)))
    active = surfels.active.at[slots].set(
        jnp.where(write, True, surfels.active[slots]))

    def zero_moments(mo):
        mask = write.reshape((-1,) + (1,) * (mo.ndim - 1))
        return mo.at[slots].set(jnp.where(mask, 0.0, mo[slots]))

    mu = SurfelParams(*(zero_moments(a) for a in state.mu))
    nu = SurfelParams(*(zero_moments(a) for a in state.nu))
    return (Surfels(params=params, active=active),
            AdamState(mu=mu, nu=nu, step=state.step), n_write)


def prune_surfels(surfels: Surfels, prune_mask: jax.Array) -> Surfels:
    """Deactivate slots (ref scene/gaussian_model.py:258-265 semantics)."""
    return surfels._replace(active=surfels.active & ~prune_mask)


def grow_capacity(surfels: Surfels, state: AdamState, new_capacity: int
                  ) -> tuple[Surfels, AdamState]:
    """Host-side capacity growth (pad with inactive slots)."""
    old = surfels.capacity
    assert new_capacity >= old
    if new_capacity == old:
        return surfels, state
    pad = new_capacity - old
    fresh = empty_surfels(new_capacity)

    def cat(a, b):
        return jnp.concatenate([a, b[old:]], axis=0)

    params = SurfelParams(*(cat(a, b) for a, b in
                            zip(surfels.params, fresh.params)))
    active = jnp.concatenate([surfels.active,
                              jnp.zeros((pad,), bool)])

    def padz(a):
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)

    mu = SurfelParams(*(padz(a) for a in state.mu))
    nu = SurfelParams(*(padz(a) for a in state.nu))
    return (Surfels(params=params, active=active),
            AdamState(mu=mu, nu=nu, step=state.step))


def create_from_cloud(xyz: jax.Array, normals: jax.Array,
                      capacity: int, max_scale: float = 0.5
                      ) -> tuple[Surfels, AdamState]:
    """Bootstrap a surfel pool from an oriented point cloud.

    Mirrors ref scene/gaussian_model.py:74-95 (create_from_pcd): scales from
    3-NN mean square distance clamped to max_scale^2, rotations aligning the
    surfel normal axis to the given normals, opacity sigma^-1(0.9).
    """
    from ..geometry import se3
    from ..ops import knn

    n = xyz.shape[0]
    surf = empty_surfels(capacity)
    adam = empty_adam(capacity)
    d2 = jnp.clip(knn.mean_sq_dist_knn(xyz), 1e-7, max_scale ** 2)
    log_scale = jnp.tile(0.5 * jnp.log(d2)[:, None], (1, 2))
    quat = se3.quat_from_normal(normals)
    params = SurfelParams(
        xyz=jnp.asarray(xyz, jnp.float32),
        log_scale=log_scale.astype(jnp.float32),
        quat=quat.astype(jnp.float32),
        logit_opacity=jnp.full((n,), inverse_sigmoid(0.9), jnp.float32))
    surf, adam, _ = insert_surfels(surf, adam, params, jnp.int32(n))
    return surf, adam


def compact_arrays(surfels: Surfels) -> dict[str, np.ndarray]:
    """Host-side: gather active rows as numpy (for PLY export etc.)."""
    active = np.asarray(surfels.active)
    idx = np.nonzero(active)[0]
    return {
        "xyz": np.asarray(surfels.params.xyz)[idx],
        "log_scale": np.asarray(surfels.params.log_scale)[idx],
        "quat": np.asarray(surfels.params.quat)[idx],
        "logit_opacity": np.asarray(surfels.params.logit_opacity)[idx],
    }
