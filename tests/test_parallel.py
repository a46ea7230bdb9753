"""Sharded train step on the virtual 8-device CPU mesh: must match the
single-device mapper step numerically."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatloam_tpu.geometry import se3
from splatloam_tpu.model import surfels as S
from splatloam_tpu.ops.rasterizer import RenderParams
from splatloam_tpu.parallel import make_mesh, sharded_train_step
from splatloam_tpu.parallel.sharded import shard_model_state

H, W = 16, 256
CAP = 512


def _setup(rng):
    n = 200
    theta = rng.uniform(-np.pi, np.pi, n)
    xyz = np.stack([6 * np.cos(theta), 6 * np.sin(theta),
                    rng.uniform(-1, 1, n)], -1).astype(np.float32)
    normals = -xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
    quat = np.asarray(se3.quat_from_normal(jnp.asarray(normals)))
    surf = S.empty_surfels(CAP)
    adam = S.empty_adam(CAP)
    newp = S.SurfelParams(
        xyz=jnp.asarray(xyz),
        log_scale=jnp.full((n, 2), -1.0),
        quat=jnp.asarray(quat),
        logit_opacity=jnp.full((n,), 2.0))
    surf, adam, _ = S.insert_surfels(surf, adam, newp, jnp.int32(n))
    from splatloam_tpu.geometry import spherical
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(xyz), H, W)
    depth = jnp.full((H, W), 6.0)
    valid = jnp.ones((H, W), bool)
    return surf, adam, K, jnp.eye(4), depth, valid


def _single_device_reference(surf, adam, K, T_cw, depth, valid, hyper):
    """The same losses computed without sharding."""
    from splatloam_tpu.ops.rasterizer import render
    params = RenderParams(height=H, width=W, backend="jnp")

    def loss_fn(p):
        scaling = jnp.exp(p.log_scale)
        opacity = jax.nn.sigmoid(p.logit_opacity) * surf.active
        pkg = render(p.xyz, scaling, p.quat, opacity, T_cw, K, params)
        validf = valid.astype(jnp.float32)
        v_sum = jnp.maximum(jnp.sum(validf), 1.0)
        geom = jnp.sum(jnp.abs(validf * (pkg["surf_depth"] - depth))) / \
            (H * W)
        ndot = jnp.sum(pkg["rend_normal"] * pkg["surf_normal"], -1)
        nl = 0.1 * jnp.sum((1 - ndot) * validf) / v_sum
        a = jnp.clip(pkg["rend_alpha"], 1e-7, 1 - 1e-7)
        al = 0.1 * jnp.sum(-jnp.log(a) * validf) / v_sum
        smax = jnp.max(scaling, axis=-1)
        reg = 0.2 * jnp.sum(jnp.maximum(smax - 0.5, 0.0) * surf.active)
        return geom + al + nl + reg

    loss, grads = jax.value_and_grad(loss_fn)(surf.params)
    s2, a2 = S.adam_step(surf, adam, grads, hyper)
    return s2, a2, loss


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_step_matches_single_device(rng, mesh_shape):
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    surf, adam, K, T_cw, depth, valid = _setup(rng)
    hyper = S.AdamHyper()
    ref_surf, ref_adam, ref_loss = _single_device_reference(
        surf, adam, K, T_cw, depth, valid, hyper)

    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    params = RenderParams(height=H, width=W, backend="jnp")
    step = sharded_train_step(mesh, params, hyper,
                              lambda_alpha=0.1, lambda_normal=0.1,
                              scaling_max=0.5, scaling_max_penalty=0.2)
    surf_sh, adam_sh = shard_model_state(mesh, surf, adam)
    new_surf, new_adam, loss = step(surf_sh, adam_sh, K, T_cw, depth,
                                    valid)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(new_surf.params.xyz),
                               np.asarray(ref_surf.params.xyz),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_adam.mu.xyz),
                               np.asarray(ref_adam.mu.xyz), atol=1e-5)
    assert int(new_adam.step) == 1
