import jax
import jax.numpy as jnp
import numpy as np

from splatloam_tpu.model import surfels as S


def _new_params(m, base=1.0):
    return S.SurfelParams(
        xyz=jnp.full((m, 3), base),
        log_scale=jnp.full((m, 2), -1.0),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (m, 1)),
        logit_opacity=jnp.full((m,), 2.0))


def test_insert_and_prune_roundtrip():
    surf = S.empty_surfels(16)
    adam = S.empty_adam(16)
    surf, adam, n = S.insert_surfels(surf, adam, _new_params(8),
                                     jnp.int32(5))
    assert int(n) == 5
    assert int(surf.num_active) == 5
    np.testing.assert_allclose(np.asarray(surf.params.xyz[:5]), 1.0)
    # slots beyond n_new untouched
    assert not bool(surf.active[5])

    # prune 2, then insert again reuses freed slots
    prune_mask = jnp.zeros(16, bool).at[1].set(True).at[3].set(True)
    surf = S.prune_surfels(surf, prune_mask)
    assert int(surf.num_active) == 3
    surf, adam, n = S.insert_surfels(surf, adam, _new_params(4, 7.0),
                                     jnp.int32(4))
    assert int(n) == 4
    assert int(surf.num_active) == 7
    # freed slots 1 and 3 were recycled
    assert bool(surf.active[1]) and bool(surf.active[3])
    np.testing.assert_allclose(np.asarray(surf.params.xyz[1]), 7.0)


def test_insert_respects_capacity():
    surf = S.empty_surfels(8)
    adam = S.empty_adam(8)
    surf, adam, n = S.insert_surfels(surf, adam, _new_params(16),
                                     jnp.int32(16))
    assert int(n) == 8
    assert int(surf.num_active) == 8


def test_adam_moves_only_active():
    surf = S.empty_surfels(8)
    adam = S.empty_adam(8)
    surf, adam, _ = S.insert_surfels(surf, adam, _new_params(4),
                                     jnp.int32(4))
    grads = S.SurfelParams(
        xyz=jnp.ones((8, 3)), log_scale=jnp.ones((8, 2)),
        quat=jnp.ones((8, 4)), logit_opacity=jnp.ones((8,)))
    before = np.asarray(surf.params.xyz).copy()
    surf2, adam2 = S.adam_step(surf, adam, grads, S.AdamHyper())
    after = np.asarray(surf2.params.xyz)
    assert int(adam2.step) == 1
    assert np.all(after[:4] != before[:4])
    np.testing.assert_array_equal(after[4:], before[4:])


def test_moments_zeroed_on_insert():
    surf = S.empty_surfels(8)
    adam = S.empty_adam(8)
    surf, adam, _ = S.insert_surfels(surf, adam, _new_params(4),
                                     jnp.int32(4))
    grads = S.SurfelParams(
        xyz=jnp.ones((8, 3)), log_scale=jnp.ones((8, 2)),
        quat=jnp.ones((8, 4)), logit_opacity=jnp.ones((8,)))
    surf, adam = S.adam_step(surf, adam, grads, S.AdamHyper())
    assert float(jnp.abs(adam.mu.xyz[:4]).sum()) > 0
    # prune slot 0 and reinsert: its moments must reset
    surf = S.prune_surfels(surf, jnp.zeros(8, bool).at[0].set(True))
    surf, adam, _ = S.insert_surfels(surf, adam, _new_params(1, 9.0),
                                     jnp.int32(1))
    np.testing.assert_allclose(np.asarray(adam.mu.xyz[0]), 0.0)
    # step count survives (torch-Adam-after-cat semantics)
    assert int(adam.step) == 1


def test_grow_capacity_preserves_state():
    surf = S.empty_surfels(4)
    adam = S.empty_adam(4)
    surf, adam, _ = S.insert_surfels(surf, adam, _new_params(4),
                                     jnp.int32(4))
    surf2, adam2 = S.grow_capacity(surf, adam, 16)
    assert surf2.capacity == 16
    assert int(surf2.num_active) == 4
    np.testing.assert_array_equal(np.asarray(surf2.params.xyz[:4]),
                                  np.asarray(surf.params.xyz))
