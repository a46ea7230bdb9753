"""Gradient-parity of every round-5 reduction/layout variant against the
RMW baseline, in Pallas interpret mode on a scene dense enough to
exercise truncation/overflow machinery:

  * scatter="fused"   — RMW folded into the backward kernel;
  * scatter="ranksum" — rank-windowed one-hot MXU segment sum (G=128);
  * ranksum + RS_TRUNC sorted truncation (with REAL overflow entries);
  * layout="bucketed" — two-capacity tile buckets (lossless caps);
  * batched ranksum above the VMEM row bound — sequential per-view
    launches (forced via a tiny _RS_POOL_ROWS_MAX).

All must reproduce the RMW path's gradients exactly (same math, other
schedule); the RMW path itself is parity-tested against the jnp golden
renderer in test_pallas_raster.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import splatloam_tpu.ops.rasterizer.pallas_raster as PR
from splatloam_tpu.ops.rasterizer import RenderParams
from splatloam_tpu.ops.rasterizer.api import prepare_tiles

H, W, N = 16, 256, 2000


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(PR, "_INTERPRET", True)


def _scene(rng):
    import bench
    bench.H, bench.W = H, W
    return bench.make_scene(rng, N, H, W)


def _grads(args, params, tiles=None):
    if tiles is None:
        tiles = prepare_tiles(*args, params, margin_px=1.5)

    def loss(xyz, s, q, o):
        out = PR.rasterize_pallas(xyz, s, q, o, args[4], args[5],
                                  params, tiles=tiles)
        return (jnp.sum(out["depth_sum"]) * 0.01 + jnp.sum(out["alpha"])
                + 0.2 * jnp.sum(out["normal_sum"]))

    return jax.grad(loss, argnums=(0, 1, 2, 3))(*args[:4])


def _base(**kw):
    return RenderParams(height=H, width=W, backend="pallas", chunk=128,
                        tile_h=4, tile_w=16, tile_list_capacity=256,
                        with_median=False, with_dist=False, **kw)


def _assert_match(ref, got, what):
    for name, a, b in zip(("xyz", "scale", "quat", "opac"), ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, err_msg=f"{what}:{name}")


@pytest.fixture
def ref_grads(rng):
    args = _scene(rng)
    return args, _grads(args, _base(scatter="rmw"))


def test_fused_matches_rmw(ref_grads):
    args, ref = ref_grads
    _assert_match(ref, _grads(args, _base(scatter="fused")), "fused")


def test_ranksum_matches_rmw(ref_grads):
    args, ref = ref_grads
    _assert_match(ref, _grads(args, _base(scatter="ranksum")), "ranksum")


def test_truncated_ranksum_with_overflow_matches_rmw(ref_grads,
                                                     monkeypatch):
    args, ref = ref_grads
    monkeypatch.setattr(PR, "_RS_TRUNC", 0.5)
    params = _base(scatter="ranksum")
    tiles = prepare_tiles(*args, params, margin_px=1.5)
    # the dense test scene must actually exercise the overflow path
    assert int(tiles.plan.n_ov) > 0, "scene no longer overflows; densify it"
    _assert_match(ref, _grads(args, params, tiles), "rs-trunc")


def test_bucketed_lossless_matches_rmw(ref_grads):
    args, ref = ref_grads
    # k_small = full capacity -> bucketing is a pure reordering
    for scatter in ("fused", "ranksum"):
        got = _grads(args, _base(scatter=scatter, layout="bucketed",
                                 bucket_k_small=256))
        _assert_match(ref, got, f"bucketed-{scatter}")


def test_batched_ranksum_sequential_fallback(rng, monkeypatch):
    args = _scene(rng)
    monkeypatch.setattr(PR, "_RS_POOL_ROWS_MAX", 1000)  # force fallback
    T_b = jnp.stack([args[4], args[4]])
    K_b = jnp.stack([args[5], args[5]])

    def grads(scatter):
        params = _base(scatter=scatter)

        def loss(xyz, s, q, o):
            out = PR.rasterize_pallas_batched(xyz, s, q, o, T_b, K_b,
                                              params)
            return jnp.sum(out["depth_sum"]) * 0.01 + jnp.sum(out["alpha"])

        return jax.grad(loss, argnums=(0, 1, 2, 3))(*args[:4])

    _assert_match(grads("rmw"), grads("ranksum"), "B2-seq-ranksum")
