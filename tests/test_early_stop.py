import jax
import numpy as np
import pytest

import synthetic
from splatloam_tpu.logging_backends import reset_datalogger
from splatloam_tpu.model.local_model import LocalModel
from splatloam_tpu.preprocessing import Preprocessor
from splatloam_tpu.slam.mapper import Mapper


def _setup(tmp_path, rng, **mapping):
    reset_datalogger()
    cfg = synthetic.make_config(tmp_path, mapping=mapping)
    pre = Preprocessor(cfg)
    frame = pre(synthetic.sensor_cloud(rng, np.eye(4)), 0.0, np.eye(4))
    lm = LocalModel(cfg)
    lm.insert_keyframe(frame)
    mapper = Mapper(cfg)
    mapper.register_model(lm)
    cam = frame.camera_in_model()
    progs = mapper.programs_for(cam.height, cam.width, lm.capacity)
    lm.ensure_free_slots(progs.max_new)
    lm.surfels, lm.adam, _, _ = progs._densify(
        lm.surfels, lm.adam, cam, jax.random.PRNGKey(1), initialize=True)
    kf = mapper._stack_keyframes(8)
    return progs, lm, kf


def test_early_stop_runs_fewer_iterations(tmp_path, rng):
    progs, lm, kf = _setup(tmp_path, rng, num_iterations=200,
                           early_stop_enable=True,
                           early_stop_patience=16,
                           early_stop_threshold=0.2)
    s, a, ema, n_run = progs._optimize(lm.surfels, lm.adam, kf,
                                       jax.random.PRNGKey(2))
    n_run = int(n_run)
    assert n_run < 200, f"early stop never triggered (ran {n_run})"
    assert n_run >= 16
    assert np.isfinite(float(ema))


@pytest.mark.slow
def test_multiview_optimize_converges(tmp_path, rng):
    """views_per_iteration=3: batched multi-view optimization must fit
    the keyframe at least as well as the single-view loop for the same
    iteration count (each iteration sees 3 sampled views)."""
    progs1, lm1, kf1 = _setup(tmp_path / "a", rng, num_iterations=40,
                              early_stop_enable=False)
    s1, _, ema1, _ = progs1._optimize(lm1.surfels, lm1.adam, kf1,
                                      jax.random.PRNGKey(2))
    rng2 = np.random.default_rng(0)
    progs3, lm3, kf3 = _setup(tmp_path / "b", rng2, num_iterations=40,
                              early_stop_enable=False,
                              views_per_iteration=3)
    s3, _, ema3, _ = progs3._optimize(lm3.surfels, lm3.adam, kf3,
                                      jax.random.PRNGKey(2))
    assert np.isfinite(float(ema3))
    assert float(ema3) < 1.5 * float(ema1) + 0.05, (float(ema3),
                                                    float(ema1))


def test_no_early_stop_runs_all(tmp_path, rng):
    progs, lm, kf = _setup(tmp_path, rng, num_iterations=40,
                           early_stop_enable=False)
    s, a, ema, n_run = progs._optimize(lm.surfels, lm.adam, kf,
                                       jax.random.PRNGKey(2))
    # blocks of rebin_every iterations; total >= requested
    assert int(n_run) >= 40
