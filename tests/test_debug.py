"""Sanitizer/debug subsystem (splatloam_tpu.debug, SURVEY §5 aux)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatloam_tpu import debug
from splatloam_tpu.model import surfels as S


def test_finite_state_report_masks_padding():
    """Padding lanes may hold garbage; only ACTIVE rows are checked."""
    surf = S.empty_surfels(8)
    params = surf.params._replace(
        xyz=surf.params.xyz.at[5, 0].set(jnp.nan))
    active = jnp.zeros((8,), bool).at[0].set(True)   # row 5 inactive
    rep = debug.finite_state_report(params, active=active)
    assert all(v == 0 for v in rep.values())
    debug.assert_finite_state(params, active=active)  # no raise

    active_bad = active.at[5].set(True)
    rep2 = debug.finite_state_report(params, active=active_bad)
    assert sum(rep2.values()) == 1
    with pytest.raises(FloatingPointError, match="xyz"):
        debug.assert_finite_state(params, active=active_bad, what="map")


def test_checked_raises_on_nan():
    from jax.experimental import checkify

    def f(x):
        return jnp.log(x)  # nan for x < 0

    run = debug.checked(f)
    np.testing.assert_allclose(run(jnp.ones(4)), 0.0, atol=1e-7)
    with pytest.raises(checkify.JaxRuntimeError):
        run(-jnp.ones(4))


def test_audit_donation_reports_buffer_reuse():
    """The optimize loop's state-in/state-out shape: a donated buffer
    must be consumed (aliased) by XLA; the audit reports it."""
    def step(state, g):
        return jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, state, g)

    state = {"xyz": jnp.ones((128, 3)), "opa": jnp.zeros((128, 1))}
    g = jax.tree_util.tree_map(jnp.ones_like, state)
    report = debug.audit_donation(step, (state, g), donate_argnums=(0,))
    assert report == {0: True}


def test_enable_checks_roundtrip():
    debug.enable_checks("nans")
    assert jax.config.jax_debug_nans
    debug.enable_checks("off")
    assert not jax.config.jax_debug_nans
    with pytest.raises(ValueError):
        debug.enable_checks("bogus")


def test_slam_debug_checks_gate(tmp_path, rng):
    """logging.debug_checks=true runs the per-keyframe sanitizer inside
    the normal SLAM loop (healthy run: no raise)."""
    import synthetic
    from splatloam_tpu.logging_backends import reset_datalogger
    from splatloam_tpu.preprocessing import Preprocessor
    from splatloam_tpu.slam import SLAM

    reset_datalogger()
    cfg = synthetic.make_config(
        tmp_path,
        mapping={"num_iterations": 8},
        compute={"backend": "jnp", "initial_capacity": 2048,
                 "keyframe_capacity": 8})
    cfg.logging.debug_checks = True
    pre = Preprocessor(cfg)
    slam = SLAM(cfg)
    poses = synthetic.straight_trajectory(2, step=0.4)
    for i, pose in enumerate(poses):
        cloud = synthetic.sensor_cloud(rng, pose)
        slam.process(pre(cloud, 0.1 * i, pose))
    assert slam.local_models[-1].no_gaussians > 0
