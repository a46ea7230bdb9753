"""Debug / sanitizer subsystem (SURVEY §5 aux row "sanitizers").

The reference has no equivalent (its debugging surface is the
rasterizer's ``debug=False`` flag, ref gaussian_renderer/__init__.py:24);
on TPU the useful sanitizers are different:

  * ``enable_checks`` — process-wide jax debug_nans/debug_infs switches
    (tracing-level: every jitted program re-checks its outputs);
  * ``checked`` — a checkify wrapper that turns device-side NaN/inf/OOB
    events into Python exceptions with source locations, for driving a
    single suspect program under test;
  * ``finite_state_report`` — a cheap device-side reduction over a
    surfel-state pytree (one scalar D2H per call) used by the SLAM loop
    when ``logging.debug_checks`` is on: catches a diverged map at the
    keyframe where it happened rather than at save_results;
  * ``audit_donation`` — compiles a jitted program with donation and
    reports which arguments XLA actually reused (aliasing audit for the
    optimize-loop's in-place surfel/Adam buffers).
"""
from __future__ import annotations

import warnings
from typing import Callable, Iterable

import jax
import jax.numpy as jnp

from .logging_utils import get_logger

logger = get_logger(__name__)


def enable_checks(mode: str = "nans") -> None:
    """Process-wide NaN/Inf tracing: "nans", "infs", "all", or "off".

    Under these flags XLA re-runs every jitted computation un-jitted
    when a NaN/Inf appears in an output, pinpointing the producing
    primitive — slow, so intended for debugging sessions (wired to the
    CLI's ``--debug-checks nans``), not production runs.
    """
    if mode not in ("nans", "infs", "all", "off"):
        # validate BEFORE touching jax.config: a bogus mode must not
        # silently clear previously-enabled tracing
        raise ValueError(f"unknown check mode {mode!r}")
    jax.config.update("jax_debug_nans", mode in ("nans", "all"))
    jax.config.update("jax_debug_infs", mode in ("infs", "all"))


def checked(fn: Callable) -> Callable:
    """Wrap a jittable fn so device-side float errors raise host-side.

    Uses jax.experimental.checkify with float + index checks: the
    returned callable raises ``checkify.JaxRuntimeError`` with the
    offending source line instead of silently propagating NaNs.
    """
    from jax.experimental import checkify

    errs = checkify.float_checks | checkify.index_checks
    cfn = checkify.checkify(fn, errors=errs)

    def run(*args, **kw):
        err, out = cfn(*args, **kw)
        checkify.check_error(err)
        return out

    return run


def finite_state_report(tree, active=None) -> dict:
    """One-scalar-per-leaf finiteness summary of a pytree (device-side
    reductions; the per-leaf counts are stacked into one vector so the
    whole report costs a single D2H).

    ``active`` optionally masks rows (e.g. the surfel pool's live mask)
    so padding lanes — which are allowed to hold anything — don't trip
    the check.  Returns {leaf_path: n_nonfinite}.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    keys, counts = [], []
    for path, leaf in flat:
        if not isinstance(leaf, jax.Array) or not jnp.issubdtype(
                leaf.dtype, jnp.floating):
            continue
        bad = ~jnp.isfinite(leaf)
        if active is not None and leaf.ndim >= 1 and \
                leaf.shape[0] == active.shape[0]:
            mask = active.reshape((-1,) + (1,) * (leaf.ndim - 1))
            bad = bad & mask
        keys.append(jax.tree_util.keystr(path))
        counts.append(jnp.sum(bad, dtype=jnp.int32))
    if not keys:
        return {}
    stacked = [int(v) for v in jax.device_get(jnp.stack(counts))]
    return dict(zip(keys, stacked))


def assert_finite_state(tree, active=None, what: str = "state") -> None:
    """Raise (with the per-leaf count table) if any active lane is
    non-finite; logs nothing on the happy path."""
    report = finite_state_report(tree, active)
    bad = {k: v for k, v in report.items() if v}
    if bad:
        raise FloatingPointError(
            f"non-finite values in {what}: {bad}")


def audit_donation(fn: Callable, args: Iterable, donate_argnums,
                   static_argnums=()) -> dict:
    """Compile ``fn`` with donation and report actual buffer reuse.

    XLA silently keeps a copy when a donated buffer's layout can't be
    reused (the only signal is a warning at dispatch time); this audit
    surfaces that as data: for each donated argnum, whether the input
    buffer was actually consumed (``.is_deleted()`` after execution).
    Returns {argnum: donated_bool}; also re-raises XLA's
    "donated buffers were not usable" warning as a logger warning.
    """
    args = list(args)
    jfn = jax.jit(fn, donate_argnums=tuple(donate_argnums),
                  static_argnums=tuple(static_argnums))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = jfn(*args)
        jax.block_until_ready(out)
    for w in caught:
        if "donated" in str(w.message).lower():
            logger.warning(f"donation audit: {w.message}")
    result = {}
    for i in donate_argnums:
        leaves = jax.tree_util.tree_leaves(args[i])
        result[i] = bool(leaves) and all(
            x.is_deleted() for x in leaves if isinstance(x, jax.Array))
    return result
