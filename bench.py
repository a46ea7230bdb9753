#!/usr/bin/env python3
"""Headline benchmark: rasterizer forward+backward throughput on one chip.

Workload matches the reference's hot loop (SURVEY.md §3.3 / BASELINE.md
config 2): 100k surfels rendered+differentiated through a 64x1024 spherical
range image — the mapper runs this 200-500x per keyframe.

Prints one JSON result line per stage (stdout, flushed); the LAST line is
the headline `render_fwd_bwd_rays_per_s` number.  A small fast-compiling
stage runs first so a result lands even if the full-size program hits a
cold compile cache; the full stage is skipped if the remaining wall-clock
budget (--budget, default 480 s) can't cover a worst-case remote compile.

vs_baseline: ratio against 5.0e7 rays/s, our estimate of the reference CUDA
``diff-surfel-spherical-rasterization`` fwd+bwd on a desktop GPU (~1.3 ms
per 64x1024 fwd+bwd iteration at 100k splats; the repo publishes no numbers
— see BASELINE.md).

--parity: instead of throughput, run forward+gradient parity of the Pallas
kernels against the golden jnp oracle ON HARDWARE (the interpret-mode test
suite can't see real VMEM initialization behavior) and print max-abs-diff
JSON lines, including an adversarial transmittance-early-exit scene.
"""
import argparse
import json
import os
import sys
import time

_T0 = time.perf_counter()

BASELINE_RAYS_PER_S = 5.0e7
H, W = 64, 1024
N_SURFELS = 100_000


def _elapsed():
    return time.perf_counter() - _T0


def emit(obj):
    print(json.dumps(obj), flush=True)


def make_scene(rng, n, h=H, w=W):
    import jax.numpy as jnp
    import numpy as np
    from splatloam_tpu.geometry import se3, spherical

    theta = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(-2.0, 4.0, n)
    r = rng.uniform(6.0, 50.0, n)
    xyz = np.stack([r * np.cos(theta), r * np.sin(theta), z],
                   -1).astype(np.float32)
    k = n // 3
    xyz[:k] = np.stack([rng.uniform(-40, 40, k), rng.uniform(-40, 40, k),
                        np.full(k, -1.7)], -1)
    normals = -xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
    quat = np.asarray(se3.quat_from_normal(jnp.asarray(normals)))
    scales = rng.uniform(0.05, 0.3, (n, 2)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    K, _, _ = spherical.spherical_intrinsics(jnp.asarray(xyz), h, w)
    return (jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quat),
            jnp.asarray(opac), jnp.eye(4), jnp.asarray(K))


def _build_block(args, params, rebin):
    """One jitted block: rebin once, then `rebin` fwd+bwd+SGD iterations
    (the mapper's production structure, slam/mapper.py _optimize_impl)."""
    import jax
    import jax.numpy as jnp
    from splatloam_tpu.ops.rasterizer import render
    from splatloam_tpu.ops.rasterizer.api import prepare_tiles

    h, w = params.height, params.width
    gt_depth = jnp.ones((h, w)) * 10.0
    valid = jnp.ones((h, w), bool)

    def loss(xyz, scales, quat, opac, tiles):
        pkg = render(xyz, scales, quat, opac, args[4], args[5], params,
                     tiles=tiles)
        l1 = jnp.mean(jnp.abs(pkg["surf_depth"] - gt_depth) * valid)
        an = jnp.mean(-jnp.log(jnp.clip(pkg["rend_alpha"], 1e-7, 1.0)))
        nl = jnp.mean(1.0 - jnp.sum(pkg["rend_normal"] *
                                    pkg["surf_normal"], -1))
        return l1 + 0.1 * an + 0.1 * nl

    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3))

    @jax.jit
    def block(xyz, scales, quat, opac):
        tiles = prepare_tiles(xyz, scales, quat, opac, args[4], args[5],
                              params, margin_px=1.5)

        def body(_, p):
            g = grad_fn(*p, tiles)
            # small SGD step so every iteration is distinct work (the real
            # mapper applies Adam here)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-5 * b, p, g)

        return jax.lax.fori_loop(0, rebin, body,
                                 (xyz, scales, quat, opac))

    return block


def _run_stage(name, n_surfels, iters, rebin, params, final):
    import jax
    import numpy as np

    rng = np.random.default_rng(0)
    args = make_scene(rng, n_surfels)
    block = _build_block(args, params, rebin)

    import jax.numpy as jnp

    # force a scalar D2H BEFORE timing: the axon relay dispatches
    # asynchronously until the first D2H and the transition mid-stage
    # inflates early measurements 2x (docs/PERF.md measurement gotchas;
    # observed 30 vs 13.6 ms/iter on the identical program)
    float(jnp.zeros(()) + 1.0)
    g = block(*args[:4])           # compile + warm
    jax.block_until_ready(g)
    g = block(*args[:4])           # second warm call post-D2H
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = block(*args[:4])
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0
    total_iters = iters * rebin

    rays_per_s = H * W * total_iters / dt
    line = {
        "metric": "render_fwd_bwd_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
        "extra": {
            "stage": name,
            "final": final,
            "msplats_per_s": round(n_surfels * total_iters / dt / 1e6, 2),
            "iter_ms": round(dt / total_iters * 1e3, 3),
            "surfels": n_surfels, "image": [H, W],
            "backend": params.backend,
            "device": str(jax.devices()[0]),
            "elapsed_s": round(_elapsed(), 1),
        },
    }
    emit(line)
    return rays_per_s, line


_FORCE_CPU = False  # set by --force-cpu (the re-exec fallback below)


def _probe_backend(timeout_s):
    """Ask a SUBPROCESS which backend comes up — and prove it COMPUTES.

    The axon relay has two failure modes, both hangs rather than
    exceptions: (a) inside PJRT client creation (observed 20+ min), and
    (b) a wedged state where ``jax.default_backend()`` still answers
    'tpu' while any actual dispatch blocks forever (observed round 5).
    So the probe must run a real jitted computation with a D2H and be
    killable from outside."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp, sys;"
             "x = jnp.ones((256, 256));"
             "v = float((x @ x).sum());"
             "sys.stdout.write(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
        out = (r.stdout or "").strip()
        return out if r.returncode == 0 and out else None
    except subprocess.TimeoutExpired:
        return None


def _reexec_cpu():
    """Replace this process with a --force-cpu run (clean interpreter:
    no half-initialized axon client state to fight)."""
    argv = [sys.executable, os.path.abspath(__file__), "--force-cpu"]
    for a in sys.argv[1:]:
        if a != "--force-cpu":
            argv.append(a)
    os.execv(sys.executable, argv)


def _backend_up(budget_s, share=0.75):
    """Bring the JAX backend up, retrying while the axon relay recovers.

    The relay can be down for minutes (or hours after a bad compile kills
    it), and a dead relay HANGS backend init rather than raising.  Probe
    liveness in killable subprocesses, spending up to ``share`` of the
    bench budget; only init in-process once a probe succeeds.  Past the
    deadline, re-exec with --force-cpu so the run still lands a (clearly
    labelled) number instead of rc!=0.
    """
    import jax

    if _FORCE_CPU:
        return jax.default_backend()

    deadline = max(60.0, budget_s * share)
    attempt = 0
    while True:
        left = deadline - _elapsed()
        if left <= 0:
            emit({"metric": "bench_note", "value": 0, "unit": "",
                  "note": f"backend probe failed {attempt}x over "
                          f"{_elapsed():.0f}s; re-exec with CPU fallback"})
            _reexec_cpu()
        attempt += 1
        got = _probe_backend(min(90.0, max(30.0, left)))
        if got is not None:
            if attempt > 1:
                emit({"metric": "bench_note", "value": 0, "unit": "",
                      "note": f"backend '{got}' up after {attempt} probes "
                              f"({_elapsed():.0f}s)"})
            # the relay answers: in-process init is now expected to
            # return promptly (and its failure mode is an exception we
            # can retry, not the dead-relay hang)
            try:
                return jax.default_backend()
            except Exception as e:  # noqa: BLE001 — relay flaked again
                emit({"metric": "bench_note", "value": 0, "unit": "",
                      "note": f"init failed after probe ok "
                              f"({type(e).__name__}: {e}); re-probing"})
        time.sleep(min(20.0, max(2.0, left * 0.05)))


def run_throughput(budget_s):
    import jax
    from splatloam_tpu.ops.rasterizer import RenderParams

    from splatloam_tpu.ops.rasterizer.api import adaptive_geometry

    on_tpu = _backend_up(budget_s) == "tpu"
    backend = "pallas" if on_tpu else "jnp"
    # the mapper's production configuration: median/dist channels off (not
    # in the loss), tile lists rebuilt once per REBIN-iteration block,
    # kernel geometry picked per pool size (api.adaptive_geometry — the
    # 100k-tuned 4x16/c128 geometry costs +50% at 20k and vice versa)
    # full stage: ranksum reduction (rebin-16 amortizes its plan build;
    # measured 15.38 vs rmw 17.72 ms/iter — docs/PERF.md round-5 table)
    params = RenderParams(height=H, width=W, backend=backend,
                          with_median=False, with_dist=False,
                          scatter="ranksum",
                          **adaptive_geometry(N_SURFELS))

    if not on_tpu:
        # CPU fallback: the jnp golden renderer is O(N·pixels) — run a
        # micro stage so the capture still lands, clearly non-headline.
        micro = RenderParams(height=H, width=W, backend=backend,
                             chunk=256, tile_h=8, tile_w=32,
                             tile_list_capacity=512,
                             with_median=False, with_dist=False)
        _run_stage("cpu-fallback-2k", 2_000, 2, 1, micro, final=True)
        return

    # Stage 1: small pool — one small program, lands a number fast.
    # rmw reduction + rebin 2: the mapper never runs rebin 1, and at
    # short rebin the ranksum plan's argsort cannot amortize (measured:
    # rmw 13.6 vs ranksum 19.9 ms/iter at rebin 1 — docs/PERF.md).
    small = params._replace(scatter="rmw", **adaptive_geometry(20_000))
    try:
        _run_stage("quick-20k", 20_000, 4, 2, small, final=False)
    except Exception as e:  # noqa: BLE001 — one retry for relay flakes
        emit({"metric": "bench_note", "value": 0, "unit": "",
              "note": f"quick stage failed once: {type(e).__name__}: "
                      f"{e}; retrying"})
        _run_stage("quick-20k", 20_000, 4, 2, small, final=False)

    # Stage 2: hardware parity rider BEFORE the big compile, so every
    # captured run carries a machine-readable parity line even when the
    # full stage runs out of budget (the interpret-mode test suite can't
    # see real VMEM initialization behavior).
    try:
        import numpy as np
        from splatloam_tpu.ops.rasterizer.jnp_ref import rasterize_jnp
        from splatloam_tpu.ops.rasterizer.pallas_raster import \
            rasterize_pallas
        rng = np.random.default_rng(0)
        args = make_scene(rng, 20_000)
        ref = rasterize_jnp(*args, H, W)
        out = rasterize_pallas(*args, params._replace(
            with_median=True, with_dist=True))
        diffs = {k: float(abs(np.asarray(out[k], np.float32)
                              - np.asarray(ref[k], np.float32)).max())
                 for k in ("alpha", "depth_sum", "normal_sum")}
        ok = (diffs["alpha"] <= 5e-4 and diffs["depth_sum"] <= 5e-3
              and diffs["normal_sum"] <= 5e-3)
        emit({"metric": "parity_rider_fwd_20k", "value": int(ok),
              "unit": "bool(1=pass)", "max_abs_diff": diffs})
    except Exception as e:  # noqa: BLE001 — parity is a rider
        emit({"metric": "bench_note", "value": 0, "unit": "",
              "note": f"parity rider failed: {type(e).__name__}: {e}"})

    # Stage 3: the headline 100k-surfel mapper block.  ALWAYS attempted:
    # with the persistent compilation cache pre-warmed (deploy/prewarm
    # runs this exact program at round end) the compile is seconds, and
    # four rounds of budget-gating produced zero full-scale captures —
    # an over-budget capture beats a missing one (the driver tolerates
    # >20 min total, observed r3).  Only a dead relay skips it.
    remaining = budget_s - _elapsed()
    if remaining < 0:
        emit({"metric": "bench_note", "value": 0, "unit": "",
              "note": f"over budget ({remaining:.0f}s) but attempting "
                      "full-100k anyway (warm cache expected)"})
    try:
        _, line = _run_stage("full-100k", N_SURFELS, 15, 16, params,
                             final=True)
        # the driver parses the LAST stdout line as THE result: re-emit
        # the headline so notes/riders never displace it
        emit(line)
    except Exception as e:  # noqa: BLE001 — stage 1 already landed a number
        emit({"metric": "bench_note", "value": 0, "unit": "",
              "note": f"full stage failed: {type(e).__name__}: {e}"})


def run_parity():
    """Hardware parity of Pallas vs jnp-golden (fwd + grad), incl. an
    adversarial early-exit scene (opaque near wall over many chunks)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from splatloam_tpu.geometry import se3
    from splatloam_tpu.ops.rasterizer import RenderParams
    from splatloam_tpu.ops.rasterizer.jnp_ref import rasterize_jnp
    from splatloam_tpu.ops.rasterizer.pallas_raster import rasterize_pallas

    if _backend_up(480.0) != "tpu":
        emit({"metric": "bench_note", "value": 0, "unit": "",
              "note": "parity mode needs the TPU backend; relay down"})
        return

    rng = np.random.default_rng(0)

    def report(tag, keys, ref, out, extra=None):
        diffs = {}
        ok = True
        for k, tol in keys:
            d = float(np.max(np.abs(np.asarray(out[k], np.float32)
                                    - np.asarray(ref[k], np.float32))))
            diffs[k] = d
            ok = ok and d <= tol
        emit({"metric": f"parity_{tag}", "value": int(ok),
              "unit": "bool(1=pass)", "max_abs_diff": diffs,
              "device": str(jax.devices()[0]), **(extra or {})})
        return ok

    # -- full-size forward parity at production tiles -------------------
    params = RenderParams(height=H, width=W, backend="pallas",
                          chunk=256, tile_h=8, tile_w=32,
                          tile_list_capacity=3072)
    args = make_scene(rng, 20_000)
    ref = rasterize_jnp(*args, H, W)
    out = rasterize_pallas(*args, params)
    report("forward_64x1024_20k",
           [("alpha", 5e-4), ("depth_sum", 5e-3), ("normal_sum", 5e-3)],
           ref, out)

    # -- gradient parity on an early-exit adversarial scene -------------
    h2, w2 = 16, 256
    p2 = RenderParams(height=h2, width=w2, backend="pallas", chunk=128,
                      tile_h=8, tile_w=32, tile_list_capacity=512)
    base = make_scene(rng, 500, h2, w2)
    thw = np.linspace(-np.pi, np.pi, 64, endpoint=False)
    wall = np.stack([2 * np.cos(thw), 2 * np.sin(thw),
                     np.zeros(64)], -1).astype(np.float32)
    wn = -wall / np.linalg.norm(wall, axis=-1, keepdims=True)
    wq = np.asarray(se3.quat_from_normal(jnp.asarray(wn)))
    xyz = jnp.concatenate([jnp.asarray(wall), base[0]])
    quat = jnp.concatenate([jnp.asarray(wq), base[2]])
    scales = jnp.concatenate([jnp.full((64, 2), 1.2), base[1]])
    opac = jnp.concatenate([jnp.full((64,), 0.999), base[3]])
    T, K = base[4], base[5]

    def loss(fn):
        def f(xyz, s, q, o):
            c = fn(xyz, s, q, o)
            return (jnp.sum(c["depth_sum"]) * 0.1 + jnp.sum(c["alpha"])
                    + 0.5 * jnp.sum(c["normal_sum"]))
        return f

    g_ref = jax.grad(loss(lambda *a: rasterize_jnp(*a, T, K, h2, w2)),
                     argnums=(0, 1, 2, 3))(xyz, scales, quat, opac)
    g_pal = jax.grad(loss(lambda *a: rasterize_pallas(*a, T, K, p2)),
                     argnums=(0, 1, 2, 3))(xyz, scales, quat, opac)
    names = ["xyz", "scales", "quat", "opacity"]
    ok = True
    diffs = {}
    for name, gr, gp in zip(names, g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = float(np.abs(gr).max()) + 1e-6
        d = float(np.max(np.abs(gp - gr)))
        diffs[name] = d
        ok = ok and d <= 3e-3 * scale
    emit({"metric": "parity_grad_early_exit", "value": int(ok),
          "unit": "bool(1=pass)", "max_abs_diff": diffs,
          "device": str(jax.devices()[0])})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", "480")))
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--force-cpu", action="store_true",
                    help="skip the TPU entirely (set on re-exec when the "
                         "relay stays down past the probe deadline)")
    opts = ap.parse_args()

    if opts.force_cpu:
        global _FORCE_CPU
        _FORCE_CPU = True
        import jax
        jax.config.update("jax_platforms", "cpu")

    from splatloam_tpu.cli import _enable_compilation_cache
    _enable_compilation_cache()

    if opts.parity:
        run_parity()
    else:
        run_throughput(opts.budget)


if __name__ == "__main__":
    sys.exit(main())
