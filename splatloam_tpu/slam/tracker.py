"""Tracker: frame-to-rendered-model registration.

Re-implements ref slam/tracker.py:14-203.  The CUDA ``gsaligner`` submodule
(projective scan registration, contract at ref slam/tracker.py:146-188)
becomes a pure-JAX Gauss-Newton loop under lax.fori_loop:

  target  = model depth *rendered* at the last keyframe's view
            (frame-to-model, ref :170-181), back-projected to points +
            finite-difference normals, all in the keyframe sensor frame;
  source  = measured depth of the new frame, back-projected (ref :160-168);
  residual r_i = n_t . (T p_s - p_t)  via nearest-pixel projective data
            association, Huber-robustified;  update T <- exp(dx) T from the
            damped 6x6 normal equations;  fitness = inlier fraction
            (compared against keyframe_threshold_fitness, ref :69-80).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AlignerParams, Configuration, TrackingMethod
from ..geometry import se3, spherical
from ..logging_utils import get_logger
from ..model.frame import Frame
from ..model.local_model import LocalModel
from ..ops.rasterizer import RenderParams, render

logger = get_logger("tracker")


@partial(jax.jit, static_argnames=("params", "depth_min", "depth_ratio"))
def _prepare_target(xyz, scaling, rotation, opacity, T_cw, K,
                    params, depth_min: float, depth_ratio: float):
    """Render the model at the keyframe view and derive the registration
    target (points + normals + validity) in ONE device program."""
    pkg = render(xyz, scaling, rotation, opacity, T_cw, K, params,
                 depth_ratio)
    depth = pkg["surf_depth"]
    valid = (pkg["rend_alpha"] > 0.5) & (depth > depth_min)
    pts = spherical.depth_to_points(depth, K)
    normals = spherical.depth_to_normal(depth, K)
    return depth, pts, normals, valid


@jax.jit
def _prepare_source(depth, K, valid):
    pts = spherical.depth_to_points(depth, K).reshape(-1, 3)
    return pts, valid.reshape(-1)


@partial(jax.jit, static_argnames=("num_iterations", "height", "width",
                                   "corr_factor_init", "corr_decay_iters",
                                   "convergence_tol", "lambda_range"))
def gauss_newton_align(T_init,
                       src_pts, src_valid,
                       tgt_depth, tgt_pts, tgt_normals, tgt_valid,
                       K,
                       height: int, width: int,
                       num_iterations: int,
                       huber_delta: float,
                       max_corr_dist: float,
                       inlier_threshold: float,
                       damping: float,
                       corr_factor_init: float = 1.0,
                       corr_decay_iters: int = 0,
                       convergence_tol: float = 0.0,
                       lambda_range: float = 0.0):
    """Projective point-to-plane GN.  All target images [H, W, ...].

    Hardening over the plain fixed-iteration loop (gsaligner contract,
    ref slam/tracker.py:146-188): the correspondence gate starts at
    corr_factor_init * max_corr_dist and decays linearly to 1x over
    corr_decay_iters (wide basin early, tight association late), and the
    loop exits once |dx| < convergence_tol.

    ``lambda_range > 0`` adds the range-image residual
    r2 = |T p_s| - rendered_range(pixel) — the "photometric"-analog
    channel on the range image (the reference's AlignerGeomPhoto carries
    no intensity either; see config.AlignerParams.lambda_range).  Its
    Jacobian w.r.t. an se(3) perturbation is [q_hat, q x q_hat = 0]:
    the term constrains only along-ray translation, complementing
    point-to-plane on surfaces seen at grazing angles.
    """

    # flat single-index gathers (2-D advanced indexing lowers to a much
    # slower gather on TPU)
    tgt_n_flat = tgt_normals.reshape(-1, 3)
    tgt_p_flat = tgt_pts.reshape(-1, 3)
    tgt_v_flat = tgt_valid.reshape(-1)
    tgt_d_flat = tgt_depth.reshape(-1)

    def residuals(T, corr_dist):
        q = src_pts @ T[:3, :3].T + T[:3, 3]
        x, y, _ = spherical.project_points(K, q)
        u = jnp.mod(spherical.pixel_index(x), width)
        v = spherical.pixel_index(y)
        in_img = (v >= 0) & (v < height)
        flat = jnp.clip(v, 0, height - 1) * width + u
        n = tgt_n_flat[flat]
        p_t = tgt_p_flat[flat]
        r = jnp.sum(n * (q - p_t), axis=-1)
        ok = (src_valid & in_img & tgt_v_flat[flat]
              & (jnp.abs(r) <= corr_dist))
        r_rng = jnp.linalg.norm(q, axis=-1) - tgt_d_flat[flat]
        ok_rng = (src_valid & in_img & tgt_v_flat[flat]
                  & (jnp.abs(r_rng) <= corr_dist))
        return r, ok, q, n, r_rng, ok_rng

    def corr_at(i):
        if corr_decay_iters <= 0 or corr_factor_init <= 1.0:
            return jnp.float32(max_corr_dist)
        frac = jnp.minimum(i.astype(jnp.float32) / corr_decay_iters, 1.0)
        factor = corr_factor_init + (1.0 - corr_factor_init) * frac
        return max_corr_dist * factor

    def cond(state):
        i, _, dx_norm = state
        keep = i < num_iterations
        if convergence_tol > 0.0:
            keep = keep & (dx_norm > convergence_tol)
        return keep

    def body(state):
        i, T, _ = state
        r, ok, q, n, r_rng, ok_rng = residuals(T, corr_at(i))
        absr = jnp.abs(r)
        w = jnp.where(absr <= huber_delta, 1.0,
                      huber_delta / jnp.maximum(absr, 1e-12))
        w = jnp.where(ok, w, 0.0)
        J = jnp.concatenate([n, jnp.cross(q, n)], axis=-1)  # [P, 6]
        H = jnp.einsum("pi,pj->ij", J * w[:, None], J,
                       precision=jax.lax.Precision.HIGHEST)
        b = jnp.einsum("pi,p->i", J, w * r,
                       precision=jax.lax.Precision.HIGHEST)
        if lambda_range > 0.0:
            # range channel: J2 = [q_hat, 0] (rotation leaves |q| fixed)
            q_hat = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9)
            absr2 = jnp.abs(r_rng)
            w2 = jnp.where(absr2 <= huber_delta, 1.0,
                           huber_delta / jnp.maximum(absr2, 1e-12))
            w2 = jnp.where(ok_rng, lambda_range * w2, 0.0)
            J2 = jnp.concatenate([q_hat, jnp.zeros_like(q_hat)], axis=-1)
            H = H + jnp.einsum("pi,pj->ij", J2 * w2[:, None], J2,
                               precision=jax.lax.Precision.HIGHEST)
            b = b + jnp.einsum("pi,p->i", J2, w2 * r_rng,
                               precision=jax.lax.Precision.HIGHEST)
        H = H + damping * jnp.eye(6)
        dx = -jnp.linalg.solve(H, b)
        ok_solve = jnp.all(jnp.isfinite(dx)) & (jnp.sum(ok) >= 6)
        dx = jnp.where(ok_solve, dx, 0.0)
        # A failed solve must NOT read as "converged" (dx=0): report +inf
        # step norm so the loop keeps iterating and later (tighter-gate)
        # iterations can recover the alignment.
        dx_norm = jnp.where(ok_solve, jnp.linalg.norm(dx),
                            jnp.float32(jnp.inf))
        return (i + 1, se3.exp_se3(dx) @ T, dx_norm)

    _, T, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), T_init, jnp.float32(jnp.inf)))
    r, ok, _, _, _, _ = residuals(T, jnp.float32(max_corr_dist))
    n_src = jnp.maximum(jnp.sum(src_valid), 1)
    fitness = jnp.sum(ok & (jnp.abs(r) < inlier_threshold)) / n_src
    return T, fitness


class AlignerGN:
    """gsaligner-equivalent (ref slam/tracker.py:141-197)."""

    def __init__(self, cfg: Configuration):
        self.cfg = cfg
        self.reg_fitness = 1.0
        self.model: LocalModel | None = None
        ap = cfg.tracking.gsaligner or AlignerParams()
        ap.image_height = cfg.preprocessing.image_height
        ap.image_width = cfg.preprocessing.image_width
        self.ap = ap
        cc = cfg.compute
        self._render_params = None
        self._target = None
        self._source = None

    def set_model(self, model: LocalModel) -> None:
        self.model = model

    def _params_for(self, cam) -> RenderParams:
        cc = self.cfg.compute
        cap = self.model.capacity if self.model is not None else 1 << 30
        k_eff = min(int(cc.tile_list_capacity),
                    max(int(cc.chunk), (cap // 8 // cc.chunk) * cc.chunk))
        return RenderParams(height=cam.height, width=cam.width,
                            backend=cc.backend.value, chunk=cc.chunk,
                            tile_h=cc.tile_h, tile_w=cc.tile_w,
                            tile_list_capacity=k_eff,
                            with_median=self.cfg.opt.depth_ratio > 0,
                            with_dist=False)

    def set_target(self, frame: Frame) -> None:
        """Render the model at the keyframe view (ref :170-181)."""
        assert self.model is not None
        cam = frame.camera_in_model()
        surf = self.model.surfels
        depth, pts, normals, valid = _prepare_target(
            surf.params.xyz, surf.scaling, surf.rotation, surf.opacity,
            cam.T_cw, cam.K, self._params_for(cam),
            float(self.cfg.preprocessing.depth_min),
            float(self.cfg.opt.depth_ratio))
        self._target = (depth, pts, normals, valid, cam.K,
                        cam.height, cam.width)

    def set_source(self, frame: Frame) -> None:
        """Measured depth of the new frame (ref :160-168)."""
        cam = frame.camera
        pts, valid = _prepare_source(cam.depth, cam.K, cam.valid)
        self._source = (pts, valid)

    def align(self, iguess: np.ndarray) -> np.ndarray:
        assert self._target is not None and self._source is not None
        depth, pts, normals, valid, K, h, w = self._target
        src_pts, src_valid = self._source
        T, fitness = gauss_newton_align(
            jnp.asarray(iguess, jnp.float32), src_pts, src_valid,
            depth, pts, normals, valid, K, h, w,
            num_iterations=int(self.ap.num_iterations),
            huber_delta=float(self.ap.huber_delta),
            max_corr_dist=float(self.ap.max_correspondence_dist),
            inlier_threshold=float(self.ap.inlier_threshold),
            damping=float(self.ap.damping),
            corr_factor_init=float(self.ap.corr_factor_init),
            corr_decay_iters=int(self.ap.corr_decay_iters),
            convergence_tol=float(self.ap.convergence_tol),
            lambda_range=float(self.ap.lambda_range or 0.0))
        self.reg_fitness = float(fitness)
        return np.asarray(T, np.float64)

    def fitness(self) -> float:
        return self.reg_fitness


class AlignerGT:
    """Ground-truth aligner (ref slam/tracker.py:104-138)."""

    def __init__(self, cfg: Configuration):
        self.source = None
        self.target = None
        self.model = None

    def set_source(self, frame: Frame) -> None:
        self.source = frame

    def set_target(self, frame: Frame) -> None:
        self.target = frame

    def align(self, iguess: np.ndarray) -> np.ndarray:
        world_T_target = self.target.world_T_frame
        world_T_source = self.source.world_T_frame
        return np.linalg.inv(world_T_target) @ world_T_source

    def fitness(self) -> float:
        return 1.0

    def set_model(self, model: LocalModel) -> None:
        self.model = model


aligner_available = {
    TrackingMethod.gsaligner: AlignerGN,
    TrackingMethod.gt: AlignerGT,
}


class Tracker:
    """Frame-to-keyframe pose estimation (ref slam/tracker.py:14-84)."""

    def __init__(self, cfg: Configuration):
        self.cfg = cfg
        self.model: LocalModel | None = None
        self.num_frames_tracked = 0
        self.keyframe_T_frame = np.eye(4, dtype=np.float64)
        self.aligner = aligner_available[cfg.tracking.method](cfg)

    def register_model(self, model: LocalModel) -> None:
        self.model = model
        self.num_frames_tracked = 0
        self.aligner.set_model(model)

    def register_keyframe(self, keyframe: Frame) -> None:
        self.keyframe_T_frame = np.eye(4, dtype=np.float64)
        self.aligner.set_target(keyframe)
        self.num_frames_tracked = 0

    def track(self, frame: Frame) -> None:
        from ..profiling import get_profiler
        prof = get_profiler()
        with prof.phase("track.set_source"):
            self.aligner.set_source(frame)
        with prof.phase("track.align"):
            self.keyframe_T_frame = self.aligner.align(
                self.keyframe_T_frame)
        model_T_keyframe = self.model.keyframes[-1].model_T_frame
        frame.model_T_frame = model_T_keyframe @ self.keyframe_T_frame
        self.num_frames_tracked += 1
        logger.debug(f"track| model_T_frame="
                     f"{frame.model_T_frame[:3, -1]}"
                     f" fitness={self.aligner.fitness():.3f}")

    def require_new_keyframe(self) -> bool:
        """Keyframe trigger conditions (ref slam/tracker.py:61-84)."""
        tc = self.cfg.tracking
        ret = False
        if tc.keyframe_threshold_nframes and \
                tc.keyframe_threshold_nframes > 0:
            ret = ret or (self.num_frames_tracked >
                          tc.keyframe_threshold_nframes)
        if tc.keyframe_threshold_fitness and \
                tc.keyframe_threshold_fitness > 0:
            ret = ret or (self.aligner.fitness() <
                          tc.keyframe_threshold_fitness)
        if tc.keyframe_threshold_distance and \
                tc.keyframe_threshold_distance > 0:
            dist = np.linalg.norm(self.keyframe_T_frame[:3, 3])
            ret = ret or (dist > tc.keyframe_threshold_distance)
        return ret
