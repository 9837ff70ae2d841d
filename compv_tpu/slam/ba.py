"""Bundle adjustment, TPU-native.

The reference has no BA — its closest machinery is Levenberg-Marquardt over
calibration params via vendored lmfit (core/calib/compv_core_calib_camera.cxx:1028)
and per-thread RANSAC reductions. BASELINE.json's north star requires a
distributed BA: keyframes/observations sharded per chip, shard-local
residual/Jacobian products, psum'd reduction of the camera system.

Design (idiomatic JAX, scaling-book style):
  * state  : cameras (F, 6) [rodrigues rvec | tvec], landmarks (L, 3),
             shared intrinsics (fx, fy, cx, cy).
  * obs    : fixed-capacity padded arrays cam_idx (O,), lm_idx (O,),
             uv (O, 2), valid (O,).
  * solver : damped Gauss-Newton; the normal system (J^T J + lam I) dx = -J^T r
             is solved matrix-free with CG, where J v and J^T u are jvp/vjp
             of the residual function — no explicit Jacobian, no sparse
             bookkeeping; XLA fuses each matvec into a few dense passes.
  * distributed: observations are sharded over the mesh "frame" axis inside
    shard_map; every J^T (.) / J (.) product psums partial results so each
    device holds the full (replicated) parameter update — the classic
    data-parallel gradient pattern applied to GN. Deterministic: psum order
    fixed by the mesh.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["BAProblem", "BAConfig", "rodrigues_to_matrix", "matrix_to_rodrigues",
           "project_points", "ba_residuals", "ba_solve", "ba_step",
           "ba_step_reduce_scatter", "reproj_rmse"]


# ----------------------------------------------------------------- rotations

def rodrigues_to_matrix(rvec: jax.Array) -> jax.Array:
    """Axis-angle (3,) -> rotation matrix (3,3). Reference:
    CompVMathTrig::rodriguesVectorToMatrix (compv_math_trig.h:22-35).

    Gradient-safe at theta=0 via the double-where pattern: both branch
    inputs are made finite BEFORE the select, so reverse-mode AD never sees
    an inf/NaN from the untaken branch (the classic jnp.where-grad trap)."""
    theta2 = jnp.sum(rvec * rvec)
    small = theta2 < 1e-12
    theta2_safe = jnp.where(small, 1.0, theta2)   # safe for sqrt/grad
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    wx, wy, wz = rvec[0], rvec[1], rvec[2]
    km = jnp.array([[0.0, -wz, wy], [wz, 0.0, -wx], [-wy, wx, 0.0]],
                   rvec.dtype)
    return jnp.eye(3, dtype=rvec.dtype) + a * km + b * (km @ km)


def matrix_to_rodrigues(r: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle (reference rodriguesMatrixToVector).

    Three branches, all select-safe: small angle (series), general
    (w * theta / 2 sin theta), and near-pi — where w = vee(R - R^T) ~ 0 and
    the general formula degenerates to 0 * inf; there the axis is recovered
    from the diagonal of (R + I)/2 with signs from the dominant row."""
    tr = jnp.trace(r)
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7))
    w = jnp.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]],
                  r.dtype)
    small = theta < 1e-4
    near_pi = cos_t < -0.999
    theta_safe = jnp.where(small | near_pi, 1.0, theta)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0,
                      theta_safe / (2.0 * jnp.sin(theta_safe)))
    rvec_general = w * scale

    # near-pi: axis magnitudes from diag((R+I)/2), signs from dominant row
    b = (r + jnp.eye(3, dtype=r.dtype)) * 0.5
    axis = jnp.sqrt(jnp.clip(jnp.diagonal(b), 0.0, 1.0))
    k = jnp.argmax(axis)
    row = b[k, :]
    signs = jnp.where(jnp.arange(3) == k, 1.0,
                      jnp.where(row >= 0, 1.0, -1.0))
    axis_n = axis * signs
    axis_n = axis_n / jnp.maximum(jnp.linalg.norm(axis_n), 1e-12)
    theta_pi = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))  # exact up to pi
    rvec_pi = axis_n * theta_pi

    return jnp.where(near_pi, rvec_pi, rvec_general)


# ----------------------------------------------------------------- projection

class BAProblem(NamedTuple):
    cameras: jax.Array     # (F, 6) [rvec | tvec]
    landmarks: jax.Array   # (L, 3)
    intrinsics: jax.Array  # (4,) fx, fy, cx, cy
    cam_idx: jax.Array     # (O,) i32
    lm_idx: jax.Array      # (O,) i32
    uv: jax.Array          # (O, 2) observed pixels
    valid: jax.Array       # (O,) bool


@dataclass(frozen=True)
class BAConfig:
    iterations: int = 10        # outer damped-GN iterations
    cg_iterations: int = 20     # inner CG iterations per GN step
    damping: float = 1e-3       # initial LM lambda
    optimize_landmarks: bool = True
    optimize_cameras: bool = True
    robust_delta: float = 0.0   # >0: IRLS Cauchy-like down-weighting of
                                # observations with residual norm >> delta px
                                # (weights frozen per GN step, re-derived
                                # from the step's entry residual)


def project_points(cameras: jax.Array, landmarks: jax.Array,
                   intrinsics: jax.Array, cam_idx: jax.Array,
                   lm_idx: jax.Array) -> jax.Array:
    """(O, 2) projected pixels for each observation. Batched pinhole:
    u = fx * x/z + cx (no distortion here; calib/utils handles distortion)."""
    rvecs = cameras[cam_idx, :3]           # (O, 3)
    tvecs = cameras[cam_idx, 3:]           # (O, 3)
    pts = landmarks[lm_idx]                # (O, 3)
    rms = jax.vmap(rodrigues_to_matrix)(rvecs)       # (O, 3, 3)
    pc = jnp.einsum("oij,oj->oi", rms, pts) + tvecs  # (O, 3)
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    u = fx * pc[:, 0] / z + cx
    v = fy * pc[:, 1] / z + cy
    return jnp.stack([u, v], axis=1)


def ba_residuals(cameras: jax.Array, landmarks: jax.Array, prob: BAProblem
                 ) -> jax.Array:
    """(O, 2) masked reprojection residuals. First camera is gauge-fixed by
    the solver (its update is zeroed), not here."""
    pred = project_points(cameras, landmarks, prob.intrinsics,
                          prob.cam_idx, prob.lm_idx)
    r = pred - prob.uv
    return jnp.where(prob.valid[:, None], r, 0.0)


def reproj_rmse(prob: BAProblem) -> jax.Array:
    r = ba_residuals(prob.cameras, prob.landmarks, prob)
    n = jnp.maximum(jnp.sum(prob.valid), 1)
    return jnp.sqrt(jnp.sum(r * r) / (2.0 * n))


# ----------------------------------------------------------------- solver

def _flatten(cams, lms):
    return jnp.concatenate([cams.ravel(), lms.ravel()])


def _unflatten(x, f, l):
    return x[: f * 6].reshape(f, 6), x[f * 6:].reshape(l, 3)


def _gauge_mask(f: int, l: int, cfg: BAConfig, dtype) -> jax.Array:
    """Parameter-space mask: gauge-fix camera 0 (and optionally freeze
    cameras or landmarks entirely)."""
    cam_m = jnp.ones((f, 6), dtype)
    cam_m = cam_m.at[0].set(0.0)  # fix the first camera (gauge freedom)
    if not cfg.optimize_cameras:
        cam_m = jnp.zeros((f, 6), dtype)
    lm_m = (jnp.ones if cfg.optimize_landmarks else jnp.zeros)((l, 3), dtype)
    return _flatten(cam_m, lm_m)


def _robustify(res_raw, x0, cfg: BAConfig, dtype):
    """IRLS wrapper: when cfg.robust_delta > 0 the residual function is
    whitened by Cauchy-like weights w = delta / sqrt(delta^2 + |r|^2)
    derived from the residuals at the step's entry point x0 and FROZEN
    (stop_gradient) for the step — the standard IRLS linearization, so
    jvp/vjp see constant weights."""
    if cfg.robust_delta <= 0:
        return res_raw
    r_entry = jax.lax.stop_gradient(res_raw(x0))
    r2 = jnp.sum(r_entry.reshape(-1, 2) ** 2, axis=1)
    d2 = jnp.asarray(cfg.robust_delta, dtype) ** 2
    w = jnp.repeat(jnp.sqrt(d2 / (d2 + r2)), 2)
    return lambda x: res_raw(x) * w


def _cg(matvec, b, iters: int):
    """Plain conjugate gradient, fixed iteration count (static for XLA)."""
    x0 = jnp.zeros_like(b)
    r0 = b
    p0 = r0
    rs0 = jnp.dot(r0, r0)

    def body(_, state):
        x, r, p, rs = state
        ap = matvec(p)
        alpha = rs / jnp.maximum(jnp.dot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.dot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, p0, rs0))
    return x


def ba_step(prob: BAProblem, lam: jax.Array, cfg: BAConfig,
            psum_axis: str | None = None):
    """One damped-GN step. Returns (new BAProblem, new lambda, cost_before).

    When ``psum_axis`` is given the function is being traced inside shard_map
    with observations sharded along that axis: every J/Jt product and the
    cost are psum'd so all shards apply the identical (replicated) update —
    the shard-local-residual + psum'd-camera-system pattern."""
    f = prob.cameras.shape[0]
    l = prob.landmarks.shape[0]
    dtype = prob.cameras.dtype
    mask = _gauge_mask(f, l, cfg, dtype)

    def res_raw(x):
        cams, lms = _unflatten(x, f, l)
        return ba_residuals(cams, lms, prob).ravel()

    x0 = _flatten(prob.cameras, prob.landmarks)
    res_flat = _robustify(res_raw, x0, cfg, dtype)
    r0 = res_flat(x0)
    cost = jnp.sum(r0 * r0)
    if psum_axis is not None:
        cost = jax.lax.psum(cost, psum_axis)

    _, vjp_fn = jax.vjp(res_flat, x0)

    def jtj_mv(v):
        vm = v * mask
        jv = jax.jvp(res_flat, (x0,), (vm,))[1]
        jtjv = vjp_fn(jv)[0] * mask
        if psum_axis is not None:
            jtjv = jax.lax.psum(jtjv, psum_axis)
        return jtjv + lam * vm

    g = vjp_fn(r0)[0] * mask
    if psum_axis is not None:
        g = jax.lax.psum(g, psum_axis)

    dx = _cg(jtj_mv, -g, cfg.cg_iterations)
    x1 = x0 + dx * mask
    r1 = res_flat(x1)
    cost1 = jnp.sum(r1 * r1)
    if psum_axis is not None:
        cost1 = jax.lax.psum(cost1, psum_axis)

    improved = cost1 < cost
    x_new = jnp.where(improved, x1, x0)
    lam_new = jnp.where(improved, lam * 0.5, lam * 4.0)
    cams, lms = _unflatten(x_new, f, l)
    new_prob = prob._replace(cameras=cams, landmarks=lms)
    return new_prob, lam_new, cost


def ba_step_reduce_scatter(prob: BAProblem, lam: jax.Array, cfg: BAConfig,
                           axis: str):
    """One damped-GN step with the CG state SHARDED over ``axis`` — the
    reduce_scatter variant of ba_step(psum_axis=...) (scaling-book pattern:
    all_gather(v) before J v, psum_scatter(Jt u) after). Each device holds
    1/D of the parameter vector during CG, so the live parameter memory per
    chip shrinks by the mesh size; the psum of ba_step is decomposed into
    its reduce_scatter + all_gather halves around the matvec. Must be traced
    inside shard_map with observations sharded along ``axis``. Bit-parity
    with ba_step is NOT exact (different reduction orders); tests bound the
    divergence."""
    f = prob.cameras.shape[0]
    l = prob.landmarks.shape[0]
    dtype = prob.cameras.dtype
    mask = _gauge_mask(f, l, cfg, dtype)
    n = f * 6 + l * 3
    d = jax.lax.axis_size(axis)
    pad = -n % d
    chunk = (n + pad) // d
    my = jax.lax.axis_index(axis)

    def res_raw(x):
        cams, lms = _unflatten(x, f, l)
        return ba_residuals(cams, lms, prob).ravel()

    def pad_v(v):
        return jnp.concatenate([v, jnp.zeros(pad, dtype)]) if pad else v

    def shard_of(v_full):
        return jax.lax.dynamic_slice(pad_v(v_full), (my * chunk,), (chunk,))

    x0 = _flatten(prob.cameras, prob.landmarks)
    res_flat = _robustify(res_raw, x0, cfg, dtype)
    r0 = res_flat(x0)
    cost = jax.lax.psum(jnp.sum(r0 * r0), axis)
    _, vjp_fn = jax.vjp(res_flat, x0)

    def gather_full(v_shard):
        """Shard -> full replicated vector, INVARIANT over the axis: psum of
        the shard placed at its offset (same collective volume as
        all_gather, but the result is replicated-typed so downstream gather
        indexing and the out_specs stay invariant under shard_map's vma
        checks)."""
        placed = jax.lax.dynamic_update_slice(
            jnp.zeros(n + pad, dtype), v_shard, (my * chunk,))
        return jax.lax.psum(placed, axis)[:n]

    def jtj_mv_shard(v_shard):
        v_full = gather_full(v_shard)
        vm = v_full * mask
        jv = jax.jvp(res_flat, (x0,), (vm,))[1]
        jtjv_local = vjp_fn(jv)[0] * mask           # partial (local obs)
        jtjv_shard = jax.lax.psum_scatter(pad_v(jtjv_local), axis, tiled=True)
        return jtjv_shard + lam * shard_of(vm)

    g_shard = jax.lax.psum_scatter(pad_v(vjp_fn(r0)[0] * mask), axis,
                                   tiled=True)
    b = -g_shard

    def pdot(a, c):
        return jax.lax.psum(jnp.dot(a, c), axis)

    def body_fixed(_, state):
        x, r, p, rs = state
        ap = jtj_mv_shard(p)
        alpha = rs / jnp.maximum(pdot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = pdot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return x, r, p, rs_new

    x_sh, _, _, _ = jax.lax.fori_loop(
        0, cfg.cg_iterations, body_fixed,
        (jnp.zeros_like(b), b, b, pdot(b, b)))

    dx = gather_full(x_sh)
    x1 = x0 + dx * mask
    r1 = res_flat(x1)
    cost1 = jax.lax.psum(jnp.sum(r1 * r1), axis)
    improved = cost1 < cost
    x_new = jnp.where(improved, x1, x0)
    lam_new = jnp.where(improved, lam * 0.5, lam * 4.0)
    cams, lms = _unflatten(x_new, f, l)
    return prob._replace(cameras=cams, landmarks=lms), lam_new, cost


@partial(jax.jit, static_argnames=("cfg",))
def ba_solve(prob: BAProblem, cfg: BAConfig = BAConfig()):
    """Full damped-GN loop (single shard). Returns (problem, final_cost)."""
    def body(_, state):
        p, lam, _ = state
        return ba_step(p, lam, cfg)

    init = (prob, jnp.asarray(cfg.damping, prob.cameras.dtype),
            jnp.asarray(0.0, prob.cameras.dtype))
    p, lam, cost = jax.lax.fori_loop(0, cfg.iterations, body, init)
    r = ba_residuals(p.cameras, p.landmarks, p)
    return p, jnp.sum(r * r)
