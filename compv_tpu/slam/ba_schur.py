"""Bundle adjustment via explicit Schur-complement reduction.

The BASELINE north star names "distributed Schur-complement reduction of the
camera system": landmarks are eliminated analytically (their 3x3 Hessian
blocks invert in closed form) and the reduced camera system
S = Hcc - W Hll^-1 W^T is solved densely — an MXU-friendly formulation
(einsums over landmarks) that complements the matrix-free CG solver in
slam/ba.py (better for small-to-medium camera counts; CG scales further).

Shard-local assembly + psum of (Hcc, W-contractions, gradients) gives the
distributed variant: every term below is a sum over observations, so
sharding observations and psumming partial sums reproduces the exact dense
system (tested equal to the single-shard solve).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from compv_tpu.slam.ba import BAProblem, ba_residuals, project_points

__all__ = ["SchurConfig", "ba_step_schur", "ba_solve_schur"]


@dataclass(frozen=True)
class SchurConfig:
    iterations: int = 10
    damping: float = 1e-3


def _obs_jacobians(prob: BAProblem):
    """Per-observation residual Jacobians: (O, 2, 6) wrt the observing
    camera and (O, 2, 3) wrt the landmark, by forward-mode AD of the
    single-observation projection (vmapped)."""

    def one_residual(cam, lm, uv):
        def f(c, l):
            pred = project_points(c[None, :], l[None, :], prob.intrinsics,
                                  jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
            return pred[0] - uv
        jc = jax.jacfwd(f, argnums=0)(cam, lm)    # (2, 6)
        jl = jax.jacfwd(f, argnums=1)(cam, lm)    # (2, 3)
        return jc, jl

    cams = prob.cameras[prob.cam_idx]
    lms = prob.landmarks[prob.lm_idx]
    jc, jl = jax.vmap(one_residual)(cams, lms, prob.uv)
    m = prob.valid[:, None, None]
    return jnp.where(m, jc, 0.0), jnp.where(m, jl, 0.0)


def ba_step_schur(prob: BAProblem, lam: jax.Array, cfg: SchurConfig,
                  psum_axis: str | None = None):
    """One damped-GN step with explicit Schur elimination of landmarks.
    Camera 0 is gauge-fixed. Returns (new prob, new lam, cost_before)."""
    f = prob.cameras.shape[0]
    l = prob.landmarks.shape[0]
    o = prob.cam_idx.shape[0]
    dtype = prob.cameras.dtype

    r = ba_residuals(prob.cameras, prob.landmarks, prob)     # (O, 2)
    cost = jnp.sum(r * r)
    jc, jl = _obs_jacobians(prob)                            # (O,2,6),(O,2,3)

    def psum(x):
        return jax.lax.psum(x, psum_axis) if psum_axis is not None else x

    # block assemblies (all are sums over observations -> psum-able)
    hcc = jnp.zeros((f, 6, 6), dtype).at[prob.cam_idx].add(
        jnp.einsum("oij,oik->ojk", jc, jc))
    hll = jnp.zeros((l, 3, 3), dtype).at[prob.lm_idx].add(
        jnp.einsum("oij,oik->ojk", jl, jl))
    # W: (F, L, 6, 3) cross blocks — scatter per observation
    w = jnp.zeros((f, l, 6, 3), dtype).at[prob.cam_idx, prob.lm_idx].add(
        jnp.einsum("oij,oik->ojk", jc, jl))
    gc = jnp.zeros((f, 6), dtype).at[prob.cam_idx].add(
        jnp.einsum("oij,oi->oj", jc, r))
    gl = jnp.zeros((l, 3), dtype).at[prob.lm_idx].add(
        jnp.einsum("oij,oi->oj", jl, r))

    hcc, hll, w, gc, gl, cost = map(psum, (hcc, hll, w, gc, gl, cost))

    # damping (Levenberg)
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    hcc_d = hcc + lam * eye6[None]
    hll_d = hll + lam * eye3[None]
    hll_inv = jnp.linalg.inv(hll_d)                          # (L,3,3)

    # S = blockdiag(Hcc) - W Hll^-1 W^T  (dense (F,6,F,6))
    wh = jnp.einsum("flij,ljk->flik", w, hll_inv)            # (F,L,6,3)
    s_off = jnp.einsum("flik,glmk->fgim", wh, w)             # (F,F,6,6)
    s = -s_off
    s = s.at[jnp.arange(f), jnp.arange(f)].add(hcc_d)
    rhs_c = gc - jnp.einsum("flik,lk->fi", wh, gl)           # (F,6)

    # gauge: fix camera 0 by pinning its block (identity row/col, zero rhs)
    s = s.at[0, :, :, :].set(0.0).at[:, 0, :, :].set(0.0)
    s = s.at[0, 0].set(eye6)
    rhs_c = rhs_c.at[0].set(0.0)

    s_mat = s.transpose(0, 2, 1, 3).reshape(6 * f, 6 * f)
    dx_c = -jnp.linalg.solve(s_mat, rhs_c.reshape(-1)).reshape(f, 6)

    # back-substitute landmarks: dl = -Hll^-1 (gl + W^T dx_c)
    wt_dx = jnp.einsum("flij,fi->lj", w, dx_c)               # (L,3)
    dx_l = -jnp.einsum("lij,lj->li", hll_inv, gl + wt_dx)

    cams1 = prob.cameras + dx_c
    lms1 = prob.landmarks + dx_l
    r1 = ba_residuals(cams1, lms1, prob)
    cost1 = psum(jnp.sum(r1 * r1))
    better = cost1 < cost
    cams = jnp.where(better, cams1, prob.cameras)
    lms = jnp.where(better, lms1, prob.landmarks)
    lam_new = jnp.where(better, lam * 0.5, lam * 4.0)
    return prob._replace(cameras=cams, landmarks=lms), lam_new, cost


@partial(jax.jit, static_argnames=("cfg",))
def ba_solve_schur(prob: BAProblem, cfg: SchurConfig = SchurConfig()):
    """Damped-GN loop with Schur steps. Returns (problem, final cost)."""
    def body(_, state):
        p, lam, _ = state
        return ba_step_schur(p, lam, cfg)

    init = (prob, jnp.asarray(cfg.damping, prob.cameras.dtype),
            jnp.asarray(0.0, prob.cameras.dtype))
    p, lam, cost = jax.lax.fori_loop(0, cfg.iterations, body, init)
    r = ba_residuals(p.cameras, p.landmarks, p)
    return p, jnp.sum(r * r)
