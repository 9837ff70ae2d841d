"""Multi-chip sharded pipelines: detect / match / distributed BA.

The reference is single-node (SURVEY.md §2.6); this layer is the new part.
Patterns (scaling-book style):
  * frames sharded over the mesh "frame" axis, shard_map'd per-frame ORB
    (data parallelism — replaces the thread pool's frame-level task split);
  * cross-shard all-pairs matching via all_gather of descriptor blocks
    (ring/ppermute variant available for very large sets);
  * distributed BA: observations sharded, shard-local residual/J products,
    psum'd camera system (slam/ba.py with psum_axis).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from compv_tpu.features.fast import FastConfig, _nms_f32, _strengths_f32
from compv_tpu.features.orb import brief_describe, patch_orientation
from compv_tpu.matchers.bruteforce import hamming_distance_matrix
from compv_tpu.ops.conv import gaussian_blur
from compv_tpu.slam.ba import BAConfig, BAProblem, ba_step

__all__ = ["sharded_detect", "sharded_all_pairs_match", "distributed_ba_solve",
           "make_distributed_ba_step"]


def _detect_one(img, threshold: int, k: int):
    """Single-frame FAST detect + orientation + BRIEF, fixed capacity k."""
    h, w = img.shape
    s = _nms_f32(_strengths_f32(img, threshold, 9))
    vals, idx = jax.lax.top_k(s.astype(jnp.float32).ravel(), k)
    valid = vals > 0
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    orient = patch_orientation(img, x, y, valid)
    blurred = gaussian_blur(img, 5, 2.0)
    desc = brief_describe(blurred, x, y, orient, valid)
    return x, y, vals, valid, desc


def sharded_detect(images: jax.Array, mesh: Mesh, threshold: int = 20,
                   max_features: int = 256):
    """(F, H, W) u8 frames sharded over "frame" -> per-frame keypoints +
    descriptors, outputs sharded the same way."""
    detect = partial(_detect_one, threshold=threshold, k=max_features)

    @partial(shard_map, mesh=mesh, in_specs=P("frame"),
             out_specs=(P("frame"),) * 5)
    def run(imgs):
        return jax.vmap(detect)(imgs)

    return run(images)


def sharded_all_pairs_match(desc: jax.Array, valid: jax.Array, mesh: Mesh):
    """All-pairs min-Hamming distances between frames.

    desc (F, K, B) sharded over "frame"; returns (F, F) mean-of-min
    descriptor distance (a cheap frame-similarity matrix for keyframe
    selection). Local shard matches against the all_gathered set — the
    descriptor exchange the reference never needed (SURVEY.md §5
    'Distributed communication backend')."""

    @partial(shard_map, mesh=mesh, in_specs=(P("frame"), P("frame")),
             out_specs=P("frame"))
    def run(local_desc, local_valid):
        all_desc = jax.lax.all_gather(local_desc, "frame", tiled=True)
        all_valid = jax.lax.all_gather(local_valid, "frame", tiled=True)
        fl, k, b = local_desc.shape
        ft = all_desc.shape[0]

        def one_pair(d1, v1, d2, v2):
            dist = hamming_distance_matrix(d1, d2)          # (K, K)
            big = jnp.int32(1 << 30)
            dist = jnp.where(v2[None, :], dist, big)
            mins = jnp.min(dist, axis=1)
            mins = jnp.where(v1 & (mins < big), mins, 0)
            cnt = jnp.maximum(jnp.sum(v1 & (jnp.min(dist, axis=1) < big)), 1)
            return jnp.sum(mins).astype(jnp.float32) / cnt.astype(jnp.float32)

        def one_local(d1, v1):
            return jax.vmap(lambda d2, v2: one_pair(d1, v1, d2, v2))(
                all_desc, all_valid)

        return jax.vmap(one_local)(local_desc, local_valid)  # (fl, ft)

    return run(desc, valid)


def make_distributed_ba_step(mesh: Mesh, cfg: BAConfig = BAConfig()):
    """Returns a jitted distributed BA step: parameters replicated,
    observations sharded over "frame"; one damped-GN step with psum'd
    camera-system products."""
    param_spec = BAProblem(
        cameras=P(), landmarks=P(), intrinsics=P(),
        cam_idx=P("frame"), lm_idx=P("frame"), uv=P("frame"),
        valid=P("frame"))

    @partial(shard_map, mesh=mesh,
             in_specs=(param_spec, P()),
             out_specs=(param_spec, P(), P()))
    def step(prob, lam):
        return ba_step(prob, lam, cfg, psum_axis="frame")

    return jax.jit(step)


def make_distributed_schur_step(mesh: Mesh, cfg=None):
    """Distributed Schur-complement BA step: per-shard block assembly
    (Hcc/Hll/W/gradients are sums over local observations), psum'd into the
    exact dense reduced camera system on every shard (slam/ba_schur.py)."""
    from compv_tpu.slam.ba_schur import SchurConfig, ba_step_schur
    cfg = cfg or SchurConfig()
    param_spec = BAProblem(
        cameras=P(), landmarks=P(), intrinsics=P(),
        cam_idx=P("frame"), lm_idx=P("frame"), uv=P("frame"),
        valid=P("frame"))

    @partial(shard_map, mesh=mesh,
             in_specs=(param_spec, P()),
             out_specs=(param_spec, P(), P()))
    def step(prob, lam):
        return ba_step_schur(prob, lam, cfg, psum_axis="frame")

    return jax.jit(step)


def distributed_ba_solve(prob: BAProblem, mesh: Mesh,
                         cfg: BAConfig = BAConfig()):
    """Outer Python loop over jitted distributed GN steps (keeps per-step
    compile small; the loop count is tiny)."""
    step = make_distributed_ba_step(mesh, cfg)
    lam = jnp.asarray(cfg.damping, prob.cameras.dtype)
    cost = jnp.asarray(0.0, prob.cameras.dtype)
    for _ in range(cfg.iterations):
        prob, lam, cost = step(prob, lam)
    return prob, cost
