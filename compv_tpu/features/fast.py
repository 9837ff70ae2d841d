"""FAST-9/12 corner detector, TPU-native.

Reference behavior (core/features/fast/compv_core_feature_fast_dete.cxx):
  * per pixel p with threshold t: brighter = sat(p+t), darker = sat(p-t);
    for each of the 16 Bresenham-circle (r=3) neighbors c_i compute
    d_i = max(darker - c_i, 0), b_i = max(c_i - brighter, 0)
    (fast_dete.cxx:727-767);
  * corner iff some arc of N consecutive circle pixels (mod 16) is all
    nonzero on one side; strength = max over valid arcs of (min diff over the
    arc) (the `_cpp_fast_strenght` macro, fast_dete.cxx:688-711);
  * 3x3 NMS: suppress p if any 8-neighbor strength >= strength(p)
    (CompVFastNmsGather_C, fast_dete.cxx:773-816), applied only in the
    interior [3, dim-3);
  * top-K by strength (selectBest, compv_common.h:641-656).

TPU design: the scalar early-out pipeline becomes a dense vectorized
computation over the whole image — 16 shifted views (static slices, no
gather), running circular-window minima via a log-depth tree of rolls, NMS
as 8 shifted maxes, top-K via lax.top_k. Everything fuses into a handful of
VPU passes; a Pallas tiled variant lives in ops/pallas/fast_kernel.py.

Circle offset order matches the reference (fast_dete.cxx:221-238):
index 0 at (dy=-3,dx=0) going clockwise.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from compv_tpu.core.types import Keypoints

__all__ = ["FastConfig", "fast_strengths", "fast_nms", "fast_detect",
           "CIRCLE_OFFSETS"]

# (dy, dx) for the 16 circle pixels, reference order (fast_dete.cxx:221-238)
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


@dataclass(frozen=True)
class FastConfig:
    """Typed config replacing CompVCaps ids COMPV_FAST_SET_INT_* —
    defaults per fast_dete.cxx:76-81."""
    threshold: int = 20
    n: int = 9                 # FAST-9 or FAST-12 (arc length)
    nms: bool = True
    max_features: int = 2000   # static output capacity; -1 in the reference
                               # means "all" — here capacity must be static


def _shifted_circle_views(padded: jax.Array, h: int, w: int) -> jax.Array:
    """(16, h, w) circle-neighbor values via static slices of a 3-padded
    image; slicing (not gather) keeps this on the fast vector path."""
    views = [
        jax.lax.dynamic_slice(padded, (3 + dy, 3 + dx), (h, w))
        for (dy, dx) in CIRCLE_OFFSETS
    ]
    return jnp.stack(views)


def fast_strengths(img: jax.Array, threshold: int = 20, n: int = 9) -> jax.Array:
    """Dense strengths map (H, W) u8. Zero outside the 3-px border, exactly
    like the reference's calloc'd map with +3 borders (fast_dete.cxx:200-215)."""
    h, w = img.shape
    f = img.astype(jnp.int32)
    padded = jnp.pad(f, 3)  # zero-pad; border region is masked off below

    p = f  # center pixel
    brighter = jnp.minimum(p + threshold, 255)
    darker = jnp.maximum(p - threshold, 0)

    c = _shifted_circle_views(padded, h, w)          # (16, H, W) i32
    d = jnp.maximum(darker[None] - c, 0)             # darker diffs
    b = jnp.maximum(c - brighter[None], 0)           # brighter diffs

    def arc_strength(diffs: jax.Array) -> jax.Array:
        """max over the 16 arc starts of (min over n consecutive diffs),
        computed as a log-depth running min over the circular axis."""
        m = diffs
        span = 1
        # running minimum over window n along axis 0 (circular)
        while span * 2 <= n:
            m = jnp.minimum(m, jnp.roll(m, -span, axis=0))
            span *= 2
        if span < n:
            m = jnp.minimum(m, jnp.roll(m, -(n - span), axis=0))
        return jnp.max(m, axis=0)

    strength = jnp.maximum(arc_strength(d), arc_strength(b))

    # zero the 3-px border (reference computes rows/cols in [3, dim-3))
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(interior, strength, 0).astype(jnp.uint8)


def fast_nms(strengths: jax.Array) -> jax.Array:
    """3x3 non-maxima suppression, reference semantics: suppress the center
    if ANY 8-neighbor has strength >= center (ties suppress both sides,
    CompVFastNmsGather_C fast_dete.cxx:773-816). Applied in [3, dim-3)."""
    h, w = strengths.shape
    s = strengths.astype(jnp.int32)
    padded = jnp.pad(s, 1)
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh.append(jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w)))
    nmax = jnp.stack(neigh).max(axis=0)
    keep = (s > 0) & (nmax < s)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(keep & interior, s, 0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("config",))
def fast_detect(img: jax.Array, config: FastConfig = FastConfig()) -> Keypoints:
    """Full detector: strengths -> optional NMS -> top-K Keypoints.

    Matches CompVCornerDeteFAST::process (fast_dete.cxx:162-330). Output is a
    fixed-capacity Keypoints (capacity = max_features) sorted by decreasing
    strength."""
    h, w = img.shape
    s = fast_strengths(img, config.threshold, config.n)
    if config.nms:
        s = fast_nms(s)
    flat = s.astype(jnp.float32).ravel()
    k = min(config.max_features, flat.shape[0])
    vals, idx = jax.lax.top_k(flat, k)
    valid = vals > 0
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    return Keypoints(
        x=jnp.where(valid, x, 0.0),
        y=jnp.where(valid, y, 0.0),
        strength=jnp.where(valid, vals, 0.0),
        orientation=jnp.zeros_like(vals),
        level=jnp.zeros_like(idx, jnp.int32),
        size=jnp.full_like(vals, 7.0),
        valid=valid,
    )
