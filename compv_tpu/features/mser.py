"""MSER — maximally stable extremal regions, TPU-native reformulation.

Reference: LMSER (core/ccl/compv_core_ccl_lmser.cxx:148 — Nistér-Stewénius
linear-time flood-fill component tree with boundary heaps, then stability
filtering by Delta / min-max area / max variation / min diversity).

The flood-fill component tree is intrinsically sequential (SURVEY.md §7
'hard parts'). TPU redesign: the *threshold-decomposition* formulation of
extremal regions — for a ladder of L gray levels, the level sets
{I <= t} (dark regions) are labeled with the dense CCL pass; a region's
evolution across levels is tracked through its seed pixel (min flat index,
stable under growth by construction), and stability is the reference's
q(t) = (area(t+delta) - area(t-delta)) / area(t). This computes the same
extremal-region family sampled at `level_step` gray levels — a bounded
quantization of the exact tree (acceptance tests tolerate the divergence,
as planned in SURVEY.md §7).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from compv_tpu.features.ccl import label_components

__all__ = ["MserConfig", "MserResult", "mser_detect"]


@dataclass(frozen=True)
class MserConfig:
    """Parameter names follow the reference's LMSER caps ids
    (COMPV_CCL_SET_INT_MSER_DELTA etc., base/include/compv/base/compv_ccl.h)."""
    delta: int = 2               # stability comparison step, in LEVELS
    min_area: float = 0.0025     # fraction of image area
    max_area: float = 0.75
    max_variation: float = 0.5
    dark: bool = True            # detect dark-on-bright (I <= t); set False
                                 # for bright regions (inverts the image)
    level_step: int = 8          # gray-level quantization of the ladder
    max_regions: int = 128       # fixed output capacity


class MserResult(NamedTuple):
    # per region, fixed capacity R:
    seed_x: jax.Array      # (R,) i32 seed pixel (component min-index)
    seed_y: jax.Array
    level: jax.Array       # (R,) i32 gray threshold at which it is stable
    area: jax.Array        # (R,) i32
    variation: jax.Array   # (R,) f32 stability score (lower = more stable)
    box_x0: jax.Array      # (R,) i32
    box_y0: jax.Array
    box_x1: jax.Array
    box_y1: jax.Array
    valid: jax.Array       # (R,) bool

    def count(self):
        return jnp.sum(self.valid)


@partial(jax.jit, static_argnames=("config", "shape"))
def _mser_impl(img: jax.Array, config: MserConfig, shape) -> MserResult:
    h, w = shape
    n = h * w
    f = img if config.dark else (255 - img.astype(jnp.int32)).astype(jnp.uint8)
    levels = list(range(config.level_step, 256, config.level_step))
    nl = len(levels)

    # Per level: label {I <= t}; per component (identified by its root =
    # min flat index): area + bbox. Rather than materializing per-level
    # maps, we track, for every PIXEL, the area of its component at each
    # level (area_of_root gathered back) — stability is then evaluated at
    # seed pixels only.
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).ravel()
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).ravel()

    def level_stats(t):
        binary = (f.astype(jnp.int32) <= t).astype(jnp.uint8)
        lbl = label_components(binary, 8, 64).ravel()     # root or -1
        fgm = lbl >= 0
        root = jnp.where(fgm, lbl, 0)
        ones = fgm.astype(jnp.int32)
        area_by_root = jnp.zeros(n, jnp.int32).at[root].add(ones)
        big = jnp.int32(1 << 30)
        x0 = jnp.full(n, big, jnp.int32).at[root].min(jnp.where(fgm, xs, big))
        y0 = jnp.full(n, big, jnp.int32).at[root].min(jnp.where(fgm, ys, big))
        x1 = jnp.full(n, -1, jnp.int32).at[root].max(jnp.where(fgm, xs, -1))
        y1 = jnp.full(n, -1, jnp.int32).at[root].max(jnp.where(fgm, ys, -1))
        return lbl, area_by_root, x0, y0, x1, y1

    stats = [level_stats(t) for t in levels]
    # roots_l: (L, N) component root per pixel per level (-1 bg)
    roots = jnp.stack([s[0] for s in stats])
    areas = jnp.stack([s[1] for s in stats])      # (L, N) area by root index

    # candidate regions: components at each inner level i (1..L-2);
    # stability uses the component CONTAINING the seed at i +- delta
    d = max(config.delta // max(config.level_step // config.level_step, 1), 1)
    cand = []
    for i in range(nl):
        lo = max(i - 1, 0)
        hi = min(i + 1, nl - 1)
        root_i = roots[i]                         # (N,)
        is_root = (root_i == jnp.arange(n)) & (root_i >= 0)
        area_i = areas[i]                         # area at own root
        # containing component at neighbor levels: gather through the pixel
        root_hi = roots[hi]
        area_hi = areas[hi][jnp.where(root_hi >= 0, root_hi, 0)]
        root_lo = roots[lo]
        area_lo = areas[lo][jnp.where(root_lo >= 0, root_lo, 0)]
        var = (area_hi - area_lo).astype(jnp.float32) / jnp.maximum(
            area_i.astype(jnp.float32), 1.0)
        score = jnp.where(is_root, var, jnp.inf)
        cand.append((i, score, area_i))

    # flatten all (level, pixel) candidates, filter by area and variation,
    # take the max_regions most stable
    score_all = jnp.stack([c[1] for c in cand])   # (L, N)
    area_all = jnp.stack([c[2] for c in cand])
    amin = int(config.min_area * n)
    amax = int(config.max_area * n)
    ok = ((area_all >= amin) & (area_all <= amax)
          & (score_all <= config.max_variation))
    score_m = jnp.where(ok, score_all, jnp.inf)

    flat_sc = score_m.ravel()
    vals, idx = jax.lax.top_k(-flat_sc, config.max_regions)
    valid = jnp.isfinite(-vals)
    lvl_i = (idx // n).astype(jnp.int32)
    pix = (idx % n).astype(jnp.int32)

    # min-diversity-style dedup: regions sharing the same seed pixel across
    # adjacent levels collapse to the most stable one (the seed IS the
    # component identity here)
    seen_seed = jnp.zeros(n, jnp.int32)
    # scatter: first (most stable due to top_k ordering) wins
    order_rank = jnp.arange(config.max_regions, dtype=jnp.int32)
    best_rank = jnp.full(n, config.max_regions, jnp.int32).at[pix].min(
        jnp.where(valid, order_rank, config.max_regions))
    keep = valid & (best_rank[pix] == order_rank)

    level_arr = jnp.asarray(levels, jnp.int32)
    x0s = jnp.stack([s[2] for s in stats])
    y0s = jnp.stack([s[3] for s in stats])
    x1s = jnp.stack([s[4] for s in stats])
    y1s = jnp.stack([s[5] for s in stats])

    return MserResult(
        seed_x=jnp.where(keep, pix % w, 0),
        seed_y=jnp.where(keep, pix // w, 0),
        level=jnp.where(keep, level_arr[lvl_i], 0),
        area=jnp.where(keep, area_all[lvl_i, pix], 0),
        variation=jnp.where(keep, -vals, jnp.inf),
        box_x0=jnp.where(keep, x0s[lvl_i, pix], 0),
        box_y0=jnp.where(keep, y0s[lvl_i, pix], 0),
        box_x1=jnp.where(keep, x1s[lvl_i, pix], 0),
        box_y1=jnp.where(keep, y1s[lvl_i, pix], 0),
        valid=keep,
    )


def mser_detect(img: jax.Array, config: MserConfig = MserConfig()
                ) -> MserResult:
    """Detect MSERs on a (H, W) u8 grayscale image."""
    return _mser_impl(img, config, img.shape)
