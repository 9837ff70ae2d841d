"""MSER — maximally stable extremal regions, TPU-native reformulation.

Reference: LMSER (core/ccl/compv_core_ccl_lmser.cxx:148 — Nistér-Stewénius
linear-time flood-fill component tree with boundary heaps; stability math in
core/include/compv/core/ccl/compv_core_ccl_lmser_result.h:155-199; defaults
delta=5 / min_area=0.0002 / max_area=0.5 / max_variation=0.5 /
min_diversity=0.5, base/include/compv/base/compv_ccl.h:23-27; per-region
point extraction compv_ccl.h:141-156 / lmser_result.h:122-152).

The flood-fill component tree is intrinsically sequential (SURVEY.md §7
'hard parts'). TPU redesign: *threshold decomposition* — for a ladder of
gray levels, the level sets {I <= t} are labeled with the dense CCL pass;
a component is identified by its root (= min flat index, stable under
growth), and the reference's stability math maps onto the sampled tree:

  * variation(r at level t) = (area(component containing r at t+delta)
    - area(r)) / area(r)            [one-sided UP, lmser_result.h:155-161]
  * stable iff variation is a local minimum along the nesting chain
    (vs the containing component one ladder step up and the seed-child one
    step down), variation <= max_variation, min_area <= area <= max_area
    [lmser_result.h:166-183]
  * min-diversity: among NESTED stable regions closer in area than
    (1 - min_diversity), only the most stable survives
    [lmser_result.h:91-113]

This computes the same extremal-region family sampled at `level_step` gray
levels — a bounded quantization of the exact tree; tests/test_ccl_mser_hog.py
bounds the divergence against a full-resolution sequential oracle.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from compv_tpu.features.ccl import label_components

__all__ = ["MserConfig", "MserResult", "mser_detect", "mser_region_mask",
           "mser_region_points"]


@dataclass(frozen=True)
class MserConfig:
    """Parameter names and defaults follow the reference's LMSER caps ids
    (COMPV_CCL_SET_INT_MSER_DELTA etc.) and default constants
    (base/include/compv/base/compv_ccl.h:23-27)."""
    delta: int = 5               # stability step, in GRAY LEVELS (not ladder
                                 # indices): variation compares the area of
                                 # the component containing the seed at
                                 # gray level t + delta
    min_area: float = 0.0002     # fraction of image area
    max_area: float = 0.5
    max_variation: float = 0.5
    min_diversity: float = 0.5   # nested stable regions with relative area
                                 # difference below this collapse to the
                                 # most stable one
    dark: bool = True            # detect dark-on-bright (I <= t); set False
                                 # for bright regions (inverts the image)
    level_step: int = 8          # gray-level quantization of the candidate
                                 # ladder (the sampling the TPU formulation
                                 # trades for dense parallelism)
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
    r_cap = config.max_regions
    f = img if config.dark else (255 - img.astype(jnp.int32)).astype(jnp.uint8)

    # candidate levels + the exact t+delta neighbors the reference's
    # variation needs (labelings are shared when they coincide)
    cand_levels = list(range(config.level_step, 256, config.level_step))
    plus_levels = [min(t + config.delta, 255) for t in cand_levels]
    all_levels = sorted(set(cand_levels) | set(plus_levels))
    pos = {t: i for i, t in enumerate(all_levels)}

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

    # one compiled labeling body mapped over the level ladder (an unrolled
    # Python loop would inline ~60 while_loops into the jaxpr)
    roots_all, areas_all, x0_all, y0_all, x1_all, y1_all = jax.lax.map(
        level_stats, jnp.asarray(all_levels, jnp.int32))
    stats = {t: (roots_all[i], areas_all[i], x0_all[i], y0_all[i],
                 x1_all[i], y1_all[i]) for t, i in pos.items()}
    nl = len(cand_levels)

    def area_through_pixel(t):
        """(N,) area of the component CONTAINING each pixel at level t."""
        root_t = stats[t][0]
        return stats[t][1][jnp.where(root_t >= 0, root_t, 0)], root_t

    # per candidate level: reference variation + local-minimum stability
    scores = []
    areas_own = []
    for i, t in enumerate(cand_levels):
        root_i = stats[t][0]                      # (N,)
        is_root = (root_i == jnp.arange(n)) & (root_i >= 0)
        area_i = stats[t][1]                      # area at own root
        area_safe = jnp.maximum(area_i.astype(jnp.float32), 1.0)

        # variation through the component containing the seed at t+delta
        a_plus, _ = area_through_pixel(plus_levels[i])
        var = (a_plus - area_i).astype(jnp.float32) / area_safe

        # local minimum along the sampled nesting chain: the PARENT is the
        # containing component one ladder step up; the CHILD is the
        # component at one step down through the same seed pixel
        # (lmser_result.h:166-183's parent/child variation comparison)
        if i + 1 < nl:
            ap_up, _ = area_through_pixel(cand_levels[i + 1])
            a_up_plus, _ = area_through_pixel(plus_levels[i + 1])
            var_parent = (a_up_plus - ap_up).astype(jnp.float32) / \
                jnp.maximum(ap_up.astype(jnp.float32), 1.0)
            is_min_up = var <= var_parent
        else:
            is_min_up = jnp.ones(n, bool)
        if i - 1 >= 0:
            t_dn = cand_levels[i - 1]
            a_dn, root_dn = area_through_pixel(t_dn)
            a_dn_plus, _ = area_through_pixel(plus_levels[i - 1])
            var_child = (a_dn_plus - a_dn).astype(jnp.float32) / \
                jnp.maximum(a_dn.astype(jnp.float32), 1.0)
            # child exists where the seed pixel is foreground at t-step
            has_child = root_dn >= 0
            is_min_dn = jnp.where(has_child, var <= var_child, True)
        else:
            is_min_dn = jnp.ones(n, bool)

        score = jnp.where(is_root & is_min_up & is_min_dn, var, jnp.inf)
        scores.append(score)
        areas_own.append(area_i)

    score_all = jnp.stack(scores)                 # (L, N)
    area_all = jnp.stack(areas_own)
    amin = max(int(config.min_area * n), 1)
    amax = int(config.max_area * n)
    ok = ((area_all >= amin) & (area_all <= amax)
          & (score_all <= config.max_variation))
    score_m = jnp.where(ok, score_all, jnp.inf)

    flat_sc = score_m.ravel()
    vals, idx = jax.lax.top_k(-flat_sc, r_cap)
    valid = jnp.isfinite(-vals)
    lvl_i = (idx // n).astype(jnp.int32)
    pix = (idx % n).astype(jnp.int32)
    var_sel = -vals
    area_sel = area_all[lvl_i, pix]

    # --- min-diversity (lmser_result.h:91-113): among NESTED candidates
    # whose areas differ by less than min_diversity (relatively), only the
    # most stable survives. Nesting check through the stacked roots:
    # candidate j is inside candidate i (level_i >= level_j) iff the
    # component containing j's seed at i's level is rooted at i's seed.
    roots_cand = jnp.stack([stats[t][0] for t in cand_levels])   # (L, N)
    root_of_j_at_li = roots_cand[lvl_i[:, None], pix[None, :]]   # (R, R)
    nested = (root_of_j_at_li == pix[:, None]) & \
        (lvl_i[:, None] >= lvl_i[None, :])
    nested = nested | nested.T                      # either containment
    a_i = area_sel[:, None].astype(jnp.float32)
    a_j = area_sel[None, :].astype(jnp.float32)
    rel_diff = jnp.abs(a_i - a_j) / jnp.maximum(jnp.maximum(a_i, a_j), 1.0)
    similar = rel_diff < config.min_diversity
    # "j beats i": j more stable (top_k order: smaller rank = more stable)
    rank = jnp.arange(r_cap)
    beats = (rank[None, :] < rank[:, None]) & valid[None, :]
    killed = jnp.any(nested & similar & beats, axis=1)
    keep = valid & ~killed

    level_arr = jnp.asarray(cand_levels, jnp.int32)
    x0s = jnp.stack([stats[t][2] for t in cand_levels])
    y0s = jnp.stack([stats[t][3] for t in cand_levels])
    x1s = jnp.stack([stats[t][4] for t in cand_levels])
    y1s = jnp.stack([stats[t][5] for t in cand_levels])

    return MserResult(
        seed_x=jnp.where(keep, pix % w, 0),
        seed_y=jnp.where(keep, pix // w, 0),
        level=jnp.where(keep, level_arr[lvl_i], 0),
        area=jnp.where(keep, area_sel, 0),
        variation=jnp.where(keep, var_sel, jnp.inf),
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


@partial(jax.jit, static_argnames=("dark", "shape"))
def _region_mask_impl(img, seed_x, seed_y, level, dark: bool, shape):
    f = img if dark else (255 - img.astype(jnp.int32)).astype(jnp.uint8)
    binary = (f.astype(jnp.int32) <= level).astype(jnp.uint8)
    lbl = label_components(binary, 8, 64)
    return (lbl >= 0) & (lbl == lbl[seed_y, seed_x])


def mser_region_mask(img: jax.Array, seed_x, seed_y, level,
                     dark: bool = True) -> jax.Array:
    """(H, W) bool membership mask of one detected region — the analogue of
    the reference's per-region point lists (compv_ccl.h:141-156,
    lmser_result.h computeFinalPoints). Recomputes the level-set labeling
    at the region's gray level (cheap; one CCL pass)."""
    return _region_mask_impl(img, seed_x, seed_y, level, dark, img.shape)


@partial(jax.jit, static_argnames=("max_points",))
def mser_region_points(mask: jax.Array, max_points: int = 4096):
    """(H, W) bool mask -> fixed-capacity point list ((P,) x, (P,) y,
    (P,) valid) in raster order — CompVConnectedComponentPoints analogue."""
    h, w = mask.shape
    n = h * w
    flat = mask.ravel()
    # raster-ordered extraction: rank = N - idx for set pixels
    rank = jnp.where(flat, n - jnp.arange(n, dtype=jnp.int32), 0)
    vals, idx = jax.lax.top_k(rank, min(max_points, n))
    valid = vals > 0
    return ((idx % w).astype(jnp.int32) * valid,
            (idx // w).astype(jnp.int32) * valid, valid)
