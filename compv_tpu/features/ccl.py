"""Connected-component labeling + blob features, TPU-native.

Reference: CCL-LSL (core/ccl/compv_core_ccl_lsl.cxx:579 — Light Speed
Labeling: RLE segments + sequential equivalence solving, with lazily
computed features: boxes / moments / point extraction, lsl_result.cxx;
result API base/include/compv/base/compv_ccl.h:141-156).

TPU redesign — three staged solvers, cheapest first, all converging to the
same fixed point (labels = min flat index per component):

  1. Pallas whole-image-in-VMEM neighbor-min iteration
     (ops/pallas/ccl_kernel.py) — ~5 us per step at 1122x1182 on v5e, zero
     HBM traffic per iteration. TPU only.
  2. XLA segmented run-min sweeps: per iteration, a 4-diagonal min then
     whole-run min along rows and columns via lax.cummin with a monotone
     per-run offset (earlier/later runs get offsets >= n so the min never
     leaks across background). Runs on CPU (tests) and as the TPU fallback
     precursor.
  3. Gather-based pointer jumping (label = labels[labels], log-depth) —
     expensive on TPU (~7 ns/element gathers) but converges on pathological
     inputs (long snakes) that defeat bounded local propagation; only
     entered when stage 1/2 report non-convergence.

Features are fixed-capacity: the top-`max_components` components by area,
computed by per-component masked reductions in compact-id space.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from compv_tpu.ops.pallas.ccl_kernel import pallas_label

__all__ = ["CclConfig", "CclResult", "label_components",
           "label_components_seeded", "ccl_features"]

_PALLAS_CAP = 96     # convergence checks in the Pallas stage (2 steps each)
_SWEEP_CAP = 12      # run-min sweep iterations in the XLA stage


@dataclass(frozen=True)
class CclConfig:
    connectivity: int = 8        # LSL uses 8-connectivity
    max_components: int = 256    # fixed feature capacity (top-C by area)
    max_iterations: int = 64     # pointer-jumping fallback rounds (log-depth)
    max_runs: int = 1 << 17      # run-record capacity for feature extraction
    comp_capacity: int = 1 << 14  # distinct components trackable per frame


class CclResult(NamedTuple):
    labels: jax.Array       # (H, W) i32 — the label map (min flat index
                            # per component, -1 background); per-component
                            # rows below are indexed by the compact top-C
                            # order, with the root id recoverable as
                            # box_y0 * W + box_x0's pixel label
    num_components: jax.Array  # () i32
    area: jax.Array         # (C,) i32
    box_x0: jax.Array       # (C,) i32 bounding boxes
    box_y0: jax.Array
    box_x1: jax.Array       # inclusive
    box_y1: jax.Array
    cx: jax.Array           # (C,) f32 centroids (first-order moments / area)
    cy: jax.Array
    valid: jax.Array        # (C,) bool


# --------------------------------------------------------------- stage 2:
# segmented run-min sweeps (pure XLA)

def _run_min(lbl, fg, axis, big):
    """Min over each maximal foreground run along `axis` — lax.cummin with
    direction-matched monotone per-run offsets so background blocks
    propagation. Requires n * (axis_len/2 + 2) < 2^31."""
    m = jnp.int32(lbl.shape[0] * lbl.shape[1])
    prev = jnp.pad(fg, [(1, 0) if a == axis else (0, 0) for a in range(2)])
    prev = jax.lax.slice_in_dim(prev, 0, fg.shape[axis], axis=axis)
    start = fg & ~prev.astype(bool)
    b = jnp.cumsum(start.astype(jnp.int32), axis=axis)
    rmax = fg.shape[axis] // 2 + 2
    offs_f = (rmax - b) * m
    offs_b = b * m
    # scan sentinel must exceed the largest offset-inflated key (lbl+offs
    # <= n*(axis/2+2), guarded < 2^30 by the caller) — the stage sentinel
    # `big` (= n) is smaller than inflated keys and would win the min.
    sent = jnp.int32(1 << 30)
    a1 = jax.lax.cummin(jnp.where(fg, lbl + offs_f, sent), axis=axis) - offs_f
    a2 = jax.lax.cummin(jnp.where(fg, lbl + offs_b, sent), axis=axis,
                        reverse=True) - offs_b
    return jnp.where(fg, jnp.minimum(a1, a2), big)


def _diag_min(lbl, fg, big):
    h, w = lbl.shape
    p = jnp.pad(lbl, 1, constant_values=1 << 30)
    mm = lbl
    for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
        mm = jnp.minimum(mm, jax.lax.dynamic_slice(p, (1 + dy, 1 + dx),
                                                   (h, w)))
    return jnp.where(fg, mm, big)


def _sweep_stage(lbl, fg, connectivity, big, cap):
    """Returns (labels, converged)."""

    def body(state):
        l, _, i = state
        new = _diag_min(l, fg, big) if connectivity == 8 else l
        new = _run_min(new, fg, 0, big)
        new = _run_min(new, fg, 1, big)
        return new, jnp.any(new != l), i + 1

    def cond(state):
        return state[1] & (state[2] < cap)

    lbl, changed, _ = jax.lax.while_loop(
        cond, body, (lbl, jnp.asarray(True), jnp.asarray(0)))
    return lbl, ~changed


# --------------------------------------------------------------- stage 3:
# pointer jumping (gathers; log-depth; guaranteed convergence)

def _neighbor_min(lbl, fg, connectivity, big):
    h, w = lbl.shape
    p = jnp.pad(lbl, 1, constant_values=1 << 30)
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    m = lbl
    for dy, dx in offs:
        m = jnp.minimum(m, jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w)))
    return jnp.where(fg, m, big)


def _pointer_stage(lbl, fg, connectivity, big, max_iterations):
    h, w = lbl.shape

    def body(state):
        l, _, i = state
        new = _neighbor_min(l, fg, connectivity, big)
        flat = new.ravel()
        safe = jnp.minimum(flat, big - 1)
        jumped = jnp.where(flat < big, flat[safe], big)
        jumped = jnp.where(jumped < big, flat[jnp.minimum(jumped, big - 1)],
                           jumped)
        new = jnp.minimum(new, jumped.reshape(h, w))
        new = jnp.where(fg, new, big)
        return new, jnp.any(new != l), i + 1

    def cond(state):
        return state[1] & (state[2] < max_iterations)

    lbl, _, _ = jax.lax.while_loop(
        cond, body, (lbl, jnp.asarray(True), jnp.asarray(0)))
    return lbl


@partial(jax.jit, static_argnames=("connectivity", "max_iterations"))
def label_components(binary: jax.Array, connectivity: int = 8,
                     max_iterations: int = 64) -> jax.Array:
    """(H, W) u8/bool -> (H, W) i32 labels. Foreground pixels get the min
    flat-index of their component; background gets -1."""
    h, w = binary.shape
    fg = binary > 0
    big = jnp.int32(h * w)

    on_tpu = jax.default_backend() == "tpu"
    # the run-min offset trick needs n * (axis/2 + 2) in i32
    sweep_ok = h * w * (max(h, w) // 2 + 2) < 2 ** 30

    if on_tpu:
        raw, iters = pallas_label(binary, connectivity, _PALLAS_CAP)
        converged = iters < _PALLAS_CAP
        # common case: kernel output is final (-1 at bg) — keep the
        # big-form conversion inside the rare unconverged branch only

        def fixup(r):
            l = jnp.where(fg, r, big)
            l = _pointer_stage(l, fg, connectivity, big, max_iterations)
            return jnp.where(fg, l, -1)

        return jax.lax.cond(converged, lambda r: r, fixup, raw)

    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    lbl = jnp.where(fg, idx, big)
    if sweep_ok:
        lbl, converged = _sweep_stage(lbl, fg, connectivity, big,
                                      _SWEEP_CAP)
    else:
        converged = jnp.asarray(False)
    lbl = jax.lax.cond(
        converged, lambda l: l,
        lambda l: _pointer_stage(l, fg, connectivity, big, max_iterations),
        lbl)
    return jnp.where(fg, lbl, -1)


@partial(jax.jit, static_argnames=("connectivity", "max_iterations"))
def label_components_seeded(binary: jax.Array, init: jax.Array,
                            connectivity: int = 8,
                            max_iterations: int = 64) -> jax.Array:
    """label_components warm-started from `init` (i32, own flat index or a
    previous level's converged labels at foreground pixels; ignored at
    background). Used by MSER's incremental gray-level ladder — nested level
    sets mean most pixels keep their labels and only newly-merged regions
    re-flood (compv_core_ccl_lmser.cxx grows its component tree the same
    incremental way)."""
    h, w = binary.shape
    fg = binary > 0
    big = jnp.int32(h * w)

    if jax.default_backend() == "tpu":
        from compv_tpu.ops.pallas.ccl_kernel import pallas_label_seeded
        # run-jumps matter here: MSER's high gray levels merge everything
        # into image-spanning open regions whose diameter defeats plain
        # neighbor-min, but whose long fg runs let d<=512 jumps cross the
        # image in a handful of iterations
        raw, iters = pallas_label_seeded(binary, init, connectivity,
                                         _PALLAS_CAP, jump_every=2,
                                         jump_dists=(8, 64, 512))
        converged = iters < _PALLAS_CAP

        def fixup(r):
            l = jnp.where(fg, r, big)
            l = _pointer_stage(l, fg, connectivity, big, max_iterations)
            return jnp.where(fg, l, -1)

        return jax.lax.cond(converged, lambda r: r, fixup, raw)

    lbl = jnp.where(fg, init, big)
    sweep_ok = h * w * (max(h, w) // 2 + 2) < 2 ** 30
    if sweep_ok:
        lbl, converged = _sweep_stage(lbl, fg, connectivity, big, _SWEEP_CAP)
    else:
        converged = jnp.asarray(False)
    lbl = jax.lax.cond(
        converged, lambda l: l,
        lambda l: _pointer_stage(l, fg, connectivity, big, max_iterations),
        lbl)
    return jnp.where(fg, lbl, -1)


# --------------------------------------------------------------- features

@partial(jax.jit, static_argnames=("config",))
def ccl_features(binary: jax.Array, config: CclConfig = CclConfig()
                 ) -> CclResult:
    """Label + extract per-component features, top max_components by area
    (reference: boxes/moments computed from the labeling result,
    core/ccl/compv_core_ccl_lsl_result.cxx)."""
    lbl = label_components(binary, config.connectivity, config.max_iterations)
    return ccl_features_from_labels(lbl, config)


@partial(jax.jit, static_argnames=("config",))
def ccl_features_from_labels(lbl: jax.Array, config: CclConfig = CclConfig()
                             ) -> CclResult:
    """Feature extraction given a label map (the reference benchmarks box
    extraction separately from labeling, speed_compare:181-186; its
    extractor walks the RLE runs, compv_core_ccl_lsl_result.cxx).

    TPU run-record formulation (r3 VERDICT task 2 — replaces two full-image
    sorts, ~1.5 ms each, with ONE compaction scatter + small-record math):

      every per-component statistic decomposes into independent sums over
      the run START and run END pixels of each row:
        area   = sum_ends (x+1)        - sum_starts x
        sum-x  = sum_ends x(x+1)/2     - sum_starts (x-1)x/2   (series)
        sum-y  = sum_ends y(x+1)       - sum_starts y*x
        min-x/min-y from starts, max-x/max-y from ends
      so no run-length propagation pass is needed at all. Start/end pixels
      (~R << n) are compacted by one masked scatter keyed on a prefix sum,
      their labels mapped to dense component ids by ranking the component
      ROOTS (label == own flat index, a property of min-index labels) with
      the same prefix pass, and the per-component tables built by three
      small scatters (add / min / max) over R records. Total: one n-sized
      cumsum + one n-sized scatter + O(R) work.

    Capacity semantics: supports up to `config.max_runs` row-runs and
    `config.comp_capacity` distinct components per frame (images beyond
    2^28 pixels or components beyond capacity are truncated — truncation
    is detectable via num_components > comp_capacity). Centroid sums
    accumulate in f32; area is exact int32."""
    h, w = lbl.shape
    n = h * w
    c = config.max_components
    rcap = config.max_runs
    ccap = config.comp_capacity
    big = jnp.int32(1 << 30)
    flat = lbl.ravel()
    fg = lbl >= 0

    shl = jnp.pad(fg, ((0, 0), (1, 0)))[:, :-1]
    shr = jnp.pad(fg, ((0, 0), (0, 1)))[:, 1:]
    starts = (fg & ~shl).ravel()
    ends = (fg & ~shr).ravel()
    rec = starts | ends

    iota = jnp.arange(n, dtype=jnp.int32)
    is_root = (flat == iota) & fg.ravel()
    rank = jnp.cumsum(is_root.astype(jnp.int32))     # inclusive root rank
    num = rank[-1]

    # ---- compact records: one masked .set scatter with unique slots
    slot = jnp.cumsum(rec.astype(jnp.int32)) - 1
    idx = jnp.where(rec & (slot < rcap), slot, rcap)
    packed = iota * 4 + starts.astype(jnp.int32) * 2 + ends.astype(jnp.int32)
    tbl = jnp.zeros((rcap + 1, 2), jnp.int32).at[idx].set(
        jnp.stack([packed, flat], axis=1), unique_indices=False)
    n_rec = slot[-1] + 1
    rec_valid = jnp.arange(rcap, dtype=jnp.int32) < n_rec

    p = tbl[:rcap, 0] >> 2
    is_s = ((tbl[:rcap, 0] >> 1) & 1) * rec_valid
    is_e = (tbl[:rcap, 0] & 1) * rec_valid
    lab = tbl[:rcap, 1]
    x = p % w
    y = p // w
    cid = rank[jnp.clip(lab, 0, n - 1)] - 1          # dense component id
    cid = jnp.where(rec_valid & (cid < ccap), cid, ccap)

    # ---- per-component tables: three small scatters over R records
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    area_d = is_e * (x + 1) - is_s * x
    sumx_d = (is_e * (xf * (xf + 1) * 0.5) - is_s * ((xf - 1) * xf * 0.5))
    sumy_d = yf * area_d.astype(jnp.float32)
    adds_i = jnp.zeros((ccap + 1,), jnp.int32).at[cid].add(area_d)
    adds_f = jnp.zeros((ccap + 1, 2), jnp.float32).at[cid].add(
        jnp.stack([sumx_d, sumy_d], axis=1))
    mins = jnp.full((ccap + 1, 2), big, jnp.int32).at[cid].min(
        jnp.stack([jnp.where(is_s == 1, x, big),
                   jnp.where(is_s == 1, y, big)], axis=1))
    maxs = jnp.full((ccap + 1, 2), -1, jnp.int32).at[cid].max(
        jnp.stack([jnp.where(is_e == 1, x, -1),
                   jnp.where(is_e == 1, y, -1)], axis=1))

    # ---- top-C by area
    vals, pos = jax.lax.top_k(adds_i[:ccap], min(c, ccap))
    vals = jnp.pad(vals, (0, c - min(c, ccap)))
    pos = jnp.pad(pos, (0, c - min(c, ccap)))
    comp_valid = vals > 0

    def pick(arr, fill=0):
        return jnp.where(comp_valid, arr[pos], fill)

    m00 = jnp.maximum(vals.astype(jnp.float32), 1.0)
    return CclResult(
        labels=lbl,
        num_components=num,
        area=jnp.where(comp_valid, vals, 0),
        box_x0=pick(mins[:ccap, 0]),
        box_y0=pick(mins[:ccap, 1]),
        box_x1=pick(maxs[:ccap, 0]),
        box_y1=pick(maxs[:ccap, 1]),
        cx=jnp.where(comp_valid, adds_f[:ccap, 0][pos] / m00, 0.0),
        cy=jnp.where(comp_valid, adds_f[:ccap, 1][pos] / m00, 0.0),
        valid=comp_valid,
    )
