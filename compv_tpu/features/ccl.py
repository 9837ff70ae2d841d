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
    extractor walks cached RLE runs, compv_core_ccl_lsl_result.cxx).

    TPU formulation (r3 VERDICT task 2): ONE stable 1-key sort of
    [label, flat-index] — the r3 version needed a second (label, x) sort;
    min/max-x now come from a segmented associative_scan over the one
    sorted order instead — plus cumsum/cummin passes and elementwise
    math; no scatters, data-dependent gathers, or lax.top_k anywhere
    (scatter-min/max and top_k lower poorly on this backend, and a sort
    over image-derived arrays is the one irregular-grouping primitive
    that benchmarks dependably; see ROOFLINE.md for the r4 measurement
    methodology caveats).

    Per-component stats fall out of segment boundaries in sorted space:
    area/sum-x/sum-y as prefix-sum differences (int32-exact when
    n*max(w,h)/2 < 2^31, f32 otherwise), min/max-x via a segmented-min
    suffix scan keyed by the sorted labels, min-y free (label row), max-y
    from each segment's last slot (stable sort keeps raster order).
    Top-`max_components` by area: top-2 per 64-slot window of sorted
    pixel space + an exact sort of the ~2n/64 candidates; a component can
    be missed only if 3+ of the global top-C (hence all with area < 64)
    land in one 64-slot window."""
    h, w = lbl.shape
    n = h * w
    c = config.max_components
    big = jnp.int32(1 << 30)
    flat = lbl.ravel()
    fidx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(flat >= 0, flat, big)

    # ---- the one sort: stable => raster (ascending fidx) within segments
    key_s, fidx_s = jax.lax.sort([key, fidx], num_keys=1, is_stable=True)
    prev = jnp.pad(key_s, (1, 0), constant_values=-1)[:-1]
    is_first = (key_s != prev) & (key_s < big)
    nxt_k = jnp.pad(key_s, (0, 1), constant_values=big + 1)[1:]
    is_last = (key_s != nxt_k) & (key_s < big)
    vmask = key_s < big
    num = jnp.sum(is_first)
    x = fidx_s % w
    y = fidx_s // w

    # ---- segmented sums via prefix differences at boundaries
    exact_i32 = n * (max(w, h) // 2 + 1) < 2 ** 31
    sdt = jnp.int32 if exact_i32 else jnp.float32
    sbig = jnp.asarray(2 ** 31 - 1 if exact_i32 else jnp.inf, sdt)
    csum_at = lambda cs: jnp.pad(cs, (1, 0))[:-1]

    def seg_sum(v):
        cs = jnp.cumsum(v.astype(sdt))
        exc = csum_at(cs)
        u = jnp.where(is_first, exc, sbig)
        nxt_f = jax.lax.cummin(u[::-1])[::-1]
        nxt_f = jnp.concatenate([nxt_f[1:], cs[-1:]])
        return jnp.minimum(nxt_f, cs[-1]) - exc          # valid at is_first

    area = seg_sum(vmask.astype(jnp.int32))
    sumx = seg_sum(jnp.where(vmask, x, 0))
    sumy = seg_sum(jnp.where(vmask, y, 0))

    # ---- segmented min/max-x via one suffix associative_scan each: the
    # classic segmented-scan operator ((va,ka)+(vb,kb) -> (ka==kb ?
    # op(va,vb) : va, ka)) is associative for contiguous segments, so at a
    # segment's first slot the suffix combine covers exactly that segment
    def seg_scan(vals, op, fill):
        def combine(a, b):
            # standard segmented-scan operator: the operand nearer the
            # segment start (b under reverse=True) keeps its key; the
            # accumulated suffix (a) only merges when keys match
            va, ka = a
            vb, kb = b
            return jnp.where(ka == kb, op(va, vb), vb), kb

        v0 = jnp.where(vmask, vals, fill)
        out, _ = jax.lax.associative_scan(combine, (v0, key_s), reverse=True)
        return out                                       # valid at is_first

    minx = seg_scan(x, jnp.minimum, jnp.int32(w))
    maxx = seg_scan(x, jnp.maximum, jnp.int32(-1))
    miny = key_s // w                                    # label row = min y
    # max-y: y at the segment's LAST slot (stable sort => max fidx there),
    # pulled back to the first slot with the same no-gather boundary trick
    lasty = jnp.cumsum(jnp.where(is_last, y + 1, 0))
    exly = csum_at(lasty)
    u = jnp.where(is_first, exly, jnp.int32(2 ** 31 - 1))
    nxt_l = jax.lax.cummin(u[::-1])[::-1]
    nxt_l = jnp.concatenate([nxt_l[1:], lasty[-1:]])
    maxy = jnp.minimum(nxt_l, lasty[-1]) - exly - 1      # valid at is_first

    # ---- top-C by area: top-2 per 64-slot window + exact candidate sort
    area_slots = jnp.where(is_first, area, 0).astype(jnp.float32)
    seg = 64
    nseg = -(-n // seg)
    a2 = jnp.pad(area_slots, (0, nseg * seg - n)).reshape(nseg, seg)
    p1 = jnp.argmax(a2, axis=1)
    v1 = jnp.take_along_axis(a2, p1[:, None], 1)[:, 0]
    io2 = jax.lax.broadcasted_iota(jnp.int32, a2.shape, 1)
    a2b = jnp.where(io2 == p1[:, None], -1.0, a2)
    p2 = jnp.argmax(a2b, axis=1)
    v2 = jnp.take_along_axis(a2b, p2[:, None], 1)[:, 0]
    base = jnp.arange(nseg, dtype=jnp.int32) * seg
    cand_v = jnp.concatenate([v1, v2])
    cand_p = jnp.concatenate([base + p1, base + p2])
    neg_s, pos_s = jax.lax.sort([-cand_v, cand_p], num_keys=1)
    kk = min(c, int(cand_v.shape[0]))
    vals = jnp.pad(-neg_s[:kk], (0, c - kk))
    pos = jnp.pad(pos_s[:kk], (0, c - kk))
    comp_valid = vals > 0

    def pick(arr, fill=0):
        return jnp.where(comp_valid, arr[pos], fill)

    m00 = jnp.maximum(vals, 1.0)
    return CclResult(
        labels=lbl,
        num_components=num.astype(jnp.int32),
        area=jnp.where(comp_valid, vals.astype(jnp.int32), 0),
        box_x0=pick(minx),
        box_y0=pick(miny),
        box_x1=pick(maxx),
        box_y1=pick(maxy),
        cx=jnp.where(comp_valid, pick(sumx).astype(jnp.float32) / m00, 0.0),
        cy=jnp.where(comp_valid, pick(sumy).astype(jnp.float32) / m00, 0.0),
        valid=comp_valid,
    )
