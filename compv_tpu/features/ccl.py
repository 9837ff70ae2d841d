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
    max_components: int = 256    # fixed feature capacity
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
    extraction separately from labeling, speed_compare:181-186).

    Sort-based segmented reduction — no scatters, no gathers over the
    image: sort A = [label, flat index] (stable, so groups keep raster
    order: area / sum-x / sum-y / min-y / max-y fall out of cumsum
    differences at group boundaries); sort B = [label, x] two-key (min-x at
    each group's first slot, max-x extracted by summing a one-nonzero-per-
    group masked array). Top-`max_components` selection by area uses top-2
    per 64-slot segment of the sorted-label axis + an exact top-k over the
    ~40k candidates; it can only miss a component if 3+ of the global
    top-C land in one 64-slot segment.

    Perf note (ROOFLINE.md): the reference extracts boxes from its RLE
    runs in ~96 us on a CPU; any TPU formulation needs 1M-element sorts
    (~1.5 ms each) or ~7 ns/element random access, so this row is
    CPU-favored by design. Labeling, the expensive half, is where the TPU
    wins (ccl_label_text)."""
    h, w = lbl.shape
    n = h * w
    c = config.max_components
    big = jnp.int32(1 << 30)
    flat = lbl.ravel()
    key = jnp.where(flat >= 0, flat, big)
    fidx = jnp.arange(n, dtype=jnp.int32)
    xs = fidx % w

    # ---- sort A: by label, stable => raster order within each group
    ka, fa = jax.lax.sort([key, fidx], num_keys=1)
    prev = jnp.pad(ka, (1, 0), constant_values=-1)[:-1]
    is_first = (ka != prev) & (ka < big)
    nxt_k = jnp.pad(ka, (0, 1), constant_values=big + 1)[1:]
    is_last = (ka != nxt_k) & (ka < big)
    num = jnp.sum(is_first)

    csum1 = jnp.cumsum((ka < big).astype(jnp.int32))
    csumy = jnp.cumsum(jnp.where(ka < big, fa // w, 0))
    csumx = jnp.cumsum(jnp.where(ka < big, fa % w, 0))

    # exclusive prefix at group starts vs at next group starts
    csum_at = lambda cs: jnp.pad(cs, (1, 0))[:-1]
    exc1, excy, excx = csum_at(csum1), csum_at(csumy), csum_at(csumx)

    def nxt_first(v, terminal):
        """At each slot: v at the NEAREST following group-first slot (the
        prefixes are nondecreasing, so a reverse cummin with a +inf
        sentinel finds the nearest, not the furthest); the final group
        falls through to `terminal` (the overall total)."""
        u = jnp.where(is_first, v, big)
        incl = jax.lax.cummin(u[::-1])[::-1]
        shifted = jnp.concatenate(
            [incl[1:], jnp.full((1,), terminal, v.dtype)])
        return jnp.minimum(shifted, terminal)

    area = jnp.where(is_first, nxt_first(exc1, csum1[-1]) - exc1, 0)
    sumy = jnp.where(is_first, nxt_first(excy, csumy[-1]) - excy, 0)
    sumx = jnp.where(is_first, nxt_first(excx, csumx[-1]) - excx, 0)
    miny = jnp.where(is_first, fa // w, 0)
    # max-y: y of each group's LAST element — one nonzero per group, so a
    # plain cumsum difference extracts it
    lasty = jnp.cumsum(jnp.where(is_last, fa // w + 1, 0))
    exly = csum_at(lasty)
    maxy = jnp.where(is_first, nxt_first(exly, lasty[-1]) - exly - 1, 0)

    # ---- sort B: by (label, x) => min-x first, max-x at group end
    kb, xb = jax.lax.sort([key, xs], num_keys=2)
    minx = jnp.where(is_first, xb, 0)      # same group boundaries as A
    lastx = jnp.cumsum(jnp.where(is_last, xb + 1, 0))
    exlx = csum_at(lastx)
    maxx = jnp.where(is_first, nxt_first(exlx, lastx[-1]) - exlx - 1, 0)

    # ---- top-C by area: top-2 per 64-slot segment + exact small top-k
    seg = 64
    nseg = n // seg if n % seg == 0 else -(-n // seg)
    a3 = jnp.pad(area, (0, nseg * seg - n)).reshape(nseg, seg)
    p1 = jnp.argmax(a3, axis=-1)
    v1 = jnp.take_along_axis(a3, p1[:, None], axis=-1)[:, 0]
    iota = jax.lax.broadcasted_iota(jnp.int32, a3.shape, 1)
    a3b = jnp.where(iota == p1[:, None], -1, a3)
    p2 = jnp.argmax(a3b, axis=-1)
    v2 = jnp.take_along_axis(a3b, p2[:, None], axis=-1)[:, 0]
    cand_v = jnp.concatenate([v1, v2])
    cand_p = jnp.concatenate([jnp.arange(nseg, dtype=jnp.int32) * seg + p1,
                              jnp.arange(nseg, dtype=jnp.int32) * seg + p2])
    kk = min(c, cand_v.shape[0])
    vals, sel = jax.lax.top_k(cand_v, kk)
    vals = jnp.pad(vals, (0, c - kk))
    pos2 = jnp.pad(cand_p[sel], (0, c - kk))
    comp_valid = vals > 0

    def pick(arr, fill=0):
        v = arr[pos2]
        return jnp.where(comp_valid, v, fill)

    m00 = jnp.maximum(vals.astype(jnp.float32), 1.0)
    return CclResult(
        labels=lbl,
        num_components=num.astype(jnp.int32),
        area=jnp.where(comp_valid, vals, 0),
        box_x0=pick(minx),
        box_y0=pick(miny),
        box_x1=pick(maxx),
        box_y1=pick(maxy),
        cx=jnp.where(comp_valid, pick(sumx).astype(jnp.float32) / m00, 0.0),
        cy=jnp.where(comp_valid, pick(sumy).astype(jnp.float32) / m00, 0.0),
        valid=comp_valid,
    )
