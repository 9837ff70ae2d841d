"""Connected-component labeling + blob features, TPU-native.

Reference: CCL-LSL (core/ccl/compv_core_ccl_lsl.cxx:579 — Light Speed
Labeling: RLE segments + equivalence solving, with lazily computed features:
boxes / moments / point extraction, lsl_result.cxx; result API
base/include/compv/base/compv_ccl.h:141-156).

TPU redesign: LSL's sequential equivalence tables become iterative
label propagation with pointer jumping — labels start as flat indices, each
round takes the min over the 4/8-neighborhood and then compresses paths by
label = labels[labels] (log-depth convergence). Everything is dense VPU
passes + gathers; no data-dependent shapes. Features are fixed-capacity:
the top-`max_components` components by area, computed with scatter-reduce.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["CclConfig", "CclResult", "label_components", "ccl_features"]


@dataclass(frozen=True)
class CclConfig:
    connectivity: int = 8        # LSL uses 8-connectivity
    max_components: int = 256    # fixed feature capacity
    max_iterations: int = 64     # propagation rounds (each ~doubles reach)


class CclResult(NamedTuple):
    labels: jax.Array       # (H, W) i32 — compact component id in
                            # [0, max_components), -1 for background/overflow
    num_components: jax.Array  # () i32
    area: jax.Array         # (C,) i32
    box_x0: jax.Array       # (C,) i32 bounding boxes
    box_y0: jax.Array
    box_x1: jax.Array       # inclusive
    box_y1: jax.Array
    cx: jax.Array           # (C,) f32 centroids (first-order moments / area)
    cy: jax.Array
    valid: jax.Array        # (C,) bool


def _neighbor_min(lbl: jax.Array, fg: jax.Array, connectivity: int,
                  big: int) -> jax.Array:
    h, w = lbl.shape
    p = jnp.pad(lbl, 1, constant_values=big)
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    m = lbl
    for dy, dx in offs:
        m = jnp.minimum(m, jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w)))
    return jnp.where(fg, m, big)


@partial(jax.jit, static_argnames=("connectivity", "max_iterations"))
def label_components(binary: jax.Array, connectivity: int = 8,
                     max_iterations: int = 64) -> jax.Array:
    """(H, W) u8/bool -> (H, W) i32 labels. Foreground pixels get the min
    flat-index of their component; background gets -1."""
    h, w = binary.shape
    fg = binary > 0
    big = h * w
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lbl = jnp.where(fg, idx, big)

    def cond(state):
        lbl, changed, i = state
        return changed & (i < max_iterations)

    def body(state):
        lbl, _, i = state
        new = _neighbor_min(lbl, fg, connectivity, big)
        # pointer jumping: follow the label chain twice (path compression)
        flat = new.ravel()
        safe = jnp.minimum(flat, big - 1)
        jumped = jnp.where(flat < big, flat[safe], big)
        jumped = jnp.where(jumped < big, flat[jnp.minimum(jumped, big - 1)],
                           jumped)
        new = jnp.minimum(new, jumped.reshape(h, w))
        new = jnp.where(fg, new, big)
        changed = jnp.any(new != lbl)
        return new, changed, i + 1

    lbl, _, _ = jax.lax.while_loop(cond, body,
                                   (lbl, jnp.asarray(True), jnp.asarray(0)))
    return jnp.where(fg, lbl, -1)


@partial(jax.jit, static_argnames=("config",))
def ccl_features(binary: jax.Array, config: CclConfig = CclConfig()
                 ) -> CclResult:
    """Label + extract per-component features, top max_components by area
    (reference: boxes/moments computed from the labeling result,
    core/ccl/compv_core_ccl_lsl_result.cxx)."""
    h, w = binary.shape
    n = h * w
    lbl = label_components(binary, config.connectivity, config.max_iterations)
    flat = lbl.ravel()
    fg = flat >= 0
    root = jnp.where(fg, flat, 0)

    ones = fg.astype(jnp.int32)
    area_by_root = jnp.zeros(n, jnp.int32).at[root].add(ones)
    # representative-only: area>0 exactly at component roots
    vals, root_ids = jax.lax.top_k(area_by_root, config.max_components)
    comp_valid = vals > 0
    num = jnp.sum(comp_valid)

    # compact relabel: map root -> compact id
    compact_of_root = jnp.full(n, -1, jnp.int32)
    compact_of_root = compact_of_root.at[root_ids].set(
        jnp.where(comp_valid, jnp.arange(config.max_components, dtype=jnp.int32), -1))
    compact = jnp.where(fg, compact_of_root[root], -1)

    xs = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)).ravel()
    ys = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)).ravel()
    cid = jnp.where(compact.ravel() >= 0, compact.ravel(), config.max_components)
    c = config.max_components
    big = jnp.int32(1 << 30)

    def scatter_min(v, init):
        return jnp.full(c + 1, init, jnp.int32).at[cid].min(v)[:c]

    def scatter_max(v, init):
        return jnp.full(c + 1, init, jnp.int32).at[cid].max(v)[:c]

    def scatter_sum(v):
        return jnp.zeros(c + 1, jnp.float32).at[cid].add(v)[:c]

    x0 = scatter_min(xs, big)
    y0 = scatter_min(ys, big)
    x1 = scatter_max(xs, -1)
    y1 = scatter_max(ys, -1)
    m00 = scatter_sum(ones.astype(jnp.float32))
    m10 = scatter_sum(xs.astype(jnp.float32) * ones)
    m01 = scatter_sum(ys.astype(jnp.float32) * ones)
    safe = jnp.maximum(m00, 1.0)

    return CclResult(
        labels=compact.reshape(h, w),
        num_components=num.astype(jnp.int32),
        area=jnp.where(comp_valid, vals, 0),
        box_x0=jnp.where(comp_valid, x0, 0),
        box_y0=jnp.where(comp_valid, y0, 0),
        box_x1=jnp.where(comp_valid, x1, 0),
        box_y1=jnp.where(comp_valid, y1, 0),
        cx=jnp.where(comp_valid, m10 / safe, 0.0),
        cy=jnp.where(comp_valid, m01 / safe, 0.0),
        valid=comp_valid,
    )
