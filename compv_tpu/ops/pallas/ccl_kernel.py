"""Pallas connected-component labeling kernel — whole image resident in VMEM.

Reference: CCL-LSL (core/ccl/compv_core_ccl_lsl.cxx:579) builds RLE segments
and solves equivalences sequentially. That design is CPU-serial; the TPU
redesign keeps the *labels = min flat index per component* contract and
computes it by iterated min-propagation with the entire image held in VMEM,
so each iteration is pure VPU compute with zero HBM traffic:

  * base step: separable 3x3 neighbor min (8-conn) / cross min (4-conn)
    — 4 rolls + 4 mins per iteration (~5 us at 1122x1182 on v5e).
  * jump step (every `jump_every` iterations): distance-d shifts along rows
    and columns, valid where the d-window is entirely foreground (tested via
    prefix-count differences, cnt[p] - cnt[p-d] == d) — the in-VMEM analogue
    of LSL's run-level reasoning: a label crosses a whole run in one step.

Convergence is checked every iteration; the kernel returns (labels, iters).
Callers needing guaranteed convergence on pathological inputs (long snakes
beyond `max_iter`) chain the XLA pointer-jumping fallback in features/ccl.py.

A seeded entry point supports MSER's incremental level relabeling: labels
from level t seed level t+1, so only newly-merged regions re-flood.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_label", "pallas_label_seeded", "BIG"]

BIG = 1 << 30  # > any flat index; i32-safe sentinel for background


def _propagate_body(fg, cnt_r, cnt_c, hp, wp, conn8, jump_every,
                    jump_dists, max_iter, steps_per_check=2):
    """Returns (cond, body) for the label-propagation while_loop."""
    big = jnp.int32(BIG)

    def nmin(l):
        v = jnp.minimum(l, jnp.minimum(pltpu.roll(l, hp - 1, 0),
                                       pltpu.roll(l, 1, 0)))
        if conn8:
            # separable 3x3 box min == 8-neighborhood min (intermediate v at
            # bg columns legally carries diagonal values)
            v = jnp.minimum(v, jnp.minimum(pltpu.roll(v, wp - 1, 1),
                                           pltpu.roll(v, 1, 1)))
        else:
            v = jnp.minimum(v, jnp.minimum(pltpu.roll(l, wp - 1, 1),
                                           pltpu.roll(l, 1, 1)))
        return jnp.where(fg, v, big)

    def jumps(l):
        # distance-d moves along rows/cols, valid iff the whole d-window is
        # foreground: inclusive prefix counts differ by exactly d. Wraps are
        # safe: a wrapped window never counts d consecutive fg pixels
        # (prefix counts are monotone along the axis).
        for d in jump_dists:
            for axis, cnt, size in ((0, cnt_r, hp), (1, cnt_c, wp)):
                if d >= size:      # jump longer than the (padded) axis:
                    continue       # no valid all-fg window can exist
                # & fg: a window test alone would let the backward jump
                # write labels into background pixels, which the next
                # neighbor-min would then propagate (label leak).
                fwd_ok = ((cnt - pltpu.roll(cnt, d, axis)) == d) & fg
                l = jnp.where(fwd_ok,
                              jnp.minimum(l, pltpu.roll(l, d, axis)), l)
                bwd_ok = ((pltpu.roll(cnt, size - d, axis) - cnt) == d) & fg
                l = jnp.where(bwd_ok,
                              jnp.minimum(l, pltpu.roll(l, size - d, axis)),
                              l)
        return l

    def cond(state):
        _, changed, i = state
        return changed & (i < max_iter)

    def body(state):
        l, _, i = state
        new = l
        for _ in range(steps_per_check):
            new = nmin(new)
        if jump_dists:
            new = jax.lax.cond(i % jump_every == jump_every - 1,
                               jumps, lambda x: x, new)
        return new, jnp.any(new != l), i + 1

    return cond, body


def _label_kernel(fg_ref, cntr_ref, cntc_ref, init_ref, out_ref, it_ref, *,
                  w, hp, wp, max_iter, conn8, jump_every, jump_dists, seeded):
    fg = fg_ref[:].astype(jnp.int32) > 0
    big = jnp.int32(BIG)
    if seeded:
        lbl0 = jnp.where(fg, init_ref[:], big)
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
        lbl0 = jnp.where(fg, row * w + col, big)

    cnt_r = cntr_ref[:] if jump_dists else None
    cnt_c = cntc_ref[:] if jump_dists else None
    cond, body = _propagate_body(fg, cnt_r, cnt_c, hp, wp,
                                 conn8, jump_every, jump_dists, max_iter)
    lbl, _, iters = jax.lax.while_loop(
        cond, body, (lbl0, jnp.asarray(True), jnp.int32(0)))
    out_ref[:] = jnp.where(fg, lbl, -1)
    it_ref[0] = iters


def _pad_shapes(h, w):
    hp = -(-(h + 2) // 8) * 8
    wp = -(-(w + 2) // 128) * 128
    return hp, wp


@functools.partial(jax.jit, static_argnames=(
    "max_iter", "connectivity", "jump_every", "jump_dists", "w"))
def _label_call(fg_pad, init_pad, max_iter, connectivity, jump_every,
                jump_dists, w):
    hp, wp = fg_pad.shape
    seeded = init_pad is not None
    if jump_dists:
        cnt_r = jnp.cumsum(fg_pad.astype(jnp.int32), axis=0)
        cnt_c = jnp.cumsum(fg_pad.astype(jnp.int32), axis=1)
    else:
        cnt_r = cnt_c = jnp.zeros((1, 128), jnp.int32)
    args = [fg_pad, cnt_r, cnt_c,
            init_pad if seeded else jnp.zeros((1, 128), jnp.int32)]
    out, it = pl.pallas_call(
        functools.partial(
            _label_kernel, w=int(w), hp=hp, wp=wp, max_iter=max_iter,
            conn8=(connectivity == 8), jump_every=jump_every,
            jump_dists=jump_dists, seeded=seeded),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)
    return out, it[0]


def pallas_label(binary: jax.Array, connectivity: int = 8,
                 max_iter: int = 96, jump_every: int = 3,
                 jump_dists: tuple = ()):
    """(H, W) u8/bool -> ((H, W) i32 labels, -1 at background, plus the
    iteration count).

    Converged iff iters < max_iter (callers chain a fallback otherwise).
    Each "iter" is steps_per_check=2 propagation steps, so max_iter=96
    covers paths of ~192 neighbor hops. Jumps are off by default: measured
    on the text benchmark they cut iterations 38->26 but tripled step cost
    (text-scale runs are too short for d>=8 jumps to fire often)."""
    h, w = binary.shape
    if h * w >= BIG:
        raise ValueError("image too large for i32 flat labels")
    hp, wp = _pad_shapes(h, w)
    fg = jnp.zeros((hp, wp), jnp.int8).at[:h, :w].set(
        (binary > 0).astype(jnp.int8))
    out, iters = _label_call(fg, None, max_iter, connectivity, jump_every,
                             tuple(jump_dists), w)
    return out[:h, :w], iters


def pallas_label_seeded(binary: jax.Array, init: jax.Array,
                        connectivity: int = 8, max_iter: int = 96,
                        jump_every: int = 3, jump_dists: tuple = ()):
    """Seeded propagation: `init` provides starting labels (e.g. the
    converged labels of the previous MSER gray level); new foreground pixels
    must carry their own flat index in `init`."""
    h, w = binary.shape
    hp, wp = _pad_shapes(h, w)
    fg = jnp.zeros((hp, wp), jnp.int8).at[:h, :w].set(
        (binary > 0).astype(jnp.int8))
    init_pad = jnp.full((hp, wp), BIG, jnp.int32).at[:h, :w].set(init)
    out, iters = _label_call(fg, init_pad, max_iter, connectivity,
                             jump_every, tuple(jump_dists), w)
    return out[:h, :w], iters
