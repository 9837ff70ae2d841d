"""Pallas per-strip label histogram — component areas without scatters.

Reference: the LMSER component tree carries per-region cardinalities
(core/include/compv/core/ccl/compv_core_ccl_lmser_result.h:155-199); its
sequential flood-fill gets them for free. On TPU, per-component areas are a
histogram over arbitrary 21-bit labels — scatter-add costs ~7 ns/element
(9 ms per 1122x1182 frame), so instead each 8-row strip enumerates its
distinct labels in increasing order (labels are min flat indices, so
"next = min of labels > current") and emits (label, count) records; a
small batched sort + segmented sum outside merges strips into exact
per-component areas.

Cost is sum over strips of (distinct labels in strip) full-strip reductions
— content-adaptive, like the reference's tree walk.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["strip_label_counts"]

_BIG = 1 << 30


def _counts_kernel(lbl_ref, out_ref, meta_ref, *, rounds):
    lbl = lbl_ref[:]
    big = jnp.int32(_BIG)
    l = jnp.where(lbl < 0, big, lbl)
    first = jnp.min(l)

    def cond(st):
        k, cur = st
        return (k < rounds) & (cur < big)

    def body(st):
        k, cur = st
        cnt = jnp.sum((l == cur).astype(jnp.int32))
        out_ref[0, 0, k] = cur
        out_ref[0, 1, k] = cnt
        nxt = jnp.min(jnp.where(l > cur, l, big))
        return k + 1, nxt

    k_end, cur_end = jax.lax.while_loop(cond, body, (jnp.int32(0), first))
    # slots >= k_end are UNINITIALIZED — consumers must mask by k_end.
    # (the r3 version pre-zeroed every slot in a fori_loop: at 640 rounds
    # x 148 strips x 51 MSER levels that is ~10M scalar SMEM stores,
    # ~35 ms/frame of pure init)
    meta_ref[0, 0, 0] = k_end
    meta_ref[0, 0, 1] = (cur_end < big).astype(jnp.int32)  # truncated?


@functools.partial(jax.jit, static_argnames=("rounds", "strip_rows"))
def strip_label_counts(labels: jax.Array, rounds: int = 256,
                       strip_rows: int = 8):
    """(H, W) i32 labels (-1 = background) -> per-strip distinct-label
    records. Returns (records (S, 2, rounds) i32, used (S,) i32,
    truncated (S,) i32):
      records[s, 0, k] = k-th distinct label in strip s (ascending),
      records[s, 1, k] = its pixel count within the strip,
      valid only for k < used[s] — later slots are UNINITIALIZED;
      truncated[s] = 1 when the strip held more than `rounds` labels."""
    h, w = labels.shape
    hp = -(-h // strip_rows) * strip_rows
    wp = -(-w // 128) * 128
    lp = jnp.full((hp, wp), -1, jnp.int32).at[:h, :w].set(labels)
    n_strips = hp // strip_rows
    out, meta = pl.pallas_call(
        functools.partial(_counts_kernel, rounds=rounds),
        grid=(n_strips,),
        in_specs=[pl.BlockSpec((strip_rows, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 2, rounds), lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_strips, 2, rounds), jnp.int32),
                   jax.ShapeDtypeStruct((n_strips, 1, 2), jnp.int32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(lp)
    return out, meta[:, 0, 0], meta[:, 0, 1]
