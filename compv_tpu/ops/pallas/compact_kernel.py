"""Pallas ragged row-compaction — the missing TPU primitive behind run
extraction (ROOFLINE.md ccl-box analysis: the R-record sort is padded 3.4x
because rows hold <= K records at ~38 mean; XLA offers no scatter-free way
to concatenate the ragged prefixes).

Each row i of a (H, K) record table owns `counts[i]` valid records in its
first slots. The kernel copies each row's first ceil(counts/8)*8 records
(8-aligned so every store is a (1, 8) sublane write into a (Rc8, 8)
output) to its exclusive-cumsum offset. Rows are processed in grid order,
so the tail slack of row i (< 8 sentinel records) is part of the aligned
copy and stays initialized. Slots >= the ragged total are masked to a
sentinel by the caller.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["compact_rows"]


def _kernel(off8_ref, nch_ref, a_ref, b_ref, oa_ref, ob_ref, *, rows):
    g = pl.program_id(0)

    def row_body(r, _):
        i = g * rows + r
        off = off8_ref[i]
        nch = nch_ref[i]

        def blk(j, __):
            # inputs are (rows, K/8, 8): the 8-block index j lives in the
            # sublane dim (dynamic LANE offsets are not addressable)
            oa_ref[pl.dslice(off + j, 1), :] = a_ref[r, j].reshape(1, 8)
            ob_ref[pl.dslice(off + j, 1), :] = b_ref[r, j].reshape(1, 8)
            return __

        return jax.lax.fori_loop(0, nch, blk, _)

    jax.lax.fori_loop(0, rows, row_body, 0)


@functools.partial(jax.jit, static_argnames=("cap8", "rows_per_step"))
def compact_rows(a: jax.Array, b: jax.Array, counts: jax.Array,
                 cap8: int, rows_per_step: int = 8):
    """Compact two aligned (H, K) i32 record tables by their per-row valid
    counts. Returns (a_flat (cap8*8,), b_flat (cap8*8,), total (,) i32,
    ok (,) bool). Records beyond each row's count but inside its 8-aligned
    copy come from the input (callers pre-fill sentinels); slots >= total
    are NOT initialized — mask on total. ok=False when the ragged total
    exceeds the capacity (caller must fall back)."""
    h, k = a.shape
    assert k % 8 == 0, "record width must be a multiple of 8"
    hp = -(-h // rows_per_step) * rows_per_step
    padr = ((0, hp - h), (0, 0))
    a_p = jnp.pad(a, padr).reshape(hp, k // 8, 8)
    b_p = jnp.pad(b, padr).reshape(hp, k // 8, 8)
    nch = -(-jnp.minimum(counts, k) // 8)
    nch = jnp.pad(nch, (0, hp - h))
    off8 = jnp.cumsum(nch) - nch
    total8 = off8[-1] + nch[-1]
    ok = total8 <= cap8
    # clamp offsets so an overflowing frame still writes in-bounds (its
    # result is discarded via ok=False)
    off8 = jnp.minimum(off8, cap8 - jnp.maximum(nch, 1))
    off8 = jnp.maximum(off8, 0).astype(jnp.int32)

    grid = hp // rows_per_step
    oa, ob = pl.pallas_call(
        functools.partial(_kernel, rows=rows_per_step),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((rows_per_step, k // 8, 8),
                             lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((rows_per_step, k // 8, 8),
                             lambda i, *_: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((cap8, 8), lambda i, *_: (0, 0)),
                pl.BlockSpec((cap8, 8), lambda i, *_: (0, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((cap8, 8), jnp.int32),
                   jax.ShapeDtypeStruct((cap8, 8), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(off8, nch.astype(jnp.int32), a_p, b_p)
    return oa.reshape(-1), ob.reshape(-1), total8 * 8, ok
