"""Batched weighted bincount on the MXU — the scatter-free accumulator.

Scatter-add is pathological on TPU (~60 ns per element); voting/accumulator
algorithms (Hough, cell histograms) become matmuls instead:

    acc[a, b] = sum_e w[a, e] * [bins[a, e] == b]

Split b into (hi = b // 128, lo = b % 128). Then per batch row a

    acc[a, hi, lo] = sum_e (w * [bin_hi == hi])[a, e] * onehot_lo[a, e, lo]

— ONE int8 x int8 -> int32 dot_general per theta-chunk, batched over a.
Integer weights stay exact; callers with fractional weights scale to
integers (e.g. x2) and divide after.

Used by features/hough (SHT dense voting, KHT kernel voting).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["batched_weighted_bincount"]

_LANES = 128


@partial(jax.jit, static_argnames=("n_bins", "chunk_a"))
def batched_weighted_bincount(bins: jax.Array, weights: jax.Array,
                              n_bins: int, chunk_a: int = 4) -> jax.Array:
    """(A, E) i32 bins in [0, n_bins), (A, E) u8/i32 integer weights ->
    (A, n_bins) i32 weighted counts. Rows are independent histograms."""
    a_dim, e_dim = bins.shape
    n_hi = -(-n_bins // _LANES)
    pad_a = -a_dim % chunk_a
    if pad_a:
        bins = jnp.pad(bins, ((0, pad_a), (0, 0)))
        weights = jnp.pad(weights, ((0, pad_a), (0, 0)))
    nc = bins.shape[0] // chunk_a

    hi = (bins // _LANES).astype(jnp.int32)
    lo = (bins % _LANES).astype(jnp.int32)
    w8 = weights.astype(jnp.int8)

    hi_c = hi.reshape(nc, chunk_a, e_dim)
    lo_c = lo.reshape(nc, chunk_a, e_dim)
    w_c = w8.reshape(nc, chunk_a, e_dim)

    iota_hi = jnp.arange(n_hi, dtype=jnp.int32)
    iota_lo = jnp.arange(_LANES, dtype=jnp.int32)

    def step(carry, inp):
        h, l, w = inp                                    # (C, E) each
        lhs = (jnp.equal(h[:, None, :], iota_hi[None, :, None])
               .astype(jnp.int8) * w[:, None, :])        # (C, n_hi, E)
        rhs = jnp.equal(l[:, :, None], iota_lo[None, None, :]
                        ).astype(jnp.int8)               # (C, E, LANES)
        out = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)            # (C, n_hi, LANES)
        return carry, out

    _, outs = jax.lax.scan(step, 0, (hi_c, lo_c, w_c))
    acc = outs.reshape(nc * chunk_a, n_hi * _LANES)[:a_dim, :n_bins]
    return acc
