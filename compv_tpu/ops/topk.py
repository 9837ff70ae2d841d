"""Top-k selection tuned for TPU.

jax.lax.top_k over ~1M elements lowers to a full sort on TPU (~1.2 ms at
720p — measured); jax.lax.approx_max_k lowers to the hardware PartialReduce
op and is ~free (recall ~0.95 at default config). Detection pipelines use
``select_top_k(..., exact=False)``: on CPU approx_max_k falls back to exact
(so the golden-test matrix stays bit-deterministic there), on TPU it trades
a few of the weakest keypoints for a millisecond per frame. Callers that
need exact semantics pass exact=True.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["select_top_k"]


def select_top_k(x: jax.Array, k: int, exact: bool = False):
    """(N,) values -> (values (k,), indices (k,)), descending."""
    if exact:
        return jax.lax.top_k(x, k)
    return jax.lax.approx_max_k(x, k)
