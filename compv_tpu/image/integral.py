"""Summed-area tables (integral images).

Reference: base/image/compv_image_integral.cxx (SSSE3 kernels). On TPU the
natural formulation is two cumulative sums — XLA lowers cumsum to an
efficient parallel scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["integral", "integral_squared", "box_sum"]


def integral(img: jax.Array, dtype=jnp.float64) -> jax.Array:
    """Integral image with a leading zero row/col: out shape (H+1, W+1),
    out[i,j] = sum(img[:i,:j]). f64 by default off-TPU; on TPU pass
    jnp.float32 or jnp.int32 for u8 inputs (exact up to 2^31)."""
    if dtype == jnp.float64 and not jax.config.read("jax_enable_x64"):
        dtype = jnp.int32 if jnp.issubdtype(img.dtype, jnp.integer) else jnp.float32
    s = jnp.cumsum(jnp.cumsum(img.astype(dtype), axis=-2), axis=-1)
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 0), (1, 0)]
    return jnp.pad(s, pad)


def integral_squared(img: jax.Array, dtype=jnp.float64) -> jax.Array:
    if dtype == jnp.float64 and not jax.config.read("jax_enable_x64"):
        dtype = jnp.float32
    f = img.astype(dtype)
    return integral(f * f, dtype)


def box_sum(int_img: jax.Array, size: int) -> jax.Array:
    """Sliding size x size window sums from an integral image (the standard
    SAT query). Output shape (H - size + 1, W - size + 1)."""
    a = int_img[..., size:, size:]
    b = int_img[..., size:, :-size]
    c = int_img[..., :-size, size:]
    d = int_img[..., :-size, :-size]
    return a - b - c + d
