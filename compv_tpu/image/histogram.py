"""Histogram ops: 256-bin build, equalization, axis projections.

Reference: CompVMathHistogram (base/math/compv_math_histogram.cxx) — SIMD
bin-count kernels; TPU-native formulation: one-hot bincount via segment-sum
(XLA scatter-add) or the matmul trick for batched histograms.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["histogram256", "equalize", "projection_x", "projection_y"]


def histogram256(img: jax.Array) -> jax.Array:
    """(..., H, W) u8 -> (..., 256) i32 counts."""
    flat = img.reshape(*img.shape[:-2], -1).astype(jnp.int32)
    def one(v):
        return jnp.zeros((256,), jnp.int32).at[v].add(1)
    if flat.ndim == 1:
        return one(flat)
    return jax.vmap(one)(flat.reshape(-1, flat.shape[-1])).reshape(*img.shape[:-2], 256)


def equalize(img: jax.Array) -> jax.Array:
    """Histogram equalization, u8 (reference equalization benchmark
    speed_compare:54-58): out = round(cdf(v) * 255 / npixels)."""
    h, w = img.shape[-2:]
    hist = histogram256(img)
    cdf = jnp.cumsum(hist, axis=-1)
    # OpenCV-style: scale by (255 / total)
    lut = jnp.clip(jnp.round(cdf.astype(jnp.float32) * (255.0 / (h * w))), 0, 255
                   ).astype(jnp.uint8)
    if img.ndim == 2:
        return lut[img.astype(jnp.int32)]
    return jnp.take_along_axis(
        lut.reshape(*img.shape[:-2], 256).reshape(-1, 256),
        img.reshape(-1, h * w).astype(jnp.int32), axis=-1
    ).reshape(img.shape).astype(jnp.uint8)


def projection_x(img: jax.Array) -> jax.Array:
    """Column sums (reference CompVMathHistogram projection kernels)."""
    return jnp.sum(img.astype(jnp.int32), axis=-2)


def projection_y(img: jax.Array) -> jax.Array:
    return jnp.sum(img.astype(jnp.int32), axis=-1)
