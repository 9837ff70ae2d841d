"""Thresholding: global, Otsu, adaptive (mean-kernel + delta).

Reference: base/image/compv_image_threshold.cxx; Otsu per
compv_image.h:63, adaptive per the reference's mean-kernel+delta form
(speed_compare:123-133 benchmarks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from compv_tpu.image.histogram import histogram256
from compv_tpu.image.integral import box_mean_var
from compv_tpu.ops.conv import convolve_separable

__all__ = ["threshold_global", "otsu_value", "threshold_otsu",
           "threshold_adaptive", "threshold_wolf"]


def threshold_global(img: jax.Array, thresh, maxval: int = 255,
                     inverse: bool = False) -> jax.Array:
    """u8 in -> u8 binary out: out = (v > thresh) ? maxval : 0."""
    m = img.astype(jnp.int32) > jnp.asarray(thresh, jnp.int32)
    if inverse:
        m = ~m
    return jnp.where(m, jnp.uint8(maxval), jnp.uint8(0))


def otsu_value(img: jax.Array) -> jax.Array:
    """Otsu's threshold from the 256-bin histogram (maximize between-class
    variance), as in the reference's histogram-based Otsu."""
    hist = histogram256(img).astype(jnp.float32)
    total = jnp.sum(hist)
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)                      # class-0 weight per threshold t
    sum0 = jnp.cumsum(hist * bins)
    sum_all = sum0[-1]
    w1 = total - w0
    mu0 = sum0 / jnp.maximum(w0, 1e-9)
    mu1 = (sum_all - sum0) / jnp.maximum(w1, 1e-9)
    between = w0 * w1 * (mu0 - mu1) ** 2
    between = jnp.where((w0 > 0) & (w1 > 0), between, -1.0)
    return jnp.argmax(between).astype(jnp.int32)


def threshold_otsu(img: jax.Array, maxval: int = 255):
    """Returns (binary u8 image, otsu threshold)."""
    t = otsu_value(img)
    return threshold_global(img, t, maxval), t


def threshold_adaptive(img: jax.Array, block_size: int = 5, delta: float = 8.0,
                       maxval: int = 255, inverse: bool = False) -> jax.Array:
    """Adaptive mean threshold: out = (v > mean_{block} - delta) ? maxval : 0
    (reference adaptive-threshold kernel, speed_compare:123-127). Uses a
    box mean via separable convolution with replicate borders."""
    k = jnp.full((block_size,), 1.0 / block_size, jnp.float32)
    mean = convolve_separable(img, k, k, border="replicate")
    m = img.astype(jnp.float32) > (mean - delta)
    if inverse:
        m = ~m
    return jnp.where(m, jnp.uint8(maxval), jnp.uint8(0))


def threshold_wolf(img: jax.Array, block_size: int = 41, k: float = 0.5,
                   maxval: int = 255) -> jax.Array:
    """Wolf-Jolion local binarization (reference benchmark
    speed_compare:66-70): T = (1-k)*m + k*M + k*(s/R)*(m - M) with local
    mean m, local stddev s, global min M, R = max local stddev. Local
    moments from centered int32 prefix sums (integral.box_mean_var) — exact
    and ~40x cheaper than the two 41-tap convolutions it replaces (windows
    are clipped at the borders, matching prefix-sum box filters)."""
    mean, var = box_mean_var(img, block_size)
    std = jnp.sqrt(var)
    f = img.astype(jnp.float32)
    m_glob = jnp.min(f)
    r = jnp.maximum(jnp.max(std), 1e-9)
    t = (1.0 - k) * mean + k * m_glob + k * (std / r) * (mean - m_glob)
    return jnp.where(f > t, jnp.uint8(maxval), jnp.uint8(0))
