"""Separable & 2-D convolution + Gaussian kernel builders.

Reference: CompVMathConvlt (base/include/compv/base/math/compv_math_convlt.h:26-98,
header-only template dispatching to per-ISA SIMD) and CompVMathGauss
(base/math/compv_math_gauss.cxx). The reference threads row bands with
overlap; on TPU the whole convolution is one XLA conv_general_dilated (which
maps onto MXU for wide kernels and fuses for small ones).

Border mode matches the reference's default for its vision kernels: replicate
is NOT used — CompV uses ZERO or IGNORE (compv_math_convlt.h border modes);
we expose 'zero' (default) and 'replicate'.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_kernel1d", "gaussian_kernel2d", "convolve_separable",
           "convolve2d", "gaussian_blur"]


def gaussian_kernel1d(size: int, sigma: float) -> jax.Array:
    """Normalized 1-D Gaussian (reference CompVMathGauss::kernelDim1,
    used by the ORB descriptor with size=5 sigma=2.0, orb_desc.cxx:119-120)."""
    assert size % 2 == 1
    half = size // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return jnp.asarray(k, jnp.float32)


def gaussian_kernel2d(size: int, sigma: float) -> jax.Array:
    k = np.asarray(gaussian_kernel1d(size, sigma))
    return jnp.asarray(np.outer(k, k), jnp.float32)


def _pad2d(img_f: jax.Array, ph: int, pw: int, border: str) -> jax.Array:
    if border == "zero":
        return jnp.pad(img_f, ((ph, ph), (pw, pw)))
    if border == "replicate":
        return jnp.pad(img_f, ((ph, ph), (pw, pw)), mode="edge")
    raise ValueError(border)


def convolve_separable(img: jax.Array, kh: jax.Array, kv: jax.Array,
                       border: str = "zero") -> jax.Array:
    """Separable convolution: horizontal pass with ``kh`` then vertical with
    ``kv`` (reference convlt1, compv_math_convlt.h:26-44). Returns float32;
    callers quantize to u8 if needed. Works on (H,W) or batched (...,H,W)."""
    f = img.astype(jnp.float32)
    khn = kh.shape[0] // 2
    kvn = kv.shape[0] // 2
    batch_shape = f.shape[:-2]
    h, w = f.shape[-2:]
    x = f.reshape((-1, 1, h, w))

    wk_h = kh.astype(jnp.float32).reshape(1, 1, 1, -1)
    wk_v = kv.astype(jnp.float32).reshape(1, 1, -1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, wk_h.shape, ("NCHW", "OIHW", "NCHW"))
    if border == "replicate":
        x = jnp.pad(x, ((0, 0), (0, 0), (kvn, kvn), (khn, khn)), mode="edge")
        y = jax.lax.conv_general_dilated(x, wk_h, (1, 1), "VALID", dimension_numbers=dn)
        y = jax.lax.conv_general_dilated(y, wk_v, (1, 1), "VALID", dimension_numbers=dn)
    else:
        y = jax.lax.conv_general_dilated(x, wk_h, (1, 1), [(0, 0), (khn, khn)], dimension_numbers=dn)
        y = jax.lax.conv_general_dilated(y, wk_v, (1, 1), [(kvn, kvn), (0, 0)], dimension_numbers=dn)
    return y.reshape(*batch_shape, h, w)


def convolve2d(img: jax.Array, kernel: jax.Array, border: str = "zero") -> jax.Array:
    """Dense 2-D convolution (reference convlt2). ``kernel`` is (kh, kw),
    correlation convention (no flip) like the reference."""
    f = img.astype(jnp.float32)
    batch_shape = f.shape[:-2]
    h, w = f.shape[-2:]
    x = f.reshape((-1, 1, h, w))
    kh, kw = kernel.shape
    wk = kernel.astype(jnp.float32).reshape(1, 1, kh, kw)
    dn = jax.lax.conv_dimension_numbers(x.shape, wk.shape, ("NCHW", "OIHW", "NCHW"))
    if border == "replicate":
        x = jnp.pad(x, ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)), mode="edge")
        y = jax.lax.conv_general_dilated(x, wk, (1, 1), "VALID", dimension_numbers=dn)
    else:
        y = jax.lax.conv_general_dilated(x, wk, (1, 1),
                                         [(kh // 2, kh // 2), (kw // 2, kw // 2)],
                                         dimension_numbers=dn)
    return y.reshape(*batch_shape, h, w)


def gaussian_blur(img: jax.Array, size: int = 5, sigma: float = 2.0,
                  border: str = "zero") -> jax.Array:
    """Gaussian blur; u8 in -> u8 out (round-clamp), float in -> float out.
    Reference: gaussian blur benchmark speed_compare:109-114 and the ORB
    descriptor pre-blur (orb_desc.cxx:197-201)."""
    k = gaussian_kernel1d(size, sigma)
    out = convolve_separable(img, k, k, border)
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out.astype(img.dtype)
