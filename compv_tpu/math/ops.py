"""Element-wise math ops, casts, activations, moments, trig, fast exp.

Reference: base/math/compv_math_op_*.cxx (add/sub/mul, minmax, clip, scale),
compv_math_cast.cxx (s16<->f32 etc.), activation functions (tanh/logistic
for ML), compv_math_exp.cxx (vectorized exp), compv_math_trig.h:22-35
(fastAtan2, hypot), image moments. On TPU all of these are single fused XLA
elementwise programs; they exist as named functions for API parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["add", "sub", "mul_elementwise", "abs_", "minmax", "clip",
           "scale_values", "cast", "tanh_activation", "logistic_activation",
           "relu", "fast_exp", "fast_atan2_deg", "hypot_", "image_moments",
           "hu_moments"]


def add(a, b):
    return jnp.add(a, b)


def sub(a, b):
    return jnp.subtract(a, b)


def mul_elementwise(a, b):
    return jnp.multiply(a, b)


def abs_(a):
    return jnp.abs(a)


def minmax(a):
    """(min, max) of an array (reference CompVMathOpMinMax)."""
    return jnp.min(a), jnp.max(a)


def clip(a, lo, hi):
    return jnp.clip(a, lo, hi)


def scale_values(a, s):
    return a * s


def cast(a, dtype):
    """Saturating cast for integer targets (reference compv_math_cast)."""
    if jnp.issubdtype(dtype, jnp.integer):
        info = jnp.iinfo(dtype)
        return jnp.clip(jnp.round(a.astype(jnp.float32)), info.min, info.max
                        ).astype(dtype)
    return a.astype(dtype)


def tanh_activation(a):
    """(reference activation-function kernels for ML)."""
    return jnp.tanh(a)


def logistic_activation(a):
    return jax.nn.sigmoid(a)


def relu(a):
    return jnp.maximum(a, 0)


def fast_exp(a):
    """Vectorized exp (reference compv_math_exp fast exp; XLA's exp is
    already the VPU transcendental)."""
    return jnp.exp(a)


def fast_atan2_deg(y, x):
    """atan2 in degrees [0, 360) (reference fastAtan2 used by HOG/Canny)."""
    d = jnp.rad2deg(jnp.arctan2(y, x))
    return jnp.where(d < 0, d + 360.0, d)


def hypot_(x, y):
    return jnp.hypot(x, y)


def image_moments(img: jax.Array, order: int = 2) -> dict:
    """Raw image moments m_pq up to ``order`` (reference moments kernels,
    base/math/compv_math_moments.cxx)."""
    f = img.astype(jnp.float32)
    h, w = f.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    out = {}
    for p in range(order + 1):
        for q in range(order + 1 - p):
            out[f"m{p}{q}"] = jnp.sum(f * xs ** p * ys ** q)
    return out


def hu_moments(img: jax.Array) -> jax.Array:
    """First 4 Hu invariant moments (rotation/translation/scale invariant)."""
    m = image_moments(img, 3)
    m00 = jnp.maximum(m["m00"], 1e-9)
    cx = m["m10"] / m00
    cy = m["m01"] / m00
    f = img.astype(jnp.float32)
    h, w = f.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx

    def mu(p, q):
        return jnp.sum(f * xs ** p * ys ** q)

    def nu(p, q):
        return mu(p, q) / m00 ** (1 + (p + q) / 2.0)

    n20, n02, n11 = nu(2, 0), nu(0, 2), nu(1, 1)
    n30, n03, n21, n12 = nu(3, 0), nu(0, 3), nu(2, 1), nu(1, 2)
    h1 = n20 + n02
    h2 = (n20 - n02) ** 2 + 4 * n11 ** 2
    h3 = (n30 - 3 * n12) ** 2 + (3 * n21 - n03) ** 2
    h4 = (n30 + n12) ** 2 + (n21 + n03) ** 2
    return jnp.stack([h1, h2, h3, h4])
