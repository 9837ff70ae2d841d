"""Point-set statistics used by robust estimation.

Reference: CompVMathStats (base/math/compv_math_stats.cxx):
normalize2D_hartley (centroid + sqrt(2)/mean-dist scaling), mse2D_homogeneous,
variance/stdev. Masked variants support fixed-capacity padded point sets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["hartley_normalize", "mse_2d", "masked_mean", "masked_variance"]


def masked_mean(x: jax.Array, mask: jax.Array, axis=None):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1e-9)


def masked_variance(x: jax.Array, mask: jax.Array, axis=None):
    mu = masked_mean(x, mask, axis)
    return masked_mean((x - mu) ** 2, mask, axis)


def hartley_normalize(pts_xy: jax.Array, mask: jax.Array):
    """Hartley normalization (compv_math_stats.cxx normalize2D_hartley):
    translate centroid to origin, scale so the mean distance is sqrt(2).

    pts_xy (N, 2), mask (N,) -> (normalized (N,2), T (3,3) with
    x_norm_h = T @ x_h)."""
    m = mask.astype(pts_xy.dtype)[:, None]
    n = jnp.maximum(jnp.sum(m), 1.0)
    centroid = jnp.sum(pts_xy * m, axis=0) / n
    centered = (pts_xy - centroid) * m
    dist = jnp.sqrt(jnp.sum(centered ** 2, axis=1))
    mean_dist = jnp.sum(dist) / n
    s = jnp.sqrt(2.0) / jnp.maximum(mean_dist, 1e-12)
    t = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], pts_xy.dtype)
    t = t.at[0, 0].set(s).at[1, 1].set(s)
    t = t.at[0, 2].set(-s * centroid[0]).at[1, 2].set(-s * centroid[1])
    return centered * s, t


def mse_2d(a_xy: jax.Array, b_xy: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean squared error between two (N, 2) point sets."""
    e = jnp.sum((a_xy - b_xy) ** 2, axis=1)
    return masked_mean(e, mask)
