"""Core pytree container types.

Replaces the reference's CompVInterestPoint / CompVDMatch structs
(base/include/compv/base/compv_common.h:629-656,
core/include/compv/core/compv_core_common.h) with fixed-capacity, masked,
batch-first pytrees — the idiomatic static-shape representation for XLA.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Keypoints(NamedTuple):
    """Fixed-capacity set of interest points.

    All fields have leading dimension ``capacity``; entries with
    ``valid == False`` are padding. Mirrors CompVInterestPoint
    {x, y, strength, orient, level, size} (compv_common.h:629-637) but as a
    struct-of-arrays so each field lives in its own lane-friendly vector.
    """

    x: jax.Array          # (K,) f32 — level-0 pixel coords
    y: jax.Array          # (K,) f32
    strength: jax.Array   # (K,) f32 — detector response
    orientation: jax.Array  # (K,) f32 — degrees [0, 360)
    level: jax.Array      # (K,) i32 — pyramid level
    size: jax.Array       # (K,) f32 — patch diameter at level 0
    valid: jax.Array      # (K,) bool

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid, axis=-1)

    @staticmethod
    def empty(capacity: int) -> "Keypoints":
        z = jnp.zeros((capacity,), jnp.float32)
        return Keypoints(
            x=z, y=z, strength=z, orientation=z,
            level=jnp.zeros((capacity,), jnp.int32),
            size=jnp.full((capacity,), 7.0, jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )

    def select_best(self, k: int) -> "Keypoints":
        """Keep the ``k`` strongest points (reference: selectBest nth_element
        top-K, compv_common.h:641-656). Returns a new Keypoints of capacity k,
        sorted by decreasing strength."""
        s = jnp.where(self.valid, self.strength, -jnp.inf)
        _, idx = jax.lax.top_k(s, k)
        take = lambda a: jnp.take(a, idx, axis=-1)
        return Keypoints(
            x=take(self.x), y=take(self.y), strength=take(self.strength),
            orientation=take(self.orientation), level=take(self.level),
            size=take(self.size), valid=take(self.valid),
        )

    def erase_near_border(self, width: int, height: int,
                          border_x: float, border_y: float) -> "Keypoints":
        """Invalidate points whose patch crosses the image border
        (reference: eraseTooCloseToBorder, compv_common.h:657-668)."""
        ok = ((self.x >= border_x) & (self.y >= border_y)
              & (self.x < width - border_x) & (self.y < height - border_y))
        return self._replace(valid=self.valid & ok)


class Matches(NamedTuple):
    """KNN match result: for each of Nq query descriptors the K best train
    indices and distances. Mirrors CompVDMatch (queryIdx/trainIdx/distance)
    as a dense (K, Nq) layout like the reference matcher's output Mat
    (core/matchers/compv_core_matcher_bruteforce.cxx:141-239)."""

    train_idx: jax.Array  # (K, Nq) i32
    distance: jax.Array   # (K, Nq) f32  (Hamming distance is integral)
    valid: jax.Array      # (K, Nq) bool


class Lines(NamedTuple):
    """Fixed-capacity set of polar lines (rho, theta, strength) — output of
    Hough transforms (reference CompVHoughLine, compv_common.h:605-627)."""

    rho: jax.Array       # (L,) f32
    theta: jax.Array     # (L,) f32 radians
    strength: jax.Array  # (L,) f32
    valid: jax.Array     # (L,) bool

    def count(self) -> jax.Array:
        return jnp.sum(self.valid, axis=-1)
