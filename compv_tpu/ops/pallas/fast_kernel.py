"""Pallas TPU kernel: fused FAST strengths + 3x3 NMS.

Replaces the reference's FastDataRow/NmsGather/NmsApply SIMD chain
(core/features/fast/compv_core_feature_fast_dete.cxx:658,773 + asm) with one
VMEM-resident pass: each grid step DMAs a row slab (tile + 8 halo rows) from
HBM, computes the 16-neighbor circle diffs, circular-window arc minima
(log-depth doubling), per-pixel strength, and 3x3 NMS — one HBM read and
one HBM write per pixel, the kernel's roofline.

Semantics are bit-identical to features/fast.fast_strengths + fast_nms
(verified by the parity tests in tests/test_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compv_tpu.features.fast import CIRCLE_OFFSETS

__all__ = ["fast_strengths_nms_pallas"]

_TILE_H = 64
_LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(img_ref, out_ref, slab, sem, *, th, wp, w, h, threshold, n,
            do_nms):
    t = pl.program_id(0)

    dma = pltpu.make_async_copy(img_ref.at[pl.ds(t * th, th + 8)], slab, sem)
    dma.start()
    dma.wait()

    x = slab[...].astype(jnp.int32)             # (th+8, wp)

    # strengths for local rows 3 .. th+4 (th+2 rows)
    center = x[3:th + 5, :]
    brighter = jnp.minimum(center + threshold, 255)
    darker = jnp.maximum(center - threshold, 0)

    def circle_view(dy, dx):
        rows = x[3 + dy: 3 + dy + th + 2, :]
        if dx == 0:
            return rows
        return pltpu.roll(rows, (-dx) % wp, axis=1)

    d_list = []
    b_list = []
    for (dy, dx) in CIRCLE_OFFSETS:
        c = circle_view(dy, dx)
        d_list.append(jnp.maximum(darker - c, 0))
        b_list.append(jnp.maximum(c - brighter, 0))

    def arc_strength_exact(vals):
        # window-min by doubling over the *running-min arrays* (correct form)
        m = list(vals)
        span = 1
        while span < n:
            step = min(span, n - span)
            m = [jnp.minimum(m[k], m[(k + step) % 16]) for k in range(16)]
            span += step
        out = m[0]
        for k in range(1, 16):
            out = jnp.maximum(out, m[k])
        return out

    strength = jnp.maximum(arc_strength_exact(d_list),
                           arc_strength_exact(b_list))   # (th+2, wp)

    # interior masking: global row in [3, h-3), col in [3, w-3)
    local_rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp), 0)
    grow = t * th + local_rows - 1           # global row of each strengths row
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp), 1)
    interior = ((grow >= 3) & (grow < h - 3) & (cols >= 3) & (cols < w - 3))
    strength = jnp.where(interior, strength, 0)

    if do_nms:
        s = strength
        center_s = s[1:th + 1, :]
        neigh = []
        for dy in (-1, 0, 1):
            rows = s[1 + dy: 1 + dy + th, :]
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                neigh.append(rows if dx == 0 else pltpu.roll(rows, (-dx) % wp, axis=1))
        nmax = neigh[0]
        for v in neigh[1:]:
            nmax = jnp.maximum(nmax, v)
        keep = (center_s > 0) & (nmax < center_s)
        out = jnp.where(keep, center_s, 0)
    else:
        out = strength[1:th + 1, :]

    out_ref[...] = out.astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("threshold", "n", "nms", "interpret"))
def fast_strengths_nms_pallas(img: jax.Array, threshold: int = 20, n: int = 9,
                              nms: bool = True,
                              interpret: bool = False) -> jax.Array:
    """(H, W) u8 -> (H, W) u8 strengths map (NMS applied when nms=True)."""
    h, w = img.shape
    hp = _round_up(h, _TILE_H)
    wp = _round_up(w, _LANES)
    # pad: 4 halo rows top, 4 + tile padding bottom, lanes to wp
    padded = jnp.pad(img, ((4, 4 + (hp - h)), (0, wp - w)))

    kernel = functools.partial(_kernel, th=_TILE_H, wp=wp, w=w, h=h,
                               threshold=threshold, n=n, do_nms=nms)
    out = pl.pallas_call(
        kernel,
        grid=(hp // _TILE_H,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_TILE_H, wp), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((_TILE_H + 8, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out[:h, :w]
