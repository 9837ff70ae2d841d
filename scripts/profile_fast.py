"""On-chip stage profiling for the FAST pipeline (slope-timed, same
methodology as bench.py). Not part of the test suite."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from compv_tpu.features.fast import fast_nms, fast_strengths
from compv_tpu.ops.pallas.fast_kernel import fast_strengths_nms_pallas
from compv_tpu.ops.topk import select_top_k

h, w = 720, 1282
rs = np.random.default_rng(0)
yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
img = 96 + 48 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0)
ch = ((xx // 24).astype(int) + (yy // 24).astype(int)) % 2
img = np.where((xx > 300) & (xx < 1000) & (yy > 150) & (yy < 570),
               ch * 200.0 + 20, img)
img = np.clip(img + rs.normal(0, 2.0, img.shape), 0, 255).astype(np.uint8)
x = jnp.asarray(img)


def slope_time(fn, r1=10, r2=60):
    """fn: im -> (scalar, perturbed-im-seed scalar). Loops on device."""
    @jax.jit
    def bench(im, reps):
        def body(i, carry):
            acc, cur = carry
            sv, si = fn(cur)
            delta = (si % 2).astype(jnp.uint8)
            cur = cur.at[0, 0].set(cur[0, 0] + delta)
            return acc + sv, cur
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), im))
        return acc

    _ = float(bench(x, jnp.int32(1)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(bench(x, jnp.int32(r1)))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(bench(x, jnp.int32(r2)))
        tb = time.perf_counter() - t0
        per = (tb - ta) / (r2 - r1)
        if 0 < per < best:
            best = per
    return best


def strengths_only(im):
    s = fast_strengths(im, 20, 9)
    v = jnp.sum(s.astype(jnp.int32))
    return v.astype(jnp.float32), v


def strengths_nms(im):
    s = fast_nms(fast_strengths(im, 20, 9))
    v = jnp.sum(s.astype(jnp.int32))
    return v.astype(jnp.float32), v


def full(im):
    s = fast_nms(fast_strengths(im, 20, 9))
    vals, idx = select_top_k(s.astype(jnp.float32).ravel(), 2000)
    return jnp.sum(vals), jnp.sum(idx)


def pallas_nms(im):
    s = fast_strengths_nms_pallas(im, 20, 9, True)
    v = jnp.sum(s.astype(jnp.int32))
    return v.astype(jnp.float32), v


def pallas_full(im):
    s = fast_strengths_nms_pallas(im, 20, 9, True)
    vals, idx = select_top_k(s.astype(jnp.float32).ravel(), 2000)
    return jnp.sum(vals), jnp.sum(idx)


def topk_only(im):
    vals, idx = select_top_k(im.astype(jnp.float32).ravel(), 2000)
    return jnp.sum(vals), jnp.sum(idx)


for name, fn in [("strengths", strengths_only),
                 ("strengths+nms", strengths_nms),
                 ("full(topk)", full),
                 ("pallas s+nms", pallas_nms),
                 ("pallas full", pallas_full),
                 ("topk alone", topk_only)]:
    t = slope_time(fn)
    print(f"{name:16s} {t*1e6:9.1f} us/frame   {1.0/t:9.1f} fps")
