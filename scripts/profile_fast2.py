"""Variants of strengths+nms+topk composition (slope-timed on chip)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from compv_tpu.features.fast import fast_nms, fast_strengths

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


K = 2000


def v_barrier(im):
    s = fast_nms(fast_strengths(im, 20, 9))
    s = jax.lax.optimization_barrier(s)
    vals, idx = jax.lax.approx_max_k(s.astype(jnp.float32).ravel(), K)
    return jnp.sum(vals), jnp.sum(idx)


def v_rowwise(im):
    """Per-row approx top-8 (batched hardware reduce), then exact top-K over
    720*8 candidates."""
    s = fast_nms(fast_strengths(im, 20, 9))
    sf = s.astype(jnp.float32)
    rv, ri = jax.lax.approx_max_k(sf, 8)           # (720, 8)
    rows = jax.lax.broadcasted_iota(jnp.int32, rv.shape, 0)
    gidx = rows * w + ri
    vals, ci = jax.lax.top_k(rv.ravel(), K)
    idx = gidx.ravel()[ci]
    return jnp.sum(vals), jnp.sum(idx)


def v_rowwise32(im):
    s = fast_nms(fast_strengths(im, 20, 9))
    sf = s.astype(jnp.float32)
    rv, ri = jax.lax.approx_max_k(sf, 32)          # (720, 32)
    rows = jax.lax.broadcasted_iota(jnp.int32, rv.shape, 0)
    gidx = rows * w + ri
    vals, ci = jax.lax.top_k(rv.ravel(), K)
    idx = gidx.ravel()[ci]
    return jnp.sum(vals), jnp.sum(idx)


def v_packed(im):
    """Pack (strength, index) into one f32 key: s * 2^20 + idx. u8 strengths
    and idx < 2^20 both fit f32's 24-bit mantissa exactly. One pass, exact
    recovery of both, no gather."""
    s = fast_nms(fast_strengths(im, 20, 9))
    flat = s.astype(jnp.float32).ravel()
    n = flat.shape[0]
    iota = jax.lax.iota(jnp.float32, n)
    key = flat * (1 << 20) + (jnp.float32(n) - iota)
    vals, _ = jax.lax.approx_max_k(key, K)
    sv = jnp.floor(vals / (1 << 20))
    idx = jnp.float32(n) - (vals - sv * (1 << 20))
    return jnp.sum(sv), jnp.sum(idx).astype(jnp.int32)


def v_baseline(im):
    s = fast_nms(fast_strengths(im, 20, 9))
    vals, idx = jax.lax.approx_max_k(s.astype(jnp.float32).ravel(), K)
    return jnp.sum(vals), jnp.sum(idx)


for name, fn in [("baseline", v_baseline),
                 ("barrier", v_barrier),
                 ("rowwise8", v_rowwise),
                 ("rowwise32", v_rowwise32),
                 ("packedkey", v_packed)]:
    t = slope_time(fn)
    print(f"{name:12s} {t*1e6:9.1f} us/frame   {1.0/t:9.1f} fps")
