"""Careful A/B: baseline vs barrier composition, median-of-many slopes,
interleaved to cancel tunnel drift."""
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
img = np.where((xx > 300) & (xx < 1000) & (yy > 150) & (yy > 150) & (yy < 570),
               ch * 200.0 + 20, img)
img = np.clip(img + rs.normal(0, 2.0, img.shape), 0, 255).astype(np.uint8)
x = jnp.asarray(img)
K = 2000


def make_bench(fn):
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
    return bench


def v_baseline(im):
    s = fast_nms(fast_strengths(im, 20, 9))
    vals, idx = jax.lax.approx_max_k(s.astype(jnp.float32).ravel(), K)
    return jnp.sum(vals), jnp.sum(idx)


def v_barrier(im):
    s = fast_nms(fast_strengths(im, 20, 9))
    s = jax.lax.optimization_barrier(s)
    vals, idx = jax.lax.approx_max_k(s.astype(jnp.float32).ravel(), K)
    return jnp.sum(vals), jnp.sum(idx)


benches = {"baseline": make_bench(v_baseline), "barrier": make_bench(v_barrier)}
for name, b in benches.items():
    _ = float(b(x, jnp.int32(1)))  # compile

# interleave A/B, many slope samples
slopes = {"baseline": [], "barrier": []}
R1, R2 = 100, 1100
for trial in range(5):
    for name, b in benches.items():
        t0 = time.perf_counter(); float(b(x, jnp.int32(R1)))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(b(x, jnp.int32(R2)))
        tb = time.perf_counter() - t0
        slopes[name].append((tb - ta) / (R2 - R1))

for name, ss in slopes.items():
    ss = sorted(ss)
    med = ss[len(ss) // 2]
    print(f"{name:10s} median {med*1e6:8.1f} us  min {ss[0]*1e6:8.1f}  "
          f"max {ss[-1]*1e6:8.1f}  fps(med) {1.0/med:9.1f}")
