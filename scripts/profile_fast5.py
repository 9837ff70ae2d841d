"""Batched-throughput variant: vmap the detector over B frames per loop
iteration. Long-loop slope timing; per-frame time = slope / B."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from compv_tpu.features.fast import _nms_f32, _strengths_f32

h, w = 720, 1282
rs = np.random.default_rng(0)
yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
img = 96 + 48 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0)
ch = ((xx // 24).astype(int) + (yy // 24).astype(int)) % 2
img = np.where((xx > 300) & (xx < 1000) & (yy > 150) & (yy < 570),
               ch * 200.0 + 20, img)
img = np.clip(img + rs.normal(0, 2.0, img.shape), 0, 255).astype(np.uint8)
K = 2000


def detect(im):
    s = _nms_f32(_strengths_f32(im, 20, 9))
    vals, idx = jax.lax.approx_max_k(s.ravel(), K)
    return jnp.sum(vals), jnp.sum(idx)


def run(batch):
    xb = jnp.asarray(np.broadcast_to(img, (batch, h, w)).copy()) if batch > 1 \
        else jnp.asarray(img)

    @jax.jit
    def bench(im, reps):
        def body(i, carry):
            acc, cur = carry
            if batch > 1:
                sv, si = jax.vmap(detect)(cur)
                sv, si = jnp.sum(sv), jnp.sum(si)
                delta = (si % 2).astype(jnp.uint8)
                cur = cur.at[0, 0, 0].set(cur[0, 0, 0] + delta)
            else:
                sv, si = detect(cur)
                delta = (si % 2).astype(jnp.uint8)
                cur = cur.at[0, 0].set(cur[0, 0] + delta)
            return acc + sv, cur
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), im))
        return acc

    _ = float(bench(xb, jnp.int32(1)))
    R1, R2 = max(100 // batch, 10), max(1100 // batch, 110)
    slopes = []
    for _t in range(3):
        t0 = time.perf_counter(); float(bench(xb, jnp.int32(R1)))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(bench(xb, jnp.int32(R2)))
        tb = time.perf_counter() - t0
        slopes.append((tb - ta) / (R2 - R1) / batch)
    med = sorted(slopes)[len(slopes) // 2]
    print(f"batch={batch:2d}  {med*1e6:8.1f} us/frame  {1.0/med:9.1f} fps")


for b in (1, 2, 4, 8):
    run(b)
