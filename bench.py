"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: FAST9+NMS corner detection throughput at 1282x720 (the
reference's flagship kernel benchmark: 3358 ms / 10k frames ~= 2977 fps on
an i7-4790K with AVX2 + 8 threads, speed_compare:73-80). vs_baseline is
our fps / 2977.

Methodology: the device is behind a high-latency tunnel and
block_until_ready is not a reliable completion barrier through it, so the
benchmark loops ON DEVICE — a fori_loop with a data dependency between
iterations (image perturbed by the previous result) runs the full detector
R times inside one XLA program, and the per-frame time is the slope
(T(R2) - T(R1)) / (R2 - R1), which cancels the tunnel round trip, dispatch
and compile overheads exactly. A checksum is read back so nothing can be
dead-code eliminated.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    if os.environ.get("BENCH_CPU") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
        r1, r2 = 2, 6
    else:
        import jax
        # long loops: the differential device time (~120 ms) must dominate
        # tunnel jitter for the slope to be stable (measured: r2=60 gives
        # +-60% scatter, r2=1100 gives +-5%)
        r1, r2 = 100, 1100

    import jax.numpy as jnp
    from compv_tpu.features.fast import _nms_f32, _strengths_f32
    from compv_tpu.ops.topk import select_top_k_2d

    h, w = 720, 1282
    rs = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 96 + 48 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0)
    ch = ((xx // 24).astype(int) + (yy // 24).astype(int)) % 2
    img = np.where((xx > 300) & (xx < 1000) & (yy > 150) & (yy < 570),
                   ch * 200.0 + 20, img)
    img = np.clip(img + rs.normal(0, 2.0, img.shape), 0, 255).astype(np.uint8)
    x = jnp.asarray(img)

    max_features = 2000

    def detect_sum(im):
        s = _nms_f32(_strengths_f32(im, 20, 9))
        vals, idx = select_top_k_2d(s, max_features)
        return jnp.sum(vals), jnp.sum(idx)

    @jax.jit
    def bench(im, reps):
        def body(i, carry):
            acc, cur = carry
            sv, si = detect_sum(cur)
            # data dependency: perturb one pixel by a value derived from the
            # result so iterations can neither be CSE'd nor reordered
            delta = (si % 2).astype(jnp.uint8)
            cur = cur.at[0, 0].set(cur[0, 0] + delta)
            return acc + sv, cur
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), im))
        return acc

    # compile once (reps is a traced argument)
    _ = float(bench(x, jnp.int32(1)))

    def timed(r):
        t0 = time.perf_counter()
        v = float(bench(x, jnp.int32(r)))
        return time.perf_counter() - t0, v

    # slope timing, median of 3 (median, not min: the slope is a difference
    # of two noisy measurements and can be biased low, not just high)
    slopes = []
    for _ in range(3):
        t_a, _ = timed(r1)
        t_b, _ = timed(r2)
        per_frame = (t_b - t_a) / (r2 - r1)
        if per_frame > 0:
            slopes.append(per_frame)
    fps = 1.0 / sorted(slopes)[len(slopes) // 2]

    baseline_fps = 2977.0  # speed_compare:73-80
    print(json.dumps({
        "metric": "fast9_nms_detect_fps_1282x720",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
