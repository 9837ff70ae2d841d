"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: FAST9+NMS corner detection throughput at 1282x720 (the
reference's flagship kernel benchmark: 3358 ms / 10k frames ≈ 2977 fps on an
i7-4790K with AVX2 + 8 threads, speed_compare:73-80). vs_baseline is our
fps / 2977.

Runs on whatever backend jax selects (the real TPU chip under the driver;
set BENCH_CPU=1 to smoke-test on CPU with fewer reps).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    if os.environ.get("BENCH_CPU") == "1":
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=1")
        import jax
        jax.config.update("jax_platforms", "cpu")
        reps = 30
    else:
        import jax
        reps = 200

    import jax.numpy as jnp
    from compv_tpu.features.fast import FastConfig, fast_detect

    h, w = 720, 1282
    rs = np.random.default_rng(0)
    # structured image: gradients + checkerboard + noise, similar corner
    # density to the reference's equirectangular test scene
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 96 + 48 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0)
    ch = ((xx // 24).astype(int) + (yy // 24).astype(int)) % 2
    img = np.where((xx > 300) & (xx < 1000) & (yy > 150) & (yy < 570),
                   ch * 200.0 + 20, img)
    img = np.clip(img + rs.normal(0, 2.0, img.shape), 0, 255).astype(np.uint8)
    x = jnp.asarray(img)

    cfg = FastConfig(threshold=20, n=9, nms=True, max_features=2000)
    import functools
    fn = jax.jit(functools.partial(fast_detect, config=cfg))

    # warmup / compile
    out = fn(x)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = reps / dt

    baseline_fps = 2977.0  # speed_compare:73-80
    print(json.dumps({
        "metric": "fast9_nms_detect_fps_1282x720",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
