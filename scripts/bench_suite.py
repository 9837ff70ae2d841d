"""Full benchmark suite vs the reference's speed_compare table (BASELINE.md).

Each metric is slope-timed on device (see bench.py for the methodology: a
fori_loop with a data dependency between iterations; per-op time is the
slope between two repetition counts, which cancels tunnel/dispatch/compile
overhead). Prints one JSON line per metric:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": ratio}
vs_baseline is our fps / the reference's fps derived from BASELINE.md
(total_ms / reps on an i7-4790K @4GHz, 8 threads, AVX2+asm).

Run: python scripts/bench_suite.py            (real TPU via axon)
     BENCH_CPU=1 python scripts/bench_suite.py (CPU smoke, tiny reps)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpu = os.environ.get("BENCH_CPU") == "1"
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
        r1, r2, trials = 2, 6, 1
    else:
        r1, r2, trials = 50, 550, 3

    import jax.numpy as jnp
    from compv_tpu.features.canny import CannyConfig, canny
    from compv_tpu.features.edges import edge_detect
    from compv_tpu.features.fast import _nms_f32, _strengths_f32
    from compv_tpu.features.edges import sobel_gradients
    from compv_tpu.features.hough import (
        HoughKhtConfig, HoughShtConfig, hough_kht, hough_sht,
    )
    from compv_tpu.image.color import (
        i420_to_rgb, rgb_to_gray, rgb_to_hsv, split_channels,
    )
    from compv_tpu.image.histogram import equalize, histogram256
    from compv_tpu.image.integral import integral, integral_squared
    from compv_tpu.image.morph import close_, erode, strel
    from compv_tpu.image.scale import rotate_fast, scale
    from compv_tpu.image.threshold import threshold_adaptive, threshold_otsu
    from compv_tpu.matchers.bruteforce import knn_match
    from compv_tpu.ops.conv import gaussian_blur
    from compv_tpu.ops.topk import select_top_k_2d

    h, w = 720, 1282
    rs = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 96 + 48 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0)
    ch = ((xx // 24).astype(int) + (yy // 24).astype(int)) % 2
    base = np.where((xx > 300) & (xx < 1000) & (yy > 150) & (yy < 570),
                    ch * 200.0 + 20, base)
    gray_np = np.clip(base + rs.normal(0, 2.0, base.shape), 0, 255).astype(np.uint8)
    gray = jnp.asarray(gray_np)
    rgb = jnp.asarray(np.stack([gray_np,
                                np.roll(gray_np, 3, 0),
                                np.roll(gray_np, 7, 1)], -1))
    y_p = gray
    u_p = jnp.asarray(rs.integers(0, 255, (h // 2, w // 2), dtype=np.uint8))
    v_p = jnp.asarray(rs.integers(0, 255, (h // 2, w // 2), dtype=np.uint8))
    descq = jnp.asarray(rs.integers(0, 2, (200, 256), dtype=np.uint8))
    desct = jnp.asarray(rs.integers(0, 2, (258, 256), dtype=np.uint8))
    se3 = strel("cross", 3)
    big = jnp.asarray(rs.integers(0, 2, (1285, 1285), dtype=np.uint8) * 255)

    def u8sum(a):
        v = jnp.sum(a.astype(jnp.int32))
        return v.astype(jnp.float32), v

    # (name, input array to perturb, fn(im) -> (f32 scalar, int scalar),
    #  reference fps from BASELINE.md)
    cases = [
        ("rgb24_to_gray", rgb,
         lambda im: u8sum(rgb_to_gray(im)), 10000 / 0.449),
        ("i420_to_rgb24", y_p,
         lambda im: u8sum(i420_to_rgb(im, u_p, v_p)), 10000 / 0.968),
        ("rgb24_to_hsv", rgb,
         lambda im: u8sum(rgb_to_hsv(im)), 10000 / 2.137),
        ("split_rgb", rgb,
         lambda im: u8sum(split_channels(im)[0]), 10000 / 0.694),
        ("histogram_256", gray,
         lambda im: u8sum(histogram256(im)), 10000 / 1.073),
        ("hist_equalize", gray,
         lambda im: u8sum(equalize(im)), 10000 / 2.675),
        ("integral_sq", gray,
         lambda im: u8sum(integral(im, jnp.float32)[-1, -1:]
                          + integral_squared(im, jnp.float32)[-1, -1:]),
         1000 / 1.832),
        ("otsu_threshold", gray,
         lambda im: u8sum(threshold_otsu(im)[0]), 10000 / 1.253),
        ("adaptive_thresh_5x5", gray,
         lambda im: u8sum(threshold_adaptive(im, 5, 21)), 10000 / 3.551),
        ("gaussian_blur_7x7", gray,
         lambda im: u8sum(gaussian_blur(im, 7, 2.0)), 10000 / 1.367),
        ("sobel3x3", gray,
         lambda im: u8sum(edge_detect(im, "sobel")), 10000 / 7.476),
        ("scale_bilinear", gray,
         lambda im: u8sum(scale(im, 597, 1064, "bilinear")), 10000 / 1.474),
        ("rotate_45_paeth", gray,
         lambda im: u8sum(rotate_fast(im, jnp.float32(44.9))),
         1000 / 1.540),
        ("fast9_nms_topk", gray,
         lambda im: (lambda vi: (jnp.sum(vi[0]), jnp.sum(vi[1])))(
             select_top_k_2d(_nms_f32(_strengths_f32(im, 20, 9)), 2000)),
         10000 / 3.358),
        ("canny3x3", gray,
         lambda im: u8sum(canny(im, CannyConfig())), 10000 / 14.903),
        ("morph_erode_3x3", big,
         lambda im: u8sum(erode(im, se3)), 10000 / 0.449),
        ("morph_close_3x3", big,
         lambda im: u8sum(close_(im, se3)), 10000 / 0.794),
        ("hough_sht", gray,
         lambda im: (lambda L: (jnp.sum(L.strength), jnp.sum(L.rho).astype(jnp.int32)))(
             hough_sht(canny(im, CannyConfig()), HoughShtConfig())),
         1000 / 10.367),
        ("hough_kht", gray,
         lambda im: (lambda L: (jnp.sum(L.strength), jnp.sum(L.rho).astype(jnp.int32)))(
             (lambda e_gx_gy: hough_kht(e_gx_gy[0], e_gx_gy[1], e_gx_gy[2],
                                        HoughKhtConfig()))(
                 (canny(im, CannyConfig()),) + sobel_gradients(im))),
         1000 / 1.413),
        ("bf_hamming_knn2_200x258", descq,
         lambda q: (lambda m: (
             jnp.sum(jnp.where(m.valid, m.distance, 0.0)),
             jnp.sum(m.train_idx)))(knn_match(q, desct, k=2)),
         1000 / 0.260),
    ]

    results = {}
    for name, arr, fn, ref_fps in cases:
        import jax as _jax

        @_jax.jit
        def bench(im, reps, fn=fn):
            def body(i, carry):
                acc, cur = carry
                sv, si = fn(cur)
                delta = (si % 2).astype(cur.dtype)
                cur = cur.at[(0,) * cur.ndim].set(cur[(0,) * cur.ndim] + delta)
                return acc + sv, cur
            acc, _ = _jax.lax.fori_loop(0, reps, body,
                                        (jnp.float32(0.0), im))
            return acc

        try:
            _ = float(bench(arr, jnp.int32(1)))
            slopes = []
            for _t in range(trials):
                t0 = time.perf_counter(); float(bench(arr, jnp.int32(r1)))
                ta = time.perf_counter() - t0
                t0 = time.perf_counter(); float(bench(arr, jnp.int32(r2)))
                tb = time.perf_counter() - t0
                s = (tb - ta) / (r2 - r1)
                if s > 0:
                    slopes.append(s)
            if not slopes:
                continue
            per = sorted(slopes)[len(slopes) // 2]
            fps = 1.0 / per
            results[name] = (fps, ref_fps)
            print(json.dumps({"metric": name, "value": round(fps, 1),
                              "unit": "frames/s",
                              "vs_baseline": round(fps / ref_fps, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue the suite
            print(json.dumps({"metric": name, "error": str(e)[:200]}),
                  flush=True)

    if results:
        geo = float(np.exp(np.mean([np.log(f / r) for f, r in results.values()])))
        print(json.dumps({"metric": "suite_geomean_vs_reference",
                          "value": round(geo, 3), "unit": "x",
                          "vs_baseline": round(geo, 3)}), flush=True)


if __name__ == "__main__":
    main()
