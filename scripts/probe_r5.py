"""Round-5 design probes on the real chip (value-synced slope timing).

Questions:
  1. What does a batched per-row sort of (H, W) i32 cost vs the global
     1.3M-pixel multi-value sort ccl_features_from_labels does today?
  2. What does an R~150k multi-value sort + segmented scans cost?
  3. MSER: where do the 173 ms go per stage, and how many Pallas
     iterations does each ladder level burn?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope(fn, arr, r1=2, r2=12, trials=3):
    """Differential on-device loop timing, value-synced."""
    @jax.jit
    def bench(im, reps):
        def body(i, carry):
            acc, cur = carry
            sv, si = fn(cur)
            delta = (si % 2).astype(cur.dtype)
            cur = cur.at[(0,) * cur.ndim].set(cur[(0,) * cur.ndim] + delta)
            return acc + sv, cur
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), im))
        return acc

    float(bench(arr, jnp.int32(1)))  # compile
    ss = []
    for _ in range(trials):
        t0 = time.perf_counter(); float(bench(arr, jnp.int32(r1)))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(bench(arr, jnp.int32(r2)))
        tb = time.perf_counter() - t0
        s = (tb - ta) / (r2 - r1)
        if s > 0:
            ss.append(s)
    return sorted(ss)[len(ss) // 2] if ss else float("nan")


def text_image():
    rs = np.random.default_rng(0)
    th, tw = 1182, 1122
    text = np.full((th, tw), 235, np.uint8)
    for row in range(20, th - 14, 13):
        for col in range(16, tw - 10, 28):
            if rs.random() < 0.15:
                continue
            gw = min(int(rs.integers(12, 22)), tw - 10 - col)
            gh = min(int(rs.integers(7, 10)), th - 14 - row)
            glyph = rs.random((gh, gw)) < 0.45
            glyph[:, 1:] |= glyph[:, :-1]
            text[row:row + gh, col:col + gw][glyph] = 20
    from scipy import ndimage as _ndi
    text = np.clip(_ndi.gaussian_filter(text.astype(np.float32), 0.8)
                   + rs.normal(0, 3.0, text.shape), 0, 255).astype(np.uint8)
    return text


def main():
    text_np = text_image()
    h, w = text_np.shape
    from compv_tpu.features.ccl import label_components
    text_bin = jnp.asarray((text_np < 128).astype(np.uint8) * 255)
    lbl = label_components(text_bin)
    lbl_np = np.asarray(lbl)

    # how many runs / row?
    fg = lbl_np >= 0
    starts = fg & ~np.pad(fg, ((0, 0), (1, 0)))[:, :-1]
    rpr = starts.sum(1)
    print(f"runs: total={starts.sum()} max/row={rpr.max()} "
          f"mean/row={rpr.mean():.1f}")

    # ---- 1. global 2-value sort of n pixels (today's core cost)
    n = h * w
    fidx = jnp.arange(n, dtype=jnp.int32)

    def g_sort(l):
        key = jnp.where(l.ravel() >= 0, l.ravel(), 1 << 30)
        ks, vs = jax.lax.sort([key, fidx], num_keys=1, is_stable=True)
        return jnp.sum(ks[:5].astype(jnp.float32)), jnp.sum(vs[:3])

    print(f"global 2-val sort n={n}: {slope(g_sort, lbl)*1e6:.0f} us")

    # ---- 2. batched per-row sort: 1 key + 2 values along axis 1
    xi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def row_sort(l):
        fgm = l >= 0
        prev = jnp.pad(fgm, ((0, 0), (1, 0)))[:, :-1]
        start = fgm & ~prev
        key = jnp.where(start, xi, w)
        ks, lv, xv = jax.lax.sort([key, l, xi], dimension=1, num_keys=1,
                                  is_stable=True)
        return jnp.sum(ks[:, 0].astype(jnp.float32)), jnp.sum(lv[:, 0])

    print(f"row 3-val sort (h={h},w={w}): {slope(row_sort, lbl)*1e6:.0f} us")

    def row_sort1(l):
        fgm = l >= 0
        prev = jnp.pad(fgm, ((0, 0), (1, 0)))[:, :-1]
        start = fgm & ~prev
        key = jnp.where(start, xi, w)
        ks = jax.lax.sort(key, dimension=1, is_stable=False)
        return jnp.sum(ks[:, 0].astype(jnp.float32)), jnp.sum(ks[:, 1])

    print(f"row 1-val sort: {slope(row_sort1, lbl)*1e6:.0f} us")

    # ---- 3. R-sized (h*K) 4-value sort + a few scans
    K = 128
    R = h * K
    kk = jnp.arange(R, dtype=jnp.int32)

    def r_sort(l):
        key = jnp.where(kk % 3 == 0, l.ravel()[:R], 1 << 30)
        a, b, c, d = jax.lax.sort([key, kk, kk, kk], num_keys=1,
                                  is_stable=True)
        cs = jnp.cumsum(b)
        cm = jax.lax.cummin(a[::-1])[::-1]
        return jnp.sum(a[:5].astype(jnp.float32)) + cs[-1] + cm[0], jnp.sum(c[:3])

    print(f"R={R} 4-val sort+2scans: {slope(r_sort, lbl)*1e6:.0f} us")

    # scans over n for comparison
    def n_scans(l):
        v = (l.ravel() >= 0).astype(jnp.int32)
        cs = jnp.cumsum(v)
        cm = jax.lax.cummin(l.ravel()[::-1])[::-1]
        return cs[-1].astype(jnp.float32) + cm[0], cs[0]

    print(f"2 scans over n: {slope(n_scans, lbl)*1e6:.0f} us")

    # associative_scan pair over n (used by seg_scan minx/maxx today)
    def n_ascan(l):
        key = l.ravel()
        def comb(a, b):
            va, ka = a
            vb, kb = b
            return jnp.where(ka == kb, jnp.minimum(va, vb), vb), kb
        out, _ = jax.lax.associative_scan(comb, (fidx, key), reverse=True)
        return out[0].astype(jnp.float32), out[5]

    print(f"assoc_scan pair over n: {slope(n_ascan, lbl)*1e6:.0f} us")

    # ---- 4. current full extraction for reference
    from compv_tpu.features.ccl import CclConfig, ccl_features_from_labels

    def cur(l):
        r = ccl_features_from_labels(l, CclConfig())
        return jnp.sum(r.area).astype(jnp.float32), jnp.sum(r.box_x1)

    print(f"current ccl_features_from_labels: {slope(cur, lbl)*1e6:.0f} us")


if __name__ == "__main__":
    main()
