"""Tune the Pallas CCL jump schedule on the bench text fixture."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from compv_tpu.ops.pallas.ccl_kernel import pallas_label


def bench_text():
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
    return (text < 128).astype(np.uint8)


def slope(make_sum, arr, label=""):
    @jax.jit
    def bench(x, r):
        def body(i, carry):
            acc, cur = carry
            sv, si = make_sum(cur)
            return acc + sv, cur.at[0, 0].set(cur[0, 0] + (si % 2).astype(cur.dtype))
        acc, _ = jax.lax.fori_loop(0, r, body, (jnp.float32(0.0), x))
        return acc

    float(bench(arr, jnp.int32(1)))
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(9)))
    t9 = time.perf_counter() - t0
    est = max((t9 - t1) / 8, 1e-7)
    r2 = int(np.clip(round(0.4 / est), 5, 2000))
    r1 = max(1, r2 // 10)
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(r1)))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(r2)))
    tb = time.perf_counter() - t0
    per = (tb - ta) / (r2 - r1)
    print(f"{label:52s} {per*1e6:9.1f} us")
    return per


def main():
    txt = bench_text()
    arr = jnp.asarray(txt)
    rs = np.random.default_rng(1)
    rnd30 = jnp.asarray((rs.random(txt.shape) < 0.3).astype(np.uint8))

    from scipy import ndimage
    ref, nref = ndimage.label(txt, structure=np.ones((3, 3)))

    configs = [(3, ())]
    for je, jd in configs:
        out, it = pallas_label(arr, 8, 192, je, jd)
        it_n = int(it)
        lbl = np.asarray(jnp.where(arr > 0, out, -1))
        m1, m2, ok = {}, {}, True
        for (a, b) in zip(ref[txt > 0].ravel(), lbl[txt > 0].ravel()):
            if m1.get(a, b) != b or m2.get(b, a) != a:
                ok = False
                break
            m1[a] = b
            m2[b] = a
        it30 = int(pallas_label(rnd30, 8, 192, je, jd)[1])
        t = slope(lambda x, je=je, jd=jd: (
            jnp.sum(pallas_label(x, 8, 192, je, jd)[0]).astype(jnp.float32),
            jnp.int32(1)), arr,
            f"every={je} dists={jd} iters={it_n} r30={it30} ok={ok}")


def rowinit_test():
    from compv_tpu.ops.pallas.ccl_kernel import pallas_label_seeded
    txt = bench_text()
    arr = jnp.asarray(txt)

    @jax.jit
    def rowstart(binary):
        h, w = binary.shape
        fg = binary > 0
        idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
               + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
        start = fg & ~jnp.pad(fg, ((0, 0), (1, 0)))[:, :w]
        s = jnp.where(start, idx, -1)
        return jax.lax.cummax(s, axis=1)

    out, it = pallas_label_seeded(arr, rowstart(arr), 8, 192)
    print("row-init seeded iters:", int(it))
    from scipy import ndimage
    ref, _ = ndimage.label(txt, structure=np.ones((3, 3)))
    lbl = np.asarray(jnp.where(arr > 0, out, -1))
    m1, m2, ok = {}, {}, True
    for (a, b) in zip(ref[txt > 0].ravel(), lbl[txt > 0].ravel()):
        if m1.get(a, b) != b or m2.get(b, a) != a:
            ok = False
            break
        m1[a] = b
        m2[b] = a
    print("row-init ok:", ok)
    slope(lambda x: (jnp.sum(pallas_label_seeded(
        x, rowstart(x), 8, 192)[0]).astype(jnp.float32), jnp.int32(1)),
        arr, "row-init seeded label")


if __name__ == "__main__":
    main()
    rowinit_test()
