"""Prototype + measure the round-3 CCL design on the bench text fixture.

Design: iterative 8/4-conn label propagation where each iteration does
  diag-min (8-conn only) -> col run-min -> row run-min
and run-min is segmented min via lax.cummin with a monotone per-run offset
(direction-matched so min never leaks across background).

Timing uses the differential fori_loop slope (bench.py methodology) because
the device sits behind a ~25 ms round-trip tunnel.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


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


def make_label_fn(h, w, connectivity=8, max_iterations=256):
    n = h * w
    m = jnp.int32(n)
    big = jnp.int32(1 << 30)

    def run_min(lbl, fg, axis):
        prev = jnp.pad(fg, [(1, 0) if a == axis else (0, 0) for a in range(2)])
        prev = jax.lax.slice_in_dim(prev, 0, fg.shape[axis], axis=axis)
        start = fg & ~prev.astype(bool)
        b = jnp.cumsum(start.astype(jnp.int32), axis=axis)
        rmax = fg.shape[axis] // 2 + 2
        offs_f = (rmax - b) * m
        offs_b = b * m
        kf = jnp.where(fg, lbl + offs_f, big)
        kb = jnp.where(fg, lbl + offs_b, big)
        a1 = jax.lax.cummin(kf, axis=axis) - offs_f
        a2 = jax.lax.cummin(kb, axis=axis, reverse=True) - offs_b
        return jnp.where(fg, jnp.minimum(a1, a2), big)

    def label_impl(binary):
        fg = binary > 0
        idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
               + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
        lbl = jnp.where(fg, idx, big)
        lbl = run_min(lbl, fg, 1)

        def diag_min(lbl):
            p = jnp.pad(lbl, 1, constant_values=1 << 30)
            mm = lbl
            for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
                mm = jnp.minimum(mm, jax.lax.dynamic_slice(
                    p, (1 + dy, 1 + dx), (h, w)))
            return jnp.where(fg, mm, big)

        def body(state):
            lbl, _, i = state
            new = diag_min(lbl) if connectivity == 8 else lbl
            new = run_min(new, fg, 0)
            new = run_min(new, fg, 1)
            changed = jnp.any(new != lbl)
            return new, changed, i + 1

        def cond(state):
            return state[1] & (state[2] < max_iterations)

        lbl, _, iters = jax.lax.while_loop(
            cond, body, (lbl, jnp.asarray(True), jnp.asarray(0)))
        return jnp.where(fg, lbl, -1), iters

    return label_impl


def slope(make_sum, arr, label=""):
    """make_sum(x) -> (f32 scalar, perturb-int). Differential fori timing."""
    @jax.jit
    def bench(x, r):
        def body(i, carry):
            acc, cur = carry
            sv, si = make_sum(cur)
            return acc + sv, cur.at[(0,) * cur.ndim].set(
                cur[(0,) * cur.ndim] + (si % 2).astype(cur.dtype))
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
    print(f"{label:44s} {per*1e6:10.1f} us")
    return per


def main():
    txt = bench_text()
    h, w = txt.shape
    n = h * w
    arr = jnp.asarray(txt)

    label_impl = make_label_fn(h, w)
    label = jax.jit(label_impl)
    out, iters = label(arr)
    print("iterations to converge (8-conn, text):", int(iters))

    from scipy import ndimage
    ref, nref = ndimage.label(txt, structure=np.ones((3, 3)))
    ours = np.asarray(out)
    m1, m2, ok = {}, {}, True
    for (a, b) in zip(ref[txt > 0].ravel(), ours[txt > 0].ravel()):
        if m1.get(a, b) != b or m2.get(b, a) != a:
            ok = False
            break
        m1[a] = b
        m2[b] = a
    print("partition match vs scipy:", ok, "ncomp ref:", nref)

    rs = np.random.default_rng(1)
    rnd50 = (rs.random((h, w)) < 0.5).astype(np.uint8)
    rnd30 = (rs.random((h, w)) < 0.3).astype(np.uint8)
    print("iterations (random 50%):", int(label(jnp.asarray(rnd50))[1]))
    print("iterations (random 30%):", int(label(jnp.asarray(rnd30))[1]))

    def lab_sum(x):
        lb, it = label_impl(x)
        return jnp.sum(lb).astype(jnp.float32), it

    slope(lab_sum, arr, "label_components text (full converge)")
    slope(lab_sum, jnp.asarray(rnd30), "label_components random30")

    def one_iter(x):
        fg = x > 0
        lblf = make_label_fn(h, w)  # reuse run_min via closure hack below
        return None
    # single-iteration cost: run the body once
    lblfn = make_label_fn(h, w, max_iterations=1)

    def lab1_sum(x):
        lb, it = lblfn(x)
        return jnp.sum(lb).astype(jnp.float32), it
    slope(lab1_sum, arr, "label: init + 1 iteration + check")

    lblfn3 = make_label_fn(h, w, max_iterations=3)

    def lab3_sum(x):
        lb, it = lblfn3(x)
        return jnp.sum(lb).astype(jnp.float32), it
    slope(lab3_sum, arr, "label: init + 3 iterations")

    def cummin1(x):
        c = jax.lax.cummin(x.astype(jnp.int32), axis=1)
        return jnp.sum(c[:, -1]).astype(jnp.float32), c[0, -1]
    slope(cummin1, jnp.asarray(rnd30.astype(np.int32)), "single cummin axis=1 i32")

    def cummin0(x):
        c = jax.lax.cummin(x.astype(jnp.int32), axis=0)
        return jnp.sum(c[-1]).astype(jnp.float32), c[-1, 0]
    slope(cummin0, jnp.asarray(rnd30.astype(np.int32)), "single cummin axis=0 i32")

    # selection primitives for features path
    rank = np.where(txt > 0, n - np.arange(n, dtype=np.int32).reshape(h, w), 0)
    rank_j = jnp.asarray(rank.astype(np.int32))

    def rowsort3(x):
        s = jax.lax.sort([x, x + 1, x + 2], dimension=1, num_keys=1)
        return jnp.sum(s[0][:, :4]).astype(jnp.float32), s[0][0, 0]
    slope(rowsort3, rank_j, "lax.sort (H,W) axis=1, 3 ops")

    def rowtopk(x):
        v, i = jax.lax.top_k(x, 64)
        return jnp.sum(v[:, 0]).astype(jnp.float32), v[0, 0]
    slope(rowtopk, rank_j, "batched row top_k k=64")

    small = jnp.asarray(np.random.default_rng(2).integers(
        0, 1 << 20, 36864, np.int32))

    def topk_small(x):
        v, i = jax.lax.top_k(x, 256)
        return jnp.sum(v[:4]).astype(jnp.float32), v[0]
    slope(topk_small, small, "lax.top_k k=256 over 36k")

    def sort36k(x):
        s = jax.lax.sort([x, x + 1, x + 2, x + 3], num_keys=1)
        return jnp.sum(s[0][:4]).astype(jnp.float32), s[0][0]
    slope(sort36k, small, "lax.sort 36k, 4 ops")

    def approx16k(x):
        v, i = jax.lax.approx_max_k(x.astype(jnp.float32).ravel(), 16384)
        return jnp.sum(v[:4]), v[0].astype(jnp.int32)
    slope(approx16k, rank_j, "approx_max_k k=16384 over 1.3M")

    def approx36k(x):
        v, i = jax.lax.approx_max_k(x.astype(jnp.float32).ravel(), 36864)
        return jnp.sum(v[:4]), v[0].astype(jnp.int32)
    slope(approx36k, rank_j, "approx_max_k k=36864 over 1.3M")


if __name__ == "__main__":
    main()
