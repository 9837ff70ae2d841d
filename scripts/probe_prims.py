"""Microbenchmark TPU primitive costs that drive the round-3 kernel designs.

Differential-slope methodology (same as bench.py): op runs R times inside a
jitted fori_loop with a data dependency; per-op time = (T(R2)-T(R1))/(R2-R1).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1182, 1122
N = H * W


def timeit(name, make_fn, arr, reps=None):
    fn = make_fn

    @jax.jit
    def bench(x, r):
        def body(i, carry):
            acc, cur = carry
            sv, nxt = fn(cur)
            return acc + sv, nxt
        acc, _ = jax.lax.fori_loop(0, r, body, (jnp.float32(0.0), x))
        return acc

    float(bench(arr, jnp.int32(1)))  # compile
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(9)))
    t9 = time.perf_counter() - t0
    est = max((t9 - t1) / 8, 1e-7)
    r2 = int(np.clip(round(0.3 / est), 5, 2000))
    r1 = max(1, r2 // 10)
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(r1)))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(r2)))
    tb = time.perf_counter() - t0
    per = (tb - ta) / (r2 - r1)
    print(f"{name:42s} {per*1e6:10.1f} us")
    return per


def main():
    which = set(sys.argv[1:]) if len(sys.argv) > 1 else None
    rs = np.random.default_rng(0)
    img_i32 = jnp.asarray(rs.integers(0, 255, (H, W), np.int32))
    img_u8 = jnp.asarray(rs.integers(0, 255, (H, W), np.uint8))
    fg = jnp.asarray((rs.random((H, W)) < 0.3).astype(np.uint8))

    def run(name, fn, arr):
        if which is None or any(k in name for k in which):
            timeit(name, fn, arr)

    # --- cumsum variants
    def cs_ax1(x):
        s = jnp.cumsum(x, axis=1)
        return s[0, -1].astype(jnp.float32), x + (s[0, -1] % 2)

    def cs_ax0(x):
        s = jnp.cumsum(x, axis=0)
        return s[-1, 0].astype(jnp.float32), x + (s[-1, 0] % 2)

    def ascan_ax1(x):
        s = jax.lax.associative_scan(jnp.add, x, axis=1)
        return s[0, -1].astype(jnp.float32), x + (s[0, -1] % 2)

    run("cumsum axis=1 (rows) i32", cs_ax1, img_i32)
    run("cumsum axis=0 (cols) i32", cs_ax0, img_i32)
    run("associative_scan axis=1 i32", ascan_ax1, img_i32)

    # blocked scan along axis=1: pad W->1152=9*128, in-block Hillis-Steele
    def blocked_cs_ax1(x):
        wpad = 1152
        p = jnp.pad(x, ((0, 0), (0, wpad - W)))
        b = p.reshape(H, 9, 128)
        v = b
        for d in (1, 2, 4, 8, 16, 32, 64):
            sh = jnp.pad(v, ((0, 0), (0, 0), (d, 0)))[:, :, :128]
            v = v + sh
        carry = jnp.cumsum(v[:, :, -1], axis=1)  # (H, 9) small
        carry = jnp.pad(carry, ((0, 0), (1, 0)))[:, :9]
        v = v + carry[:, :, None]
        s = v.reshape(H, wpad)
        return s[0, W - 1].astype(jnp.float32), x + (s[0, W - 1] % 2)

    run("blocked cumsum axis=1 i32", blocked_cs_ax1, img_i32)

    # --- neighbor 8-min pass
    def nmin(x):
        p = jnp.pad(x, 1, constant_values=1 << 30)
        m = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                m = jnp.minimum(m, jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (H, W)))
        return m[0, 0].astype(jnp.float32), x + (m[0, 0] % 2)

    run("neighbor 8-min i32", nmin, img_i32)

    # --- segmented run-min along rows via fwd+bwd blocked scans
    def runmin_rows(x):
        f = fg > 0
        big = jnp.int32(1 << 30)
        v = jnp.where(f, x, big)

        def seg_dir(v, f, rev):
            if rev:
                v = v[:, ::-1]
                f = f[:, ::-1]
            wpad = 1152
            vp = jnp.pad(v, ((0, 0), (0, wpad - W)), constant_values=1 << 30)
            fp = jnp.pad(f, ((0, 0), (0, wpad - W)))
            vb = vp.reshape(H, 9, 128)
            fb = fp.reshape(H, 9, 128)
            # in-block segmented cummin: carry (val,flag): flag=1 if any bg in prefix-window
            val = vb
            flg = ~fb  # True = boundary
            for d in (1, 2, 4, 8, 16, 32, 64):
                sval = jnp.pad(val, ((0, 0), (0, 0), (d, 0)), constant_values=1 << 30)[:, :, :128]
                sflg = jnp.pad(flg, ((0, 0), (0, 0), (d, 0)), constant_values=True)[:, :, :128]
                val = jnp.where(flg, val, jnp.minimum(val, sval))
                flg = flg | sflg
            # cross-block carry: sequential over 9 blocks
            def bodyb(c, i):
                bval = jax.lax.dynamic_index_in_dim(val, i, 1, keepdims=False)
                bflg = jax.lax.dynamic_index_in_dim(flg, i, 1, keepdims=False)
                out = jnp.where(bflg[:, :1] * 0 + bflg, bval, jnp.minimum(bval, c[:, None]))
                newc = jnp.where(bflg[:, -1], bval[:, -1], jnp.minimum(bval[:, -1], c))
                return newc, out
            c0 = jnp.full((H,), 1 << 30, jnp.int32)
            _, blocks = jax.lax.scan(bodyb, c0, jnp.arange(9))
            out = jnp.transpose(blocks, (1, 0, 2)).reshape(H, 1152)[:, :W]
            if rev:
                out = out[:, ::-1]
            return out

        a = seg_dir(v, f, False)
        b = seg_dir(v, f, True)
        m = jnp.minimum(a, b)
        return m[0, 0].astype(jnp.float32), x + (m[0, 0] % 2)

    run("row run-min fwd+bwd blocked", runmin_rows, img_i32)

    # --- gathers
    tbl = img_i32.ravel()
    idx16k = jnp.asarray(rs.integers(0, N, 16384, np.int32))
    idx131k = jnp.asarray(rs.integers(0, N, 131072, np.int32))
    idx1m = jnp.asarray(rs.integers(0, N, N, np.int32))

    def mkgather(idx):
        def g(x):
            v = x.ravel()[idx]
            return jnp.sum(v).astype(jnp.float32), x + (v[0] % 2)
        return g

    run("gather 16k from 1.3M", mkgather(idx16k), img_i32)
    run("gather 131k from 1.3M", mkgather(idx131k), img_i32)
    run("gather 1.3M from 1.3M", mkgather(idx1m), img_i32)

    # --- scatter-add
    def mkscatter(idx, nbins):
        def s(x):
            acc = jnp.zeros(nbins, jnp.int32).at[idx % nbins].add(x.ravel()[:idx.shape[0]])
            return jnp.sum(acc).astype(jnp.float32), x + (acc[0] % 2)
        return s

    run("scatter-add 16k into 4096 bins", mkscatter(idx16k, 4096), img_i32)
    run("scatter-add 131k into 4096 bins", mkscatter(idx131k, 4096), img_i32)
    run("scatter-add 16k into 1.3M bins", mkscatter(idx16k, N), img_i32)

    # --- top_k
    def mktopk(k):
        def t(x):
            v, i = jax.lax.top_k(x.ravel(), k)
            return jnp.sum(v[:8]).astype(jnp.float32), x + (v[0] % 2)
        return t

    run("top_k k=256 over 1.3M", mktopk(256), img_i32)
    run("top_k k=2000 over 1.3M", mktopk(2000), img_i32)
    run("top_k k=16384 over 1.3M", mktopk(16384), img_i32)
    run("top_k k=131072 over 1.3M", mktopk(131072), img_i32)

    # --- sort small arrays
    keys16k = jnp.asarray(rs.integers(0, N, 16384, np.int32))
    keys65k = jnp.asarray(rs.integers(0, N, 65536, np.int32))

    def mksort(keys):
        def s(x):
            k2 = keys + (x[0, 0] % 2)
            v = jnp.sort(k2)
            return jnp.sum(v[:8]).astype(jnp.float32), x + (v[0] % 2)
        return s

    run("sort 16k i32", mksort(keys16k), img_i32)
    run("sort 65k i32 (2 arrays)", lambda x: (lambda k2: (
        jnp.sum(jax.lax.sort([k2, k2 + 1], num_keys=1)[1][:8]).astype(jnp.float32),
        x + (k2[0] % 2)))(keys65k + (x[0, 0] % 2)), img_i32)


if __name__ == "__main__":
    main()
