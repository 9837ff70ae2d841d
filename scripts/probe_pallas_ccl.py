"""Pallas whole-image-in-VMEM CCL propagation kernel — feasibility probe.

Image (padded to sublane/lane multiples) lives entirely in VMEM; the kernel
iterates separable 3x3 (8-conn) neighbor-min with a convergence check, so
per-iteration cost is pure VPU compute with zero HBM traffic.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 30


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


def _kernel(fg_ref, out_ref, it_ref, *, h, w, hp, wp, max_iter, conn8):
    fg = fg_ref[:].astype(jnp.int32) > 0
    row = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    big = jnp.int32(BIG)
    lbl0 = jnp.where(fg, row * w + col, big)

    def nmin(l):
        v = jnp.minimum(l, jnp.minimum(pltpu.roll(l, hp - 1, 0),
                                       pltpu.roll(l, 1, 0)))
        if conn8:
            v = jnp.minimum(v, jnp.minimum(pltpu.roll(v, wp - 1, 1),
                                           pltpu.roll(v, 1, 1)))
        else:
            v = jnp.minimum(v, jnp.minimum(pltpu.roll(l, wp - 1, 1),
                                           pltpu.roll(l, 1, 1)))
        return jnp.where(fg, v, big)

    def cond(state):
        _, changed, i = state
        return changed & (i < max_iter)

    def body(state):
        l, _, i = state
        new = nmin(l)
        return new, jnp.any(new != l), i + 1

    lbl, _, iters = jax.lax.while_loop(
        cond, body, (lbl0, jnp.asarray(True), jnp.int32(0)))
    out_ref[:] = lbl
    it_ref[0] = iters


@functools.partial(jax.jit, static_argnames=("max_iter", "conn8"))
def pallas_label(binary, max_iter=64, conn8=True):
    h, w = binary.shape
    hp = -(-(h + 2) // 8) * 8
    wp = -(-(w + 2) // 128) * 128
    fg = jnp.zeros((hp, wp), jnp.int8).at[:h, :w].set(binary.astype(jnp.int8))
    out, it = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, hp=hp, wp=wp,
                          max_iter=max_iter, conn8=conn8),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(fg)
    lbl = out[:h, :w]
    return jnp.where(binary > 0, lbl, -1), it[0]


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
    print(f"{label:46s} {per*1e6:10.1f} us")
    return per


def main():
    txt = bench_text()
    arr = jnp.asarray(txt)

    out, iters = pallas_label(arr, max_iter=128)
    print("pallas neighbor-min iterations (text):", int(iters))

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
    print("partition match vs scipy:", ok, "ncomp:", nref)

    def lab_sum(x):
        lb, it = pallas_label(x, max_iter=128)
        return jnp.sum(lb).astype(jnp.float32), it
    slope(lab_sum, arr, "pallas label text (converged)")

    def lab_sum_16(x):
        lb, it = pallas_label(x, max_iter=16)
        return jnp.sum(lb).astype(jnp.float32), it
    slope(lab_sum_16, arr, "pallas label text (16 iters)")

    def lab_sum_48(x):
        lb, it = pallas_label(x, max_iter=48)
        return jnp.sum(lb).astype(jnp.float32), it
    slope(lab_sum_48, arr, "pallas label text (48 iters)")

    rs = np.random.default_rng(1)
    rnd30 = (rs.random(txt.shape) < 0.3).astype(np.uint8)
    out30, it30 = pallas_label(jnp.asarray(rnd30), max_iter=512)
    print("iterations (random30):", int(it30))
    slope(lambda x: (jnp.sum(pallas_label(x, max_iter=512)[0]).astype(jnp.float32),
                     jnp.int32(1)), jnp.asarray(rnd30), "pallas label random30")


if __name__ == "__main__":
    main()
