"""Dtype + clamp-elision variants of the FAST strengths chain, long-loop
slope-timed. All variants must produce identical u8 strengths (checked)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from compv_tpu.features.fast import CIRCLE_OFFSETS, fast_nms, fast_strengths

h, w = 720, 1282
rs = np.random.default_rng(0)
yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
img = 96 + 48 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0)
ch = ((xx // 24).astype(int) + (yy // 24).astype(int)) % 2
img = np.where((xx > 300) & (xx < 1000) & (yy > 150) & (yy < 570),
               ch * 200.0 + 20, img)
img = np.clip(img + rs.normal(0, 2.0, img.shape), 0, 255).astype(np.uint8)
x = jnp.asarray(img)
K = 2000
N = 9
TH = 20


def strengths_variant(img_u8, dt, signed: bool):
    """signed=True: skip per-element relu; single final relu."""
    hh, ww = img_u8.shape
    f = img_u8.astype(dt)
    padded = jnp.pad(f, 3)
    if signed:
        brighter = f + dt(TH)
        darker = f - dt(TH)
    else:
        brighter = jnp.minimum(f + dt(TH), 255).astype(dt)
        darker = jnp.maximum(f - dt(TH), 0).astype(dt)
    d_list, b_list = [], []
    for (dy, dx) in CIRCLE_OFFSETS:
        c = jax.lax.slice(padded, (3 + dy, 3 + dx), (3 + dy + hh, 3 + dx + ww))
        if signed:
            d_list.append(darker - c)
            b_list.append(c - brighter)
        else:
            d_list.append(jnp.maximum(darker - c, 0))
            b_list.append(jnp.maximum(c - brighter, 0))

    def arc(vals):
        m = list(vals)
        span = 1
        while span < N:
            step = min(span, N - span)
            m = [jnp.minimum(m[k], m[(k + step) % 16]) for k in range(16)]
            span += step
        out = m[0]
        for k in range(1, 16):
            out = jnp.maximum(out, m[k])
        return out

    s = jnp.maximum(arc(d_list), arc(b_list))
    if signed:
        s = jnp.maximum(s, 0)
    yy_ = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
    xx_ = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
    interior = (yy_ >= 3) & (yy_ < hh - 3) & (xx_ >= 3) & (xx_ < ww - 3)
    return jnp.where(interior, s, 0).astype(jnp.uint8)


variants = {
    "i16_relu(cur)": lambda im: strengths_variant(im, jnp.int16, False),
    "i16_signed": lambda im: strengths_variant(im, jnp.int16, True),
    "i32_signed": lambda im: strengths_variant(im, jnp.int32, True),
    "f32_signed": lambda im: strengths_variant(im, jnp.float32, True),
    "bf16_signed": lambda im: strengths_variant(im, jnp.bfloat16, True),
}

# correctness vs current implementation
ref = np.asarray(jax.jit(lambda im: fast_strengths(im, TH, N))(x))
for name, fn in variants.items():
    got = np.asarray(jax.jit(fn)(x))
    ok = (got == ref).all()
    print(f"parity {name:14s}: {'OK' if ok else 'MISMATCH ' + str(np.abs(got.astype(int)-ref.astype(int)).max())}")


def full(im, sfn):
    s = fast_nms(sfn(im))
    vals, idx = jax.lax.approx_max_k(s.astype(jnp.float32).ravel(), K)
    return jnp.sum(vals), jnp.sum(idx)


def make_bench(sfn):
    @jax.jit
    def bench(im, reps):
        def body(i, carry):
            acc, cur = carry
            sv, si = full(cur, sfn)
            delta = (si % 2).astype(jnp.uint8)
            cur = cur.at[0, 0].set(cur[0, 0] + delta)
            return acc + sv, cur
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), im))
        return acc
    return bench


R1, R2 = 100, 1100
for name, fn in variants.items():
    b = make_bench(fn)
    _ = float(b(x, jnp.int32(1)))
    slopes = []
    for _t in range(3):
        t0 = time.perf_counter(); float(b(x, jnp.int32(R1)))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(b(x, jnp.int32(R2)))
        tb = time.perf_counter() - t0
        slopes.append((tb - ta) / (R2 - R1))
    med = sorted(slopes)[len(slopes) // 2]
    print(f"{name:14s} {med*1e6:8.1f} us/frame  {1.0/med:9.1f} fps")
