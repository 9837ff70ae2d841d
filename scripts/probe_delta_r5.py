"""Quantify: (a) jump-dist ladders that converge level 235 in-kernel;
(b) distinct-present vs distinct-changed per (level, strip) — the exact
work ratio of a delta-masked strip histogram; (c) standalone cost of
strip_label_counts on one level."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from scripts.probe_r5 import slope, text_image


def main():
    text_np = text_image()
    text = jnp.asarray(text_np)
    h, w = text.shape
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))

    from compv_tpu.ops.pallas.ccl_kernel import pallas_label_seeded

    # seed for level 235 = converged labels at 230
    from compv_tpu.features.ccl import label_components
    lbl230 = label_components(
        jnp.asarray((text_np <= 230).astype(np.uint8)))
    fgm235 = jnp.asarray((text_np <= 235).astype(np.uint8))
    init = jnp.where(lbl230 >= 0, lbl230, idx)

    for je, jd, mi in [(2, (8, 64, 512), 96), (2, (8, 64, 512), 256),
                       (2, (8, 32, 128), 256), (2, (4, 16, 64, 256), 256),
                       (3, (8, 32, 128), 256), (2, (16, 128), 256)]:
        raw, iters = pallas_label_seeded(fgm235, init, 8, mi,
                                         jump_every=je, jump_dists=jd)
        # time it
        @jax.jit
        def f(im, init=init, je=je, jd=jd, mi=mi):
            r, it = pallas_label_seeded(im, init, 8, mi, jump_every=je,
                                        jump_dists=jd)
            return jnp.sum(it).astype(jnp.float32), it

        t = slope(f, fgm235, r1=2, r2=20)
        print(f"je={je} jd={jd} max={mi}: iters={int(iters)} "
              f"t={t*1e6:.0f} us", flush=True)

    # (c) strip_label_counts standalone on level 115 labels
    from compv_tpu.ops.pallas.label_stats import strip_label_counts
    lbl115 = label_components(jnp.asarray((text_np <= 115).astype(np.uint8)))

    @jax.jit
    def sc(l):
        recs, used, trunc = strip_label_counts(l, 640)
        return jnp.sum(used).astype(jnp.float32), jnp.sum(trunc)

    t = slope(sc, lbl115, r1=2, r2=12)
    print(f"strip_label_counts(level115): {t*1e6:.0f} us", flush=True)

    lbl235 = label_components(fgm235)
    t = slope(lambda l: sc(l), lbl235, r1=2, r2=12)
    print(f"strip_label_counts(level235): {t*1e6:.0f} us", flush=True)

    # (b) distinct-present vs distinct-changed stats over all levels
    prev = np.full((h, w), -1)
    tot_p, tot_c = 0, 0
    per_level = []
    for t_ in range(5, 256, 5):
        lbl = np.asarray(label_components(
            jnp.asarray((text_np <= t_).astype(np.uint8))))
        S = -(-h // 8)
        pres = 0
        chg = 0
        for s in range(S):
            sl = lbl[s * 8:(s + 1) * 8]
            sp = prev[s * 8:(s + 1) * 8]
            m = sl >= 0
            pres += len(np.unique(sl[m])) if m.any() else 0
            cm = sl != sp
            if cm.any():
                u = set(np.unique(sl[cm & m]).tolist())
                u |= set(np.unique(sp[cm & (sp >= 0)]).tolist())
                chg += len(u)
        tot_p += pres
        tot_c += chg
        per_level.append((t_, pres, chg))
        prev = lbl
    for t_, p, c in per_level:
        print(f"level {t_:3d}: present={p:6d} changed={c:6d}")
    print(f"TOTAL rounds: present={tot_p} changed={tot_c} "
          f"ratio={tot_c/max(tot_p,1):.3f}")


if __name__ == "__main__":
    main()
