"""MSER stage breakdown on the real chip (r5)."""
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
    from compv_tpu.features.mser import MserConfig, _mser_impl

    cfg = MserConfig()

    for stage in (1, 2, 3, 0):
        def fn(im, stage=stage):
            r = _mser_impl(im, cfg, im.shape, _stage=stage)
            return (jnp.sum(r.area).astype(jnp.float32),
                    jnp.sum(r.level.astype(jnp.int32)))

        t = slope(fn, text, r1=1, r2=4)
        print(f"stage {stage}: {t*1e3:.1f} ms", flush=True)

    # ladder only, no strip counts: label_components_seeded scan alone
    from compv_tpu.features.ccl import label_components_seeded
    h, w = text.shape
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    levels = jnp.asarray(list(range(5, 256, 5)), jnp.int32)

    @jax.jit
    def ladder(im):
        def step(prev, t):
            fgm = (im.astype(jnp.int32) <= t).astype(jnp.uint8)
            changed = jnp.any((fgm > 0) != (prev >= 0))
            def compute(_):
                init = jnp.where(prev >= 0, prev, idx)
                return label_components_seeded(fgm, init, 8)
            lbl = jax.lax.cond(changed, compute, lambda _: prev, 0)
            return lbl, jnp.sum(lbl[0])
        _, sums = jax.lax.scan(step, jnp.full((h, w), -1, jnp.int32), levels)
        return jnp.sum(sums).astype(jnp.float32), sums[0]

    t = slope(ladder, text, r1=1, r2=4)
    print(f"ladder only (51 seeded labelings): {t*1e3:.1f} ms", flush=True)

    # how many changed pixels per level?
    prev = np.full((h, w), -1)
    tot = 0
    from compv_tpu.features.ccl import label_components
    for t_ in range(5, 256, 5):
        fg = text_np <= t_
        lbl = np.asarray(label_components(jnp.asarray(fg.astype(np.uint8))))
        ch = (lbl != prev).sum()
        tot += ch
        if ch:
            print(f"  level {t_}: changed={ch} fg={fg.sum()}")
        prev = lbl
    print(f"total changed-pixel events: {tot}")


if __name__ == "__main__":
    main()
