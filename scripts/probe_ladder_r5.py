"""Per-level ladder cost: iters + slope time for each MSER gray level."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from scripts.probe_r5 import text_image


def main():
    text_np = text_image()
    text = jnp.asarray(text_np)
    h, w = text.shape
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))

    from compv_tpu.ops.pallas.ccl_kernel import pallas_label_seeded

    @jax.jit
    def one_level(im, prev, t):
        fgm = (im.astype(jnp.int32) <= t).astype(jnp.uint8)
        init = jnp.where(prev >= 0, prev, idx)
        raw, iters = pallas_label_seeded(fgm, init, 8, 96, jump_every=2,
                                         jump_dists=(8, 64, 512))
        return raw, iters

    # warm compile
    prev = jnp.full((h, w), -1, jnp.int32)
    r, it = one_level(text, prev, jnp.int32(5))
    float(jnp.sum(it))

    tot_t, tot_it = 0.0, 0
    rows = []
    prev = jnp.full((h, w), -1, jnp.int32)
    for t in range(5, 256, 5):
        # time this level (3 reps median, value-synced; same seed each rep)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            raw, iters = one_level(text, prev, jnp.int32(t))
            n_it = int(iters)
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1]
        tot_t += dt
        tot_it += n_it
        rows.append((t, n_it, dt * 1e3))
        prev = raw
    for t, n_it, ms in rows:
        print(f"level {t:3d}: iters={n_it:3d} {ms:7.2f} ms")
    print(f"TOTAL: iters={tot_it} time={tot_t*1e3:.1f} ms "
          f"(incl tunnel rtt ~x51)")


if __name__ == "__main__":
    main()
