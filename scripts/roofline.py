"""Roofline / MFU accounting for the hot kernels (VERDICT r2 task 4).

For each kernel: an explicit bytes-moved and ops model (stated inline, not
inferred), measured wall time via the differential fori_loop slope
(bench.py methodology — cancels the tunnel round trip), and the achieved
GB/s / TOP/s as a % of the chip's nominal peaks.

Run on the TPU:  python scripts/roofline.py            (full table)
                 python scripts/roofline.py fast9 ...  (subset)
Writes ROOFLINE.md at the repo root with the snapshot.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# nominal single-chip peaks by device kind
PEAKS = {
    # kind: (bf16 matmul FLOP/s, int8 matmul OP/s, HBM B/s, VPU f32 op/s)
    "TPU v5 lite": (197e12, 394e12, 819e9, 3.9e12),
    "TPU v4": (275e12, 275e12, 1228e9, 4.3e12),
    "TPU v6 lite": (918e12, 1836e12, 1640e9, 7.4e12),
}
DEFAULT_PEAK = (197e12, 394e12, 819e9, 3.9e12)


def slope(fn, arr, jax, jnp, target=0.4):
    @jax.jit
    def bench(x, r):
        def body(i, carry):
            acc, cur = carry
            sv = fn(cur)
            return acc + sv, cur.at[(0,) * cur.ndim].set(
                cur[(0,) * cur.ndim] + (sv.astype(jnp.int32) % 2
                                        ).astype(cur.dtype))
        return jax.lax.fori_loop(0, r, body, (jnp.float32(0.0), x))[0]

    float(bench(arr, jnp.int32(1)))
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(9)))
    t9 = time.perf_counter() - t0
    est = max((t9 - t1) / 8, 1e-7)
    r2 = int(np.clip(round(target / est), 4, 1500))
    r1 = max(1, r2 // 10)
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(r1)))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter(); float(bench(arr, jnp.int32(r2)))
    tb = time.perf_counter() - t0
    return (tb - ta) / (r2 - r1)


def main():
    only = set(sys.argv[1:]) or None
    import jax
    import jax.numpy as jnp

    kind = jax.devices()[0].device_kind
    p_mxu_bf16, p_mxu_i8, p_hbm, p_vpu = PEAKS.get(kind, DEFAULT_PEAK)

    from bench import _images
    gray_np, text_np = _images()
    gray = jnp.asarray(gray_np)
    text_bin = jnp.asarray((text_np < 128).astype(np.uint8) * 255)
    h, w = gray_np.shape
    n = h * w
    nt = text_np.size
    rs = np.random.default_rng(0)

    rows = []

    def add(name, t, bytes_, ops, unit, model):
        rows.append(dict(name=name, t=t, bytes=bytes_, ops=ops, unit=unit,
                         model=model,
                         gbs=bytes_ / t / 1e9,
                         tops=ops / t / 1e12,
                         pct_hbm=100 * (bytes_ / t) / p_hbm,
                         pct_unit=100 * (ops / t) / {
                             "bf16": p_mxu_bf16, "i8": p_mxu_i8,
                             "vpu": p_vpu}[unit]))

    def want(name):
        return only is None or any(k in name for k in only)

    # ---- FAST9 strengths + NMS + top-k (the detect headline)
    if want("fast9"):
        from compv_tpu.features.fast import _nms_f32, _strengths_f32
        from compv_tpu.ops.topk import select_top_k_2d

        def f(im):
            v, i = select_top_k_2d(_nms_f32(_strengths_f32(im, 20, 9)), 2000)
            return jnp.sum(v)
        t = slope(f, gray, jax, jnp)
        # bytes: u8 in + f32 strengths out + f32 NMS in/out + topk stream
        bytes_ = n * (1 + 4 + 8 + 4)
        # ops: 16 circle taps x (sub, 2 cmp, 2 select, min/max) ~ 6 VPU ops
        # per tap + NMS 8 taps x 2
        ops = n * (16 * 6 + 8 * 2)
        add("fast9_nms_topk_720p", t, bytes_, ops, "vpu",
            "17 B/px stream; 112 VPU ops/px")

    # ---- Hamming BF match 2048x2048x256 (MXU)
    if want("hamming"):
        from compv_tpu.matchers.bruteforce import knn_match
        q = jnp.asarray(rs.integers(0, 2, (2048, 256), np.uint8))
        tdesc = jnp.asarray(rs.integers(0, 2, (2048, 256), np.uint8))

        def f(qq):
            m = knn_match(qq, tdesc, k=2)
            return jnp.sum(jnp.where(m.valid, m.distance, 0.0))
        t = slope(f, q, jax, jnp)
        ops = 2 * 2048 * 2048 * 256          # MAC-counted matmul
        bytes_ = 2 * 2048 * 256 + 2048 * 2048 * 4
        add("bf_hamming_2048x2048x256", t, bytes_, ops, "bf16",
            "one (2048,256)x(256,2048) matmul + row-min")

    # ---- histogram256 (nibble-matmul formulation)
    if want("hist"):
        from compv_tpu.image.histogram import histogram256

        def f(im):
            return jnp.sum(histogram256(im)).astype(jnp.float32)
        t = slope(f, gray, jax, jnp)
        bytes_ = n
        ops = n * 16 * 2 * 2   # two (n,16)-one-hot matmuls (hi/lo nibbles)
        add("histogram256_720p", t, bytes_, ops, "i8",
            "1 B/px stream; 64 int MACs/px")

    # ---- Hough SHT accumulate (Pallas fused one-hot matmul)
    if want("hough"):
        from compv_tpu.ops.pallas.hough_kernel import sht_accumulate_pallas
        E = 65536
        x = jnp.asarray(rs.integers(0, w, E).astype(np.float32))
        y = jnp.asarray(rs.integers(0, h, E).astype(np.float32))
        wt = jnp.asarray(np.ones(E, np.int32))
        rho_max = float(np.hypot(w, h))

        def f(xx):
            acc = sht_accumulate_pallas(xx, y, wt, 180, rho_max, 1.0,
                                        float(np.deg2rad(1.0)), w, h)
            return jnp.sum(acc).astype(jnp.float32)
        t = slope(f, x, jax, jnp)
        n_hi = 13
        ops = 2 * E * 180 * n_hi * 128       # int8 one-hot contraction
        bytes_ = 180 * E * 9 + 180 * 2944 * 4
        add("hough_sht_accumulate_E64k", t, bytes_, ops, "i8",
            "per-theta VMEM one-hot + (13,E)x(E,128) i8 dot")

    # ---- CCL labeling (Pallas whole-image-in-VMEM propagation)
    if want("ccl"):
        from compv_tpu.features.ccl import label_components

        def f(im):
            return jnp.sum(label_components(im)).astype(jnp.float32)
        t = slope(f, text_bin, jax, jnp)
        bytes_ = nt * (1 + 4)                # u8 in + i32 labels out, once
        iters = 40                            # measured on the text fixture
        ops = nt * iters * 10                # 4 rolls + 4 mins + mask + cmp
        add("ccl_label_1122x1182", t, bytes_, ops, "vpu",
            "VMEM-resident; ~40 iters x 10 VPU ops/px; HBM = in+out only")

    # ---- Wolf binarization (centered-i32 box moments)
    if want("wolf"):
        from compv_tpu.image.threshold import threshold_wolf

        def f(im):
            return jnp.sum(threshold_wolf(im, 41).astype(jnp.int32)
                           ).astype(jnp.float32)
        t = slope(f, gray, jax, jnp)
        bytes_ = n * (1 + 8 * 4 + 1)         # u8 in, 4 i32 prefix r/w x2, out
        ops = n * 30
        add("wolf_41x41_720p", t, bytes_, ops, "vpu",
            "4 cumsum passes + box diffs; ~34 B/px")

    # ---- one BA step at production scale (O=100k obs, 256 cams)
    if want("ba"):
        from compv_tpu.slam.ba import BAConfig, BAProblem, ba_step
        F, L, O = 256, 20000, 100000
        cams = jnp.asarray(rs.normal(0, 0.1, (F, 6)).astype(np.float32))
        lms = jnp.asarray(rs.normal(0, 1.0, (L, 3)).astype(np.float32)
                          + np.array([0, 0, 5], np.float32))
        intr = jnp.asarray([500.0, 500.0, 320.0, 240.0], jnp.float32)
        ci = jnp.asarray(rs.integers(0, F, O).astype(np.int32))
        li = jnp.asarray(rs.integers(0, L, O).astype(np.int32))
        uv = jnp.asarray(rs.normal(0, 50, (O, 2)).astype(np.float32)
                         + np.array([320, 240], np.float32))
        prob = BAProblem(cams, lms, intr, ci, li, uv,
                         jnp.ones(O, bool))
        cfg = BAConfig(cg_iterations=20)

        # MEASUREMENT NOTE (r4): on the axon tunnel, block_until_ready
        # returns BEFORE device completion when the queued work fits the
        # pipeline buffer — every timing here must sync by transferring a
        # VALUE (float(...)), like the fori-slope harness does. The r3
        # 16.5 s/step figure for the old AD-scatter ba_step was CORRECT
        # (re-confirmed in r4 with value-synced timing: 16.6 s/step);
        # the explicit-block rewrite below measures 46 ms/step = 359x.
        # Chained-dispatch slope with float() sync: step output feeds the
        # next step so the device serializes; the final value transfer
        # syncs the chain; per-call overhead cancels in the 1-vs-N diff.
        step = jax.jit(lambda p, lam: ba_step(p, lam, cfg)[0])
        lam = jnp.float32(1e-3)
        float(step(prob, lam).cameras[0, 0])

        def run(nit, fn=None):
            fn = fn or step
            t0 = time.perf_counter()
            p = prob
            for _ in range(nit):
                p = fn(p, lam)
            float(p.cameras[0, 0])               # TRUE sync
            return time.perf_counter() - t0
        run(3)
        t = max((run(13) - run(3)) / 10, 1e-7)
        # model: linearize (one jacfwd pass ~300 flop/obs) + 21 matvec-
        # equivalents x (Jv 18 MAC + JtU 18 MAC = 72 flop)/obs. The real
        # bound is the per-matvec indexed traffic (2 gathers + 2
        # scatter-adds of O rows), not flops — bytes_ models that:
        # 21 matvecs x O x 9 params x 4 B x (gather + scatter).
        ops = O * 300 + 21 * O * 72
        bytes_ = 21 * O * 9 * 4 * 2
        add(f"ba_step_O{O}_F{F} (1 chip)", t, bytes_, ops, "vpu",
            "explicit-block GN: 20 CG iters; camera side as one-hot MXU "
            "matmuls, landmark side index-add (597x the r3 AD path)")
        rows[-1]["extra"] = f"{1.0 / t:.1f} BA steps/s"

        # Schur direct step at the same scale (chunked W assembly)
        from compv_tpu.slam.ba_schur import (SchurConfig, ba_step_schur,
                                             max_obs_per_landmark)
        kmax = max_obs_per_landmark(prob.lm_idx, prob.valid, L)
        scfg = SchurConfig()
        sstep = jax.jit(lambda p, lam: ba_step_schur(
            p, lam, scfg, max_obs_per_lm=kmax)[0])
        float(sstep(prob, lam).cameras[0, 0])
        ts = max((run(8, sstep) - run(2, sstep)) / 6, 1e-7)
        # model: dominated by the chunked S build: one (F*6, Lc*3) x
        # (Lc*3, F*6) einsum per chunk over L/Lc chunks + one (6F)^3/3
        # Cholesky solve
        nch = -(-L // scfg.lm_chunk)
        ops_s = nch * 2 * (F * 6) ** 2 * (scfg.lm_chunk * 3) \
            + (6 * F) ** 3 // 3
        bytes_s = L * kmax * 18 * 4 * 4 + (F * 6) ** 2 * 4
        add(f"ba_schur_O{O}_F{F} (1 chip)", ts, bytes_s, ops_s, "bf16",
            "chunked S=Hcc-W Y W^T assembly (f32 MXU einsums) + dense solve")
        rows[-1]["extra"] = f"{1.0 / ts:.1f} Schur steps/s"

    # ---------------- report
    # merge with rows cached by earlier (possibly partial) runs so the
    # table can be built kernel-by-kernel: tunnel compiles are ~25 s each,
    # so one full-table process regularly outlives its timeout
    import json
    root0 = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(root0, "scripts", ".roofline_rows.json")
    merged = {}
    if os.path.exists(cache):
        with open(cache) as fh:
            loaded = json.load(fh)
        # rows cached by a run on a different device kind were measured
        # against different peaks — drop them rather than print them under
        # this device's header (ADVICE r3)
        merged = {k: v for k, v in loaded.items()
                  if v.get("device") == kind}
    for r in rows:
        r["device"] = kind
        merged[r["name"]] = r
    with open(cache, "w") as fh:
        json.dump(merged, fh, indent=1)
    rows = list(merged.values())

    hdr = (f"device: {kind} | peaks: bf16 {p_mxu_bf16/1e12:.0f} TFLOP/s, "
           f"int8 {p_mxu_i8/1e12:.0f} TOP/s, HBM {p_hbm/1e9:.0f} GB/s, "
           f"VPU(f32) {p_vpu/1e12:.1f} Top/s")
    print(hdr)
    lines = [
        "# ROOFLINE — per-kernel bytes/ops models vs chip peaks",
        "",
        f"`python scripts/roofline.py` snapshot. {hdr}",
        "",
        "Methodology: differential fori_loop slope (tunnel-latency-free);",
        "bytes/ops are explicit MODELS stated per row (not measured",
        "counters). '%peak' uses whichever unit the kernel targets.",
        "",
        "| kernel | time | GB/s (%HBM) | Tops/s (%unit) | model |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        line = (f"| {r['name']} | {r['t']*1e6:.0f} us | "
                f"{r['gbs']:.0f} ({r['pct_hbm']:.0f}%) | "
                f"{r['tops']:.2f} {r['unit']} ({r['pct_unit']:.1f}%) | "
                f"{r['model']} |")
        print(line)
        lines.append(line)
        if "extra" in r:
            print("   ", r["extra"])
            lines.append(f"| ... | {r['extra']} | | | |")

    lines += [
        "",
        "## Reading the table",
        "",
        "- **MEASUREMENT WARNING (r4, applies to everything on this",
        "  runtime)**: jax.block_until_ready can return BEFORE device",
        "  completion when queued work fits the tunnel's pipeline buffer.",
        "  Mid-r4 this produced phantom results (the 46 ms BA step",
        "  'measured' at 44 us; a 177 ms MSER at 0.93 ms). Only",
        "  value-transferring syncs (float(...)) are trustworthy; this",
        "  script and bench.py sync by value everywhere.",
        "- **ccl_label** is VMEM-resident: HBM%% is tiny BY DESIGN (in+out",
        "  only); the bound is VPU issue rate on the propagation steps.",
        "  At ~40 iterations x 10 ops/px it runs near the VPU roofline —",
        "  the kernel is compute-bound, not bandwidth-bound.",
        "- **bf_hamming** is the MXU showcase: one int-matmul; %%bf16-peak",
        "  is the MFU of the whole match (incl. row-min/top-2).",
        "- **hough_sht_accumulate**: r4 bound analysis (VERDICT task 5 —",
        "  '3x or show the bound is real'): the cost is the rho one-hot",
        "  BUILD and it is LANE-bound — the lo one-hot is an (E, 128)",
        "  tensor whose last dim occupies the full 128-lane vector unit",
        "  whatever the logical split, so shrinking the factorization",
        "  (41x41 instead of 13x128) does not reduce physical work.",
        "  Physical bound: E(65536) x 128 lanes x ~3 VPU ops x 180 thetas",
        "  / (8x128 lanes @ 0.94 GHz) = 4.7 ms; measured 6.4 ms = 73% of",
        "  bound. Falsified alternatives: bf16 one-hots == i8; multi-dim",
        "  dot_general unsupported by Mosaic; scatter bincount lowers",
        "  poorly. The r3 'E x 141 writes/theta' model undercounted by",
        "  assuming 1 op/element and lane-perfect packing of the 13-wide",
        "  hi factor. r5 (VERDICT task 6) falsified the sort-based",
        "  per-theta bincount with measurements at E=64k/180 thetas: the",
        "  batched (180, 65536) i32 sort ALONE is 3.64 ms (57% of the",
        "  entire current row before any accumulator exists), and",
        "  rebuilding the dense (180, 1664) accumulator from the sorted",
        "  rows needs either a first-occurrence scatter-min (measured",
        "  106.9 ms — TPU scatter, as always) or a second same-size",
        "  compaction sort (+3.6 ms) — every variant lands at >= 6.4 ms.",
        "  The E log E VPU cost model does not beat the lane-bound",
        "  one-hot at this problem size; the one-hot stays.",
        "- **ba_step**: the r3 16.5 s/step for the AD-scatter path was",
        "  real (re-confirmed 16.6 s/step with value-synced timing). The",
        "  r4 explicit-block rewrite measured 46 ms/step; replacing the",
        "  camera-side gather/scatter with matmuls against a hoisted",
        "  (F, O) one-hot halved the CG matvec (1.92 -> 0.95 ms), and",
        "  routing the linearizer's and residual passes' camera gathers",
        "  through the same one-hot brought the step to 22.8 ms — 727x",
        "  the AD path. r5: the one-hot contractions now run at",
        "  Precision.HIGHEST (the default TPU dot truncates operands to",
        "  bf16, which silently broke the 'exact gather' contract — r4",
        "  ADVICE), and ba_schur masks capacity-dropped observations out",
        "  of Hcc/gc so the normal equations stay self-consistent;",
        "  exactness costs ~15% (26.6 ms/step, 37.6 GN steps/s; Schur",
        "  54.3 ms) and is verified against the gather path to 1e-5 on",
        "  hardware by scripts/tpu_checks.py. Remaining cost splits",
        "  between the landmark-side gather+index-add (an (L, O) one-hot",
        "  would not fit) and the jacfwd linearize.",
        "- **wolf/histogram/fast9** are HBM-streaming kernels; their GB/s",
        "  column is the honest utilization number.",
        "- **frontend_pair_720p** (bench row, r5 VERDICT task 3): the",
        "  reference's live pipeline (samples/object_recognition) as one",
        "  jitted graph — ORB(2000) x2 + KNN2 + RANSAC-H per frame pair.",
        "  r5 budget at 121 fps (8.3 ms/pair): ORB detect+describe",
        "  3.3 ms/image (detect+topk 0.4, orientation ~0.5 via",
        "  incremental shifted-window moment maps, describe ~2.4 via",
        "  31x31 patch slices + row/col one-hot MXU sampling — bit-exact",
        "  vs the (K,256) element gathers it replaces, which cost 10 ms),",
        "  KNN2 0.9 ms, RANSAC-H ~0.8 ms (closed-form projective-basis",
        "  4-point solves; the vmapped 9x9 eigh it replaces cost 8 ms).",
        "  Baseline is derived CONSERVATIVELY from the reference's",
        "  published component rows (2xFAST + linearly-scaled matcher;",
        "  unpublished stages excluded): 48 fps -> 2.5x.",
        "- **mser** (measured in bench as mser_text): r5 rebuilt the two",
        "  dominant stages of the honest 173 ms r4 profile (ladder 59 ms",
        "  + strip histograms 100 ms + tables 13 ms). (1) The seeded",
        "  labeler left the noisy flood level UNCONVERGED at cap 96 —",
        "  with ~0.5% background holes a d=512 all-fg jump window almost",
        "  never exists (0.995^512 ~ 8%) — so every frame paid the XLA",
        "  pointer-jump fallback (~35 ms); jump dists (8,32,128) at cap",
        "  256 converge it in-kernel (114 iters, 4.3 ms). (2) Per-level",
        "  areas now come from RUN records via two folded per-row sorts",
        "  + one u32-packed (label<<lenbits|len) R-sort + segmented",
        "  prefix sums, with per-level capacity tiers (112/320/exact",
        "  ceil(W/2)) dispatched on max runs/row so only flood levels",
        "  pay wide sorts; this replaces the per-strip Pallas label",
        "  enumeration, whose serial next=min(l>cur) chain measured",
        "  ~450 ns of scalar-sync overhead per distinct label per strip",
        "  (3.2 ms at 7.1k strip-labels, level 115) — and a probe showed",
        "  delta-masking would NOT have helped (changed-label rounds",
        "  405k >= present-label rounds 347k on the noisy fixture).",
        "  Honest r5 standing: 67.7 ms/frame = 14.8 fps = 0.40x",
        "  (was 0.155x), split ~24 ms ladder (525 propagation iters",
        "  across 51 levels) + ~26 ms run-sort areas + ~15 ms stability",
        "  tables + top-k/boxes. The remaining 2.5x to parity needs the",
        "  per-level sorts amortized ACROSS levels (the reference pays",
        "  component-tree-sized work once; every dense formulation here",
        "  pays per level x per record) — unsolved this round.",
        "- **ccl box extraction** (measured in bench as ccl_boxes_text):",
        "  r5 rebuilt it on per-RUN records — the reference's own design",
        "  (boxes from cached RLE runs, compv_core_ccl_lsl_result.cxx) —",
        "  at 0.66 ms/frame (1512 fps, 0.145x), 10x the r4 pixel-sort",
        "  formulation (6.5 ms). Pipeline: run compaction by two per-row",
        "  FOLDED sorts (a run start needs bg on its left, so adjacent",
        "  columns can never both host one -> sort width W/2; the start",
        "  key packs (x << 21 | label) into one u32 so no value arrays",
        "  ride along; 87 us for both sorts at 1122x1182), then ONE",
        "  R = H*128 = 151k-record sort groups runs by label (~330 us),",
        "  then segmented cumsum/cummin passes (monotone-offset trick,",
        "  no associative_scan) + an exact top-C sort. The remaining",
        "  ~7x gap to the reference's ~96 us cached-RLE CPU walk is the",
        "  price of GROUPING ~45k runs without a serial pass: XLA sort",
        "  is the only ns/record irregular-grouping primitive on this",
        "  backend, and R is padded 3.4x (capacity 128 runs/row vs mean",
        "  37.8) because compaction-before-sorting is itself the problem",
        "  being solved. Falsified alternatives (measured, this fixture):",
        "  pixel sort 1.9 ms + assoc-scan pair 3.5 ms (the r4 design);",
        "  gather grouping ~7 ns/elt = 9+ ms; scatter-add histogram ~=",
        "  gathers; per-strip Pallas enumeration ~450 ns/label = 20+ ms;",
        "  stable sorts +50% over unstable. The compaction rung IS built",
        "  (r5, ops/pallas/compact_kernel.py): a Pallas ragged row",
        "  compactor copies each row's 8-aligned record prefix to its",
        "  cumsum offset ((1,8) sublane stores; dynamic LANE offsets are",
        "  not addressable, so records are pre-reshaped (H, K/8, 8)) in",
        "  43 us, shrinking the record sort 151k -> 65k: 0.52 ms/frame,",
        "  1929 fps, 0.184x (12x the r4 row). Remaining budget: ~90 us",
        "  extraction sorts + ~100 us compact/build + ~180 us 65k record",
        "  sort + ~150 us segmented stats/top-C — all sort/scan passes",
        "  within ~2x of their individual floors; the reference's ~96 us",
        "  serial RLE walk stays out of reach without a serial pass.",
        "  Extraction stays verified exactly against the scipy oracle,",
        "  and rows with >128 runs (or compactor-capacity overflow)",
        "  divert to the (r4, capacity-free) pixel path under lax.cond.",
        "",
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "ROOFLINE.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote ROOFLINE.md")


if __name__ == "__main__":
    main()
