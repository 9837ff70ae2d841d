"""Hough line transforms: SHT (standard) and KHT-style kernel voting.

Reference:
  * SHT: core/features/hough/compv_core_feature_houghsht.cxx:96 — rho/theta
    accumulator built per-thread then merged (:350), 4-neighbor NMS (:483),
    sort by strength, toCartesian.
  * KHT: core/features/hough/compv_core_feature_houghkht.cxx:208 — edge
    chains -> clusters -> per-cluster elliptical-Gaussian kernel votes.

TPU redesign: the accumulator is a batched weighted bincount lowered to int8
MXU matmuls (ops/bincount.py) — scatter-add measured ~60 ns/element on TPU,
the matmul form is HBM-bandwidth bound. The per-thread clone+merge
disappears (the matmul reduction IS the merge, bit-deterministic). Edge
pixels live in a fixed-capacity padded list. The KHT variant keeps the
*voting model* (votes weighted by local line support) but replaces
sequential cluster linking with per-pixel orientation-coherence weights — a
dense reformulation (SURVEY.md §7 'hard parts').
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from compv_tpu.core.types import Lines
from compv_tpu.ops.bincount import batched_weighted_bincount
from compv_tpu.ops.pallas.hough_kernel import sht_accumulate_pallas
from compv_tpu.ops.topk import select_top_k_2d

__all__ = ["HoughShtConfig", "hough_sht", "hough_sht_stats",
           "hough_lines_to_cartesian", "HoughKhtConfig", "hough_kht"]


@dataclass(frozen=True)
class HoughShtConfig:
    rho: float = 1.0            # rho resolution (COMPV_HOUGH_SET_FLT32_RHO)
    theta_step_deg: float = 1.0  # theta resolution
    threshold: float = 100       # min votes (COMPV_HOUGH_SET_INT_THRESHOLD);
                                 # values < 1.0 mean a fraction of the peak
                                 # accumulator value (scale-invariant mode)
    max_lines: int = 64          # fixed output capacity
    max_edge_points: int = 65536   # fixed edge-list capacity — covers ~7%
                                   # edge density at 720p (a dense Canny map
                                   # is 3-8%, the bench scene measures 2.7%).
                                   # Accumulation cost scales with CAPACITY
                                   # (static shapes), so the default tracks
                                   # the dense regime instead of 2x it.
                                   # If exceeded, the STRONGEST edges are
                                   # kept (never an arbitrary subset) and
                                   # hough_sht_stats reports truncation.


def _edge_list(edges: jax.Array, capacity: int,
               strengths: jax.Array | None = None):
    """All edge pixels if they fit in `capacity`, else the `capacity`
    strongest (ranked by `strengths` when given, e.g. gradient magnitude;
    binary maps rank by the map itself). Exact top-k: the reference
    accumulates every edge pixel (houghsht.cxx:350), so the extraction must
    never drop edges below capacity — approx_max_k could. Returns
    (x, y, valid)."""
    h, w = edges.shape
    k = min(capacity, h * w)
    rank = edges if strengths is None else jnp.where(edges > 0, strengths, 0)
    vals, idx = select_top_k_2d(rank, k, exact=True)
    valid = vals > 0
    return (idx % w).astype(jnp.float32), (idx // w).astype(jnp.float32), valid


def _rho_bins(x, y, n_theta: int, rho_max: float, rho_step: float,
              theta_step: float):
    """(A, E) rho-bin index of every edge point at every theta."""
    thetas = jnp.arange(n_theta, dtype=jnp.float32) * theta_step
    cos_t = jnp.cos(thetas)
    sin_t = jnp.sin(thetas)
    rho = cos_t[:, None] * x[None, :] + sin_t[:, None] * y[None, :]  # (A, E)
    n_rho = int(np.ceil(2 * rho_max / rho_step)) + 1
    rbin = jnp.round((rho + rho_max) / rho_step).astype(jnp.int32)
    return jnp.clip(rbin, 0, n_rho - 1), n_rho


def _accumulate(x, y, valid, weights, n_theta: int, rho_max: float,
                rho_step: float, theta_step: float, img_w: int | None = None):
    """(A, R) accumulator: for every edge point and every theta bin, vote
    round((x cos + y sin + rho_max)/step).

    Scatter-free. On TPU: a Pallas kernel fusing the one-hot build with the
    int8 MXU contraction in VMEM (ops/pallas/hough_kernel.py) — the XLA
    form materializes ~3.5 GB of one-hots per 720p frame (measured 44 ms vs
    ~3 ms fused). On CPU (and when weights aren't 0/1): per-theta weighted
    bincount as batched matmuls (ops/bincount.py). Both are bit-exact
    per-edge-per-theta accumulation; the reference's per-thread clone +
    merge (houghsht.cxx:184-196) disappears — the reduction is the merge.
    `img_w` (image width) tightens the per-theta rho window for the Pallas
    path; without it the window is bounded by rho_max."""
    n_rho = int(np.ceil(2 * rho_max / rho_step)) + 1
    if jax.default_backend() == "tpu":
        w_row = (weights * valid).astype(jnp.int32)
        acc = sht_accumulate_pallas(
            x, y, w_row, n_theta, rho_max, rho_step, theta_step,
            int(img_w) if img_w else int(np.ceil(rho_max)),
            int(np.ceil(rho_max))).astype(jnp.float32)
        return acc, n_rho
    rbin, n_rho = _rho_bins(x, y, n_theta, rho_max, rho_step, theta_step)
    w_row = (weights * valid).astype(jnp.int32)          # (E,)
    w = jnp.broadcast_to(w_row[None, :], rbin.shape)
    acc = batched_weighted_bincount(rbin, w, n_rho).astype(jnp.float32)
    return acc, n_rho


def _acc_nms_topk(acc: jax.Array, threshold: float, max_lines: int,
                  rho_max: float, rho_step: float, theta_step: float) -> Lines:
    """4-neighbor NMS on the accumulator (houghsht.cxx:483) then top-K.

    lax.top_k over the full accumulator is a flat ~2 ms on TPU (it lowers to
    a sort); instead take the top-2 NMS survivors per 64-bin rho segment
    (NMS peaks are >= 2 bins apart, so a segment holds at most ~21 peaks but
    nearly always <= 2 above threshold) and run the exact top-K on the ~16k
    candidates. A peak is only lost if 3+ above-threshold NMS survivors
    share one 64-bin segment AND the lost one belongs in the global top-K."""
    n_theta, n_rho = acc.shape
    p = jnp.pad(acc, 1)

    def sl(dy, dx):
        return jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (n_theta, n_rho))

    is_max = ((acc > sl(0, -1)) & (acc >= sl(0, 1))
              & (acc > sl(-1, 0)) & (acc >= sl(1, 0)))
    kept = jnp.where(is_max & (acc >= threshold), acc, 0.0)

    seg = 64
    nseg = -(-n_rho // seg)
    k3 = jnp.pad(kept, ((0, 0), (0, nseg * seg - n_rho))
                 ).reshape(n_theta, nseg, seg)
    a1 = jnp.argmax(k3, axis=-1)
    m1 = jnp.take_along_axis(k3, a1[..., None], axis=-1)[..., 0]
    iota = jax.lax.broadcasted_iota(jnp.int32, k3.shape, 2)
    k3b = jnp.where(iota == a1[..., None], -1.0, k3)
    a2 = jnp.argmax(k3b, axis=-1)
    m2 = jnp.take_along_axis(k3b, a2[..., None], axis=-1)[..., 0]

    cand_vals = jnp.stack([m1, m2], -1).ravel()        # (n_theta*nseg*2,)
    cand_rbin = (jax.lax.broadcasted_iota(
        jnp.int32, (n_theta, nseg, 2), 1) * seg
        + jnp.stack([a1, a2], -1).astype(jnp.int32)).ravel()
    cand_tbin = jax.lax.broadcasted_iota(
        jnp.int32, (n_theta, nseg, 2), 0).ravel()

    vals, idx = jax.lax.top_k(cand_vals, max_lines)
    valid = vals > 0
    tbin = cand_tbin[idx].astype(jnp.float32)
    rbin = cand_rbin[idx].astype(jnp.float32)
    return Lines(
        rho=jnp.where(valid, rbin * rho_step - rho_max, 0.0),
        theta=jnp.where(valid, tbin * theta_step, 0.0),
        strength=jnp.where(valid, vals, 0.0),
        valid=valid,
    )


@partial(jax.jit, static_argnames=("config", "shape"))
def _hough_sht_impl(edges, strengths, config: HoughShtConfig, shape):
    h, w = shape
    theta_step = float(np.deg2rad(config.theta_step_deg))
    n_theta = int(np.round(np.pi / theta_step))
    rho_max = float(np.hypot(h, w))
    x, y, valid = _edge_list(edges, config.max_edge_points, strengths)
    weights = jnp.ones_like(x)
    acc, _ = _accumulate(x, y, valid, weights, n_theta, rho_max,
                         config.rho, theta_step, img_w=w)
    thr = (jnp.asarray(config.threshold, jnp.float32) if config.threshold >= 1.0
           else config.threshold * jnp.max(acc))
    lines = _acc_nms_topk(acc, thr, config.max_lines,
                          rho_max, config.rho, theta_step)
    n_edges = jnp.sum(edges > 0)
    return lines, n_edges


def hough_sht(edges: jax.Array, config: HoughShtConfig = HoughShtConfig(),
              strengths: jax.Array | None = None) -> Lines:
    """Standard Hough transform on a binary edge map (u8, nonzero=edge).
    Optional `strengths` (e.g. gradient magnitude) ranks edge retention if
    the map overflows config.max_edge_points."""
    return _hough_sht_impl(edges, strengths, config, edges.shape)[0]


def hough_sht_stats(edges: jax.Array,
                    config: HoughShtConfig = HoughShtConfig(),
                    strengths: jax.Array | None = None):
    """Like hough_sht but also returns accumulation stats so vote loss is
    never silent: dict(n_edges, capacity, truncated)."""
    lines, n_edges = _hough_sht_impl(edges, strengths, config, edges.shape)
    n = int(n_edges)
    return lines, {"n_edges": n, "capacity": config.max_edge_points,
                   "truncated": n > config.max_edge_points}


def hough_lines_to_cartesian(lines: Lines, width: int, height: int):
    """Polar (rho, theta) -> segment endpoints clipped to a long span, like
    the reference's toCartesian (houghsht.cxx). Returns (L, 4) [x0,y0,x1,y1]."""
    c = jnp.cos(lines.theta)
    s = jnp.sin(lines.theta)
    x0 = c * lines.rho
    y0 = s * lines.rho
    span = float(np.hypot(width, height))
    return jnp.stack([x0 - span * s, y0 + span * c,
                      x0 + span * s, y0 - span * c], axis=1)


# ---------------------------------------------------------------- KHT-style

@dataclass(frozen=True)
class HoughKhtConfig:
    rho: float = 1.0
    theta_step_deg: float = 0.5
    threshold_ratio: float = 0.25   # of the PEAK accumulator vote — the
                                    # reference KHT accepts lines relative
                                    # to the strongest (relative GS,
                                    # houghkht.cxx); total-mass-relative
                                    # thresholds collapse as scene line
                                    # count grows (votes split over more
                                    # peaks while total mass stays put)
    max_lines: int = 64
    min_votes: float = 30.0         # absolute significance floor — the
                                    # dense analogue of KHT's minimum chain
                                    # length: a real line needs this many
                                    # orientation-coherent supporters, so a
                                    # pure-noise peak can't clear it
    max_edge_points: int = 8192     # strongest-gradient retention: KHT votes
                                    # only from significant kernels, so a
                                    # tight budget of the sharpest edges is
                                    # the method's own pruning semantics


@partial(jax.jit, static_argnames=("config", "shape"))
def _hough_kht_impl(edges, gx, gy, config: HoughKhtConfig, shape):
    """Orientation-weighted voting: each edge pixel votes only near its own
    gradient-normal angle (+-1 bin), weighted by gradient coherence — the
    dense analogue of KHT's cluster-kernel voting (houghkht.cxx:208). This
    concentrates votes like KHT (few, sharp peaks) without sequential chain
    linking."""
    h, w = shape
    theta_step = float(np.deg2rad(config.theta_step_deg))
    n_theta = int(np.round(np.pi / theta_step))
    rho_max = float(np.hypot(h, w))
    n_rho = int(np.ceil(2 * rho_max / config.rho)) + 1

    # rank edge retention by gradient magnitude: if the map overflows
    # capacity, the strongest (most KHT-significant) edges survive — the
    # dense analogue of KHT's "significant kernels only" pruning
    # approx_max_k retention: KHT's "significant kernels only" pruning is
    # itself a heuristic, so hardware PartialReduce (recall ~0.95, ~10x
    # cheaper than exact top-k) is an acceptable ranking here — unlike SHT,
    # where the oracle requires every edge accumulated.
    # +1 floor keeps edge pixels whose own gradient vanishes (the center of
    # a 1-px line is symmetric -> zero sobel response ON the pixel; its
    # orientation still comes from the structure tensor of the 3x3 hood)
    rank = jnp.where(edges > 0, 1.0 + gx * gx + gy * gy, 0.0)
    vk, ik = select_top_k_2d(rank, min(config.max_edge_points, h * w),
                             exact=False)
    x = (ik % w).astype(jnp.float32)
    y = (ik // w).astype(jnp.float32)
    valid = vk > 0
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    # orientation tensor (structure tensor) is sign-invariant — the right
    # way to average gradient directions across an edge
    p_gx = jnp.pad(gx, 1)
    p_gy = jnp.pad(gy, 1)
    jxx = jnp.zeros_like(gx)
    jxy = jnp.zeros_like(gx)
    jyy = jnp.zeros_like(gx)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            gxs = jax.lax.dynamic_slice(p_gx, (1 + dy, 1 + dx), (h, w))
            gys = jax.lax.dynamic_slice(p_gy, (1 + dy, 1 + dx), (h, w))
            jxx = jxx + gxs * gxs
            jxy = jxy + gxs * gys
            jyy = jyy + gys * gys
    # dominant orientation of the structure tensor: angle of the major
    # eigenvector = 0.5 * atan2(2 Jxy, Jxx - Jyy)
    ang_map = 0.5 * jnp.arctan2(2.0 * jxy, jxx - jyy)
    ang = ang_map[yi, xi]
    ang = jnp.where(ang < 0, ang + jnp.pi, ang)
    tcenter = jnp.round(ang / theta_step).astype(jnp.int32) % n_theta

    # KHT votes are SPARSE in theta (3 of n_theta bins per point), so the
    # dense MXU bincount that wins for SHT loses here (measured 73 vs 330
    # fps at 720p) — a 3E-element scatter stays the right tool
    acc = jnp.zeros((n_theta, n_rho), jnp.float32)
    for dt in (-1, 0, 1):
        tb = (tcenter + dt) % n_theta
        th = tb.astype(jnp.float32) * theta_step
        rho = x * jnp.cos(th) + y * jnp.sin(th)
        rb = jnp.clip(jnp.round((rho + rho_max) / config.rho).astype(jnp.int32),
                      0, n_rho - 1)
        wgt = jnp.where(valid, jnp.where(dt == 0, 1.0, 0.5), 0.0)
        acc = acc.at[tb, rb].add(wgt)

    peak = jnp.maximum(jnp.max(acc), 1.0)
    thr = jnp.maximum(peak * config.threshold_ratio, config.min_votes)
    return _acc_nms_topk(acc, thr, config.max_lines, rho_max, config.rho,
                         theta_step)


def hough_kht(edges: jax.Array, gx: jax.Array, gy: jax.Array,
              config: HoughKhtConfig = HoughKhtConfig()) -> Lines:
    """KHT-style orientation-weighted Hough. Needs the gradients used to
    build ``edges`` (e.g. from features.edges.sobel_gradients)."""
    return _hough_kht_impl(edges, gx, gy, config, edges.shape)
