"""Checkerboard corner detection tests: render a synthetic board, detect,
compare to known corner grid; then the full image->calibration pipeline."""
import jax.numpy as jnp
import numpy as np
import pytest

from compv_tpu.calib.checkerboard import (
    CheckerboardConfig, find_chessboard_corners, line_intersections,
)


def render_board(rows=6, cols=8, square=40, margin=60, angle_deg=0.0):
    """Chessboard with (rows x cols) INNER corners => (rows+1)x(cols+1)
    squares. Returns (image u8, inner corners (rows*cols, 2) row-major)."""
    h = (rows + 1) * square + 2 * margin
    w = (cols + 1) * square + 2 * margin
    yy, xx = np.mgrid[0:h, 0:w]
    if angle_deg:
        th = np.deg2rad(angle_deg)
        cx, cy = w / 2, h / 2
        xr = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th) + cx
        yr = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th) + cy
    else:
        xr, yr = xx.astype(float), yy.astype(float)
    ix = np.floor((xr - margin) / square).astype(int)
    iy = np.floor((yr - margin) / square).astype(int)
    board = ((ix + iy) % 2 == 0) & (ix >= 0) & (ix <= cols) & (iy >= 0) & (iy <= rows)
    img = np.where(board, 230, 30).astype(np.uint8)

    corners = []
    for r in range(1, rows + 1):
        for c in range(1, cols + 1):
            x = margin + c * square
            y = margin + r * square
            if angle_deg:
                th = np.deg2rad(angle_deg)
                cxy = np.array([w / 2, h / 2])
                p = np.array([x, y]) - cxy
                x, y = (p[0] * np.cos(th) - p[1] * np.sin(th) + cxy[0],
                        p[0] * np.sin(th) + p[1] * np.cos(th) + cxy[1])
            corners.append([x, y])
    return img, np.array(corners)


class TestIntersections:
    def test_axis_aligned(self):
        x, y = line_intersections(jnp.asarray(20.0), jnp.asarray(np.pi / 2),
                                  jnp.asarray(40.0), jnp.asarray(0.0))
        assert abs(float(x) - 40) < 1e-5
        assert abs(float(y) - 20) < 1e-5


class TestCheckerboard:
    def test_axis_aligned_board(self):
        img, want = render_board()
        cfg = CheckerboardConfig(rows=6, cols=8, hough_threshold=60)
        res = find_chessboard_corners(jnp.asarray(img), cfg)
        assert bool(res.valid)
        got = np.asarray(res.corners)
        assert got.shape == (48, 2)
        err = np.abs(got - want)
        assert err.max() < 3.0  # hough rho quantization

    def test_rotated_board(self):
        img, want = render_board(angle_deg=12)
        cfg = CheckerboardConfig(rows=6, cols=8, hough_threshold=60)
        res = find_chessboard_corners(jnp.asarray(img), cfg)
        assert bool(res.valid)
        got = np.asarray(res.corners)
        # row-major ordering must match (corners sorted by the rho of the
        # two line families)
        err = np.abs(got - want)
        assert err.max() < 4.0

    def test_no_board(self):
        rs = np.random.default_rng(0)
        img = rs.integers(0, 255, (200, 200), dtype=np.uint8)
        res = find_chessboard_corners(jnp.asarray(img),
                                      CheckerboardConfig(rows=6, cols=8))
        assert not bool(res.valid)


@pytest.mark.slow
class TestImageToCalibration:
    def test_full_pipeline(self):
        """Multiple rendered boards -> detected corners -> calibrate.
        Synthetic flat boards (no perspective) degenerate for Zhang, so
        warp them with mild homographies of known K instead."""
        from compv_tpu.calib.camera import (
            calibrate_camera, checkerboard_object_points,
        )
        from compv_tpu.calib.utils import project_points_dist
        from compv_tpu.image.remap import warp_perspective
        from compv_tpu.slam.ba import rodrigues_to_matrix

        rows, cols, square = 6, 8, 40.0
        k_true = np.array([[700.0, 0, 330.0], [0, 700.0, 250.0], [0, 0, 1.0]])
        obj = np.asarray(checkerboard_object_points(rows, cols, square))
        base_img, base_corners = render_board(rows, cols, int(square))

        img_pts = []
        rs = np.random.default_rng(4)
        for i in range(4):
            rvec = np.array([0.25, -0.2, 0.1]) * (i - 1.5)
            tvec = np.array([-cols * square / 2, -rows * square / 2, 1400.0])
            proj = np.asarray(project_points_dist(
                jnp.asarray(obj, jnp.float32), jnp.asarray(k_true, jnp.float32),
                jnp.zeros(4, jnp.float32), jnp.asarray(rvec, jnp.float32),
                jnp.asarray(tvec, jnp.float32)))
            # homography mapping the flat render's corners to this view
            from compv_tpu.calib.homography import compute_homography_dlt
            h = np.asarray(compute_homography_dlt(
                jnp.asarray(base_corners, jnp.float32),
                jnp.asarray(proj, jnp.float32)))
            hinv = np.linalg.inv(h)
            view = np.asarray(warp_perspective(
                jnp.asarray(base_img), jnp.asarray(hinv, jnp.float32),
                500, 660, fill=128.0))
            res = find_chessboard_corners(
                jnp.asarray(view),
                CheckerboardConfig(rows=rows, cols=cols, hough_threshold=50))
            if not bool(res.valid):
                continue
            img_pts.append(np.asarray(res.corners))

        assert len(img_pts) >= 3, "not enough boards detected"
        cres = calibrate_camera(jnp.asarray(obj, jnp.float32),
                                jnp.asarray(np.stack(img_pts), jnp.float32))
        k = np.asarray(cres.k)
        # corner detection is hough-quantized (~1-2 px), so tolerances are loose
        assert abs(k[0, 0] - 700) / 700 < 0.15
        assert abs(k[1, 1] - 700) / 700 < 0.15
        assert float(cres.rms) < 5.0
