"""Zhang calibration tests: synthetic camera with known K/dist/poses ->
calibrate -> recover. Mirrors the reference's test strategy
(tests/math/calib_camera.cxx: reproj error must not increase after LM)."""
import jax.numpy as jnp
import numpy as np
import pytest

from compv_tpu.calib.camera import (
    CalibrationConfig, calibrate_camera, checkerboard_object_points,
    extrinsics_from_homography, intrinsics_from_homographies,
)
from compv_tpu.calib.homography import compute_homography_dlt
from compv_tpu.calib.lm import LMConfig, levenberg_marquardt
from compv_tpu.calib.utils import (
    build_undistort_map, project_points_dist, reproj_error_rms,
    undistort_image, undistort_points,
)
from compv_tpu.slam.ba import rodrigues_to_matrix


K_TRUE = np.array([[800.0, 0.0, 320.0],
                   [0.0, 810.0, 240.0],
                   [0.0, 0.0, 1.0]])
DIST_TRUE = np.array([-0.20, 0.05, 0.0, 0.0])


def synth_views(n_views=5, rows=6, cols=8, square=30.0, noise=0.0, seed=0,
                dist=DIST_TRUE):
    rs = np.random.default_rng(seed)
    obj = np.asarray(checkerboard_object_points(rows, cols, square))
    img_pts = []
    rvecs, tvecs = [], []
    for i in range(n_views):
        rvec = np.array([0.12, -0.1, 0.05]) * (i - 2) + rs.normal(0, 0.03, 3)
        tvec = np.array([-cols * square / 2, -rows * square / 2, 900.0]
                        ) + rs.normal(0, 12.0, 3)
        proj = np.asarray(project_points_dist(
            jnp.asarray(obj), jnp.asarray(K_TRUE, jnp.float32),
            jnp.asarray(dist, jnp.float32), jnp.asarray(rvec, jnp.float32),
            jnp.asarray(tvec, jnp.float32)))
        img_pts.append(proj + rs.normal(0, noise, proj.shape))
        rvecs.append(rvec)
        tvecs.append(tvec)
    return obj, np.stack(img_pts), np.stack(rvecs), np.stack(tvecs)


class TestLM:
    def test_rosenbrock_style(self):
        def resid(x):
            return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])
        res = levenberg_marquardt(resid, jnp.asarray([-1.2, 1.0]),
                                  LMConfig(iterations=60))
        np.testing.assert_allclose(np.asarray(res.params), [1.0, 1.0],
                                   atol=1e-3)
        assert float(res.cost) < 1e-8

    def test_never_worse(self):
        def resid(x):
            return x * x - 2.0
        res = levenberg_marquardt(resid, jnp.asarray([5.0, -3.0]))
        assert float(res.cost) <= float(res.initial_cost)


class TestZhangClosedForm:
    def test_intrinsics_no_distortion(self):
        obj, img_pts, _, _ = synth_views(dist=np.zeros(4))
        src = jnp.asarray(obj[:, :2], jnp.float32)
        hs = jnp.stack([compute_homography_dlt(src, jnp.asarray(p, jnp.float32))
                        for p in img_pts])
        k = np.asarray(intrinsics_from_homographies(hs))
        assert abs(k[0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0] < 0.03
        assert abs(k[1, 1] - K_TRUE[1, 1]) / K_TRUE[1, 1] < 0.03
        assert abs(k[0, 2] - K_TRUE[0, 2]) < 15
        assert abs(k[1, 2] - K_TRUE[1, 2]) < 15

    def test_extrinsics_recovered(self):
        obj, img_pts, rvecs, tvecs = synth_views(dist=np.zeros(4))
        src = jnp.asarray(obj[:, :2], jnp.float32)
        h = compute_homography_dlt(src, jnp.asarray(img_pts[2], jnp.float32))
        r, t = extrinsics_from_homography(h, jnp.asarray(K_TRUE, jnp.float32))
        r_true = np.asarray(rodrigues_to_matrix(jnp.asarray(rvecs[2], jnp.float32)))
        np.testing.assert_allclose(np.asarray(r), r_true, atol=0.02)
        np.testing.assert_allclose(np.asarray(t), tvecs[2], rtol=0.03)


@pytest.mark.slow
class TestFullCalibration:
    def test_recovers_k_and_distortion(self):
        obj, img_pts, _, _ = synth_views(noise=0.1)
        res = calibrate_camera(jnp.asarray(obj, jnp.float32),
                               jnp.asarray(img_pts, jnp.float32))
        k = np.asarray(res.k)
        d = np.asarray(res.dist)
        assert abs(k[0, 0] - 800) / 800 < 0.01
        assert abs(k[1, 1] - 810) / 810 < 0.01
        assert abs(k[0, 2] - 320) < 4
        assert abs(k[1, 2] - 240) < 4
        assert abs(d[0] - (-0.20)) < 0.02
        assert abs(d[1] - 0.05) < 0.05
        assert float(res.rms) < 0.5  # sub-pixel after LM

    def test_lm_never_increases_error(self):
        obj, img_pts, _, _ = synth_views(noise=0.5, seed=3)
        res = calibrate_camera(jnp.asarray(obj, jnp.float32),
                               jnp.asarray(img_pts, jnp.float32))
        assert float(res.rms) <= float(res.rms_initial) + 1e-6


class TestUndistort:
    def test_roundtrip_points(self):
        rs = np.random.default_rng(1)
        pts = rs.uniform(50, 550, (100, 2)).astype(np.float32)
        k = jnp.asarray(K_TRUE, jnp.float32)
        d = jnp.asarray(DIST_TRUE, jnp.float32)
        und = undistort_points(jnp.asarray(pts), k, d)
        # re-distort via the normalized pipeline
        from compv_tpu.calib.utils import distort_normalized
        xn = (np.asarray(und)[:, 0] - 320) / 800
        yn = (np.asarray(und)[:, 1] - 240) / 810
        xd, yd = distort_normalized(jnp.asarray(xn, jnp.float32),
                                    jnp.asarray(yn, jnp.float32), d)
        back = np.stack([np.asarray(xd) * 800 + 320,
                         np.asarray(yd) * 810 + 240], 1)
        np.testing.assert_allclose(back, pts, atol=0.05)

    def test_undistort_image_shape(self):
        rs = np.random.default_rng(2)
        img = rs.integers(0, 255, (480, 640), dtype=np.uint8)
        out = undistort_image(jnp.asarray(img), jnp.asarray(K_TRUE, jnp.float32),
                              jnp.asarray(DIST_TRUE, jnp.float32))
        assert out.shape == img.shape
        assert out.dtype == img.dtype

    def test_map_identity_when_no_distortion(self):
        mx, my = build_undistort_map(jnp.asarray(K_TRUE, jnp.float32),
                                     jnp.zeros(4, jnp.float32), 48, 64)
        np.testing.assert_allclose(np.asarray(mx)[10], np.arange(64), atol=1e-3)
        np.testing.assert_allclose(np.asarray(my)[:, 5], np.arange(48), atol=1e-3)
