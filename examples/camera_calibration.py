"""Camera calibration demo (reference: tests/math/calib_camera.cxx chain):
render chessboard views -> detect corners -> Zhang calibrate -> undistort.
"""
import numpy as np

from common import out_path

import jax.numpy as jnp
from compv_tpu.calib.camera import calibrate_camera, checkerboard_object_points
from compv_tpu.calib.checkerboard import CheckerboardConfig, find_chessboard_corners
from compv_tpu.calib.homography import compute_homography_dlt
from compv_tpu.calib.utils import project_points_dist, undistort_image
from compv_tpu.image import warp_perspective
from compv_tpu.io import write_image


def render_board(rows, cols, square, margin=60):
    h = (rows + 1) * square + 2 * margin
    w = (cols + 1) * square + 2 * margin
    yy, xx = np.mgrid[0:h, 0:w]
    ix = (xx - margin) // square
    iy = (yy - margin) // square
    board = ((ix + iy) % 2 == 0) & (ix >= 0) & (ix <= cols) & (iy >= 0) & (iy <= rows)
    img = np.where(board, 230, 30).astype(np.uint8)
    corners = np.array([[margin + c * square, margin + r * square]
                        for r in range(1, rows + 1) for c in range(1, cols + 1)],
                       float)
    return img, corners


def main():
    rows, cols, square = 6, 8, 40.0
    k_true = np.array([[700.0, 0, 330.0], [0, 700.0, 250.0], [0, 0, 1.0]])
    obj = np.asarray(checkerboard_object_points(rows, cols, square))
    base_img, base_corners = render_board(rows, cols, int(square))

    img_pts = []
    for i in range(5):
        rvec = np.array([0.22, -0.18, 0.08]) * (i - 2)
        tvec = np.array([-cols * square / 2, -rows * square / 2, 1400.0])
        proj = np.asarray(project_points_dist(
            jnp.asarray(obj, jnp.float32), jnp.asarray(k_true, jnp.float32),
            jnp.zeros(4, jnp.float32), jnp.asarray(rvec, jnp.float32),
            jnp.asarray(tvec, jnp.float32)))
        h = np.asarray(compute_homography_dlt(
            jnp.asarray(base_corners, jnp.float32), jnp.asarray(proj, jnp.float32)))
        view = np.asarray(warp_perspective(
            jnp.asarray(base_img), jnp.asarray(np.linalg.inv(h), jnp.float32),
            500, 660, fill=128.0))
        det = find_chessboard_corners(jnp.asarray(view),
                                      CheckerboardConfig(rows=rows, cols=cols))
        print(f"view {i}: detected={bool(det.valid)}")
        if bool(det.valid):
            img_pts.append(np.asarray(det.corners))
        if i == 2:
            write_image(out_path("calibration_view.png"), view)

    res = calibrate_camera(jnp.asarray(obj, jnp.float32),
                           jnp.asarray(np.stack(img_pts), jnp.float32))
    k = np.asarray(res.k)
    print(f"K: fx={k[0,0]:.1f} fy={k[1,1]:.1f} cx={k[0,2]:.1f} cy={k[1,2]:.1f}"
          f"  (true 700/700/330/250)")
    print(f"dist: {np.round(np.asarray(res.dist), 4)}")
    print(f"reproj RMS: {float(res.rms):.3f} px (before LM {float(res.rms_initial):.3f})")

    und = undistort_image(jnp.asarray(base_img), res.k, res.dist)
    write_image(out_path("calibration_undistorted.png"), np.asarray(und))
    print("wrote", out_path("calibration_undistorted.png"))


if __name__ == "__main__":
    main()
