"""Canny + Hough lines demo (reference: samples hough/canny apps)."""
import numpy as np

from common import out_path

import jax.numpy as jnp
from compv_tpu.features.canny import CannyConfig, canny
from compv_tpu.features.edges import sobel_gradients
from compv_tpu.features.hough import HoughKhtConfig, HoughShtConfig, hough_kht, hough_sht
from compv_tpu.io import write_image
from compv_tpu.viz import draw_lines


def main():
    h, w = 240, 320
    yy, xx = np.mgrid[0:h, 0:w]
    ang = np.deg2rad(25)
    u = (xx - 160) * np.cos(ang) + (yy - 120) * np.sin(ang)
    v = -(xx - 160) * np.sin(ang) + (yy - 120) * np.cos(ang)
    img = np.where((np.abs(u) < 80) & (np.abs(v) < 55), 220, 40).astype(np.uint8)

    edges = canny(jnp.asarray(img), CannyConfig(threshold_low=59, threshold_high=119))
    print("canny edge pixels:", int((np.asarray(edges) > 0).sum()))

    lines = hough_sht(edges, HoughShtConfig(threshold=0.45, max_lines=8))
    nv = int(lines.count())
    print(f"SHT lines: {nv}")
    for i in range(nv):
        print(f"  rho={float(lines.rho[i]):7.1f} theta="
              f"{np.rad2deg(float(lines.theta[i])):6.1f}deg "
              f"votes={float(lines.strength[i]):.0f}")

    gx, gy = sobel_gradients(jnp.asarray(img))
    klines = hough_kht(edges, gx, gy, HoughKhtConfig(max_lines=8,
                                                     threshold_ratio=0.03))
    print(f"KHT lines: {int(klines.count())}")

    write_image(out_path("edges.png"), np.asarray(edges))
    write_image(out_path("hough_lines.png"), draw_lines(img, lines))
    print("wrote", out_path("hough_lines.png"))


if __name__ == "__main__":
    main()
