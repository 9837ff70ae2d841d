"""Deterministic synthetic fixtures shared by the test suite and the golden
generator (scripts/make_goldens.py). The reference ships .yuv images; we
synthesize an equally rich scene so no binary fixtures live in-repo."""
import numpy as np


def make_test_image(h: int = 360, w: int = 480) -> np.ndarray:
    """8-bit grayscale: gradient + checkerboard patch + noise."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 96 + 48 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0)
    ch = ((xx // 24).astype(int) + (yy // 24).astype(int)) % 2
    img = np.where((xx > 120) & (xx < 360) & (yy > 90) & (yy < 270),
                   ch * 200.0 + 20, img)
    rs = np.random.default_rng(7)
    img = img + rs.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_test_rgb(gray: np.ndarray | None = None) -> np.ndarray:
    g = gray if gray is not None else make_test_image()
    h, w = g.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = g
    gg = np.clip(255 * xx / w, 0, 255).astype(np.uint8)
    b = np.clip(255 * yy / h, 0, 255).astype(np.uint8)
    return np.stack([r, gg, b], axis=-1)
