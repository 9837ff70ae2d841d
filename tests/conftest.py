"""Test harness config.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4: single-host
simulation of multi-chip replaces the reference's asm-vs-C test matrix).
Must set env vars before jax is imported anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env presets axon (the TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's axon sitecustomize force-registers the TPU tunnel platform and
# overrides JAX_PLATFORMS; override it back before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def test_image():
    """Deterministic synthetic 8-bit grayscale test image (no binary fixtures
    in-repo; the reference ships .yuv files, we synthesize an equally rich
    scene: gradient + blobs + corners + noise)."""
    h, w = 360, 480
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 96 + 48 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0)
    # checkerboard patch (strong corners)
    ch = ((xx // 24).astype(int) + (yy // 24).astype(int)) % 2
    img = np.where((xx > 120) & (xx < 360) & (yy > 90) & (yy < 270),
                   ch * 200.0 + 20, img)
    rs = np.random.default_rng(7)
    img = img + rs.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def test_rgb(test_image):
    """RGB version with colored gradients."""
    h, w = test_image.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = test_image
    g = np.clip(255 * xx / w, 0, 255).astype(np.uint8)
    b = np.clip(255 * yy / h, 0, 255).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)
