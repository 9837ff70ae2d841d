"""Shared helpers for the example scripts: CPU-friendly setup + synthetic
scenes (no binary fixtures in-repo, mirroring tests/)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("EXAMPLES_TPU") != "1":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def textured_scene(h=240, w=320, seed=5):
    from scipy import ndimage
    rs = np.random.default_rng(seed)
    img = ndimage.gaussian_filter(rs.uniform(0, 255, (h, w)).astype(np.float32), 1.5)
    return ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)


def out_path(name):
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)
