"""Planar tracking over a sequence (BASELINE config 3): track a moving
planar scene, chain homographies, report trajectory ATE."""
import numpy as np

from common import textured_scene

import jax.numpy as jnp
from compv_tpu.slam import (
    PlanarTrackerConfig, ate_rmse, track_planar_sequence,
)


def main():
    base = textured_scene(200, 280)
    shifts = [(0, 0), (4, 2), (8, 5), (12, 7), (16, 10), (20, 12)]
    frames = [np.roll(np.roll(base, sx, axis=1), sy, axis=0)
              for sx, sy in shifts]
    res = track_planar_sequence(frames, PlanarTrackerConfig())
    print("tracked:", res.tracked)
    print("inliers:", res.num_inliers)
    est = np.array([[h[0, 2], h[1, 2], 0.0] for h in res.h_to_first],
                   np.float32)
    gt = np.array([[sx, sy, 0.0] for sx, sy in shifts], np.float32)
    ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt), with_scale=False))
    print(f"trajectory ATE: {ate:.3f} px")


if __name__ == "__main__":
    main()
