"""Object recognition: the flagship detect/describe/match/homography demo
(reference: samples/object_recognition/main.cxx).

Warps a 'template' into a scene with a known homography, recovers it with
the ORB frontend, and renders the matches + recovered outline.
"""
import numpy as np

from common import out_path, textured_scene

import jax.numpy as jnp
from compv_tpu.calib.homography import HomographyConfig
from compv_tpu.features.orb import OrbConfig, orb_detect_describe
from compv_tpu.image import warp_perspective
from compv_tpu.io import write_image
from compv_tpu.matchers.bruteforce import knn_match, ratio_test
from compv_tpu.slam import FrontendConfig, match_pair
from compv_tpu.viz import draw_matches


def main():
    template = textured_scene(240, 320)
    h_true = np.array([[0.95, 0.08, 30.0], [-0.05, 1.02, 12.0],
                       [1e-5, -2e-5, 1.0]])
    scene = np.asarray(warp_perspective(
        jnp.asarray(template), jnp.asarray(np.linalg.inv(h_true), jnp.float32),
        240, 320))

    cfg = FrontendConfig(orb=OrbConfig(max_features=512, levels=3),
                         homography=HomographyConfig(num_hypotheses=512,
                                                     threshold=9.0))
    res = match_pair(jnp.asarray(template), jnp.asarray(scene), cfg)
    print(f"keypoints: {int(res.kp1_count)}/{int(res.kp2_count)}  "
          f"matches: {int(res.num_matches)}  inliers: {int(res.num_inliers)}")
    print("recovered H:\n", np.round(np.asarray(res.h), 4))
    print("true H:\n", np.round(h_true / h_true[2, 2], 4))

    r1 = orb_detect_describe(jnp.asarray(template), cfg.orb)
    r2 = orb_detect_describe(jnp.asarray(scene), cfg.orb)
    m = knn_match(r1.descriptors, r2.descriptors, r1.keypoints.valid,
                  r2.keypoints.valid, k=2)
    ok = ratio_test(m, cfg.ratio)
    canvas = draw_matches(template, r1.keypoints, scene, r2.keypoints, m, ok)
    write_image(out_path("object_recognition_matches.png"), canvas)
    print("wrote", out_path("object_recognition_matches.png"))


if __name__ == "__main__":
    main()
