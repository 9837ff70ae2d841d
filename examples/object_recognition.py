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
from compv_tpu.io.video import open_writer
from compv_tpu.slam import FrontendConfig, match_pair
from compv_tpu.viz import draw_matches, draw_text, to_rgb


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

    # Annotated video: animate the warp, track the template per frame, draw
    # the recovered outline + a text HUD, and encode (mp4 when ffmpeg is
    # present, animated GIF otherwise — reference writes via its ffmpeg
    # writer, core/video/compv_core_video_writer_ffmpeg.cxx).
    h, w = template.shape[:2]
    corners = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], float)
    writer = open_writer(out_path("object_recognition.mp4"), w, h, fps=8)
    n_frames = 10
    for t in range(n_frames):
        a = t / (n_frames - 1)
        h_t = np.eye(3) * (1 - a) + h_true * a
        frame = np.asarray(warp_perspective(
            jnp.asarray(template),
            jnp.asarray(np.linalg.inv(h_t), jnp.float32), h, w))
        res_t = match_pair(jnp.asarray(template), jnp.asarray(frame), cfg)
        hv = np.asarray(res_t.h)
        pts = np.concatenate([corners, np.ones((4, 1))], 1) @ hv.T
        pts = pts[:, :2] / pts[:, 2:3]
        rgb = to_rgb(frame)
        from compv_tpu.viz.draw import _line_px
        for i in range(4):
            xa, ya = pts[i]
            xb, yb = pts[(i + 1) % 4]
            _line_px(rgb, xa, ya, xb, yb, (0, 255, 0))
        draw_text(rgb, 4, 4,
                  f"FRAME {t}  INLIERS {int(res_t.num_inliers)}",
                  color=(0, 255, 0), background=(0, 0, 0))
        writer.write(rgb)
    writer.close()
    vid = getattr(writer, "path", out_path("object_recognition.mp4"))
    print("wrote", vid)


if __name__ == "__main__":
    main()
