"""Visualization (replaces reference gl/ + drawing/, SURVEY.md §2.5)."""
from compv_tpu.viz.draw import (  # noqa: F401
    to_rgb, draw_keypoints, draw_matches, draw_lines, draw_boxes,
    draw_text, text_size, figure_keypoints, figure_matches,
)
from compv_tpu.viz.stream import MjpegServer, run_live  # noqa: F401
