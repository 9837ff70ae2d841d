"""Visualization (replaces reference gl/ + drawing/, SURVEY.md §2.5)."""
from compv_tpu.viz.draw import (  # noqa: F401
    to_rgb, draw_keypoints, draw_matches, draw_lines, draw_boxes,
    figure_keypoints, figure_matches,
)
