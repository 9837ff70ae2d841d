"""Robust estimation & camera calibration (reference core/calib/, SURVEY.md §2.4)."""
from compv_tpu.calib.homography import (  # noqa: F401
    HomographyConfig, HomographyResult, compute_homography_dlt,
    find_homography, symmetric_transfer_error,
)
from compv_tpu.calib.ransac import RansacConfig, RansacResult, ransac  # noqa: F401
