"""Robust estimation & camera calibration (reference core/calib/, SURVEY.md §2.4)."""
from compv_tpu.calib.homography import (  # noqa: F401
    HomographyConfig, HomographyResult, compute_homography_dlt,
    find_homography, symmetric_transfer_error,
)
from compv_tpu.calib.ransac import RansacConfig, RansacResult, ransac  # noqa: F401
from compv_tpu.calib.epipolar import (  # noqa: F401
    EssentialConfig, EssentialResult, find_essential, compute_fundamental_8pt,
    decompose_essential, triangulate_points, sampson_error,
)
from compv_tpu.calib.camera import (  # noqa: F401
    CalibrationConfig, CalibrationResult, calibrate_camera,
    checkerboard_object_points,
)
from compv_tpu.calib.checkerboard import (  # noqa: F401
    CheckerboardConfig, CheckerboardResult, find_chessboard_corners,
)
from compv_tpu.calib.lm import LMConfig, LMResult, levenberg_marquardt  # noqa: F401
from compv_tpu.calib.utils import (  # noqa: F401
    project_points_dist, reproj_error_rms, build_undistort_map,
    undistort_image, undistort_points, distort_normalized,
)
