"""Feature detection & description (reference core/features/, SURVEY.md §2.4)."""
from compv_tpu.features.fast import (  # noqa: F401
    FastConfig, fast_detect, fast_strengths, fast_nms, CIRCLE_OFFSETS,
)
from compv_tpu.features.orb import (  # noqa: F401
    OrbConfig, OrbResult, orb_detect_describe, brief_pattern,
    patch_orientation, brief_describe,
)
from compv_tpu.features.edges import (  # noqa: F401
    sobel_gradients, edge_detect, gradient_magnitude_direction,
)
from compv_tpu.features.canny import CannyConfig, canny  # noqa: F401
from compv_tpu.features.hough import (  # noqa: F401
    HoughShtConfig, HoughKhtConfig, hough_sht, hough_kht,
    hough_lines_to_cartesian,
)
from compv_tpu.features.ccl import (  # noqa: F401
    CclConfig, CclResult, label_components, ccl_features,
)
from compv_tpu.features.mser import MserConfig, MserResult, mser_detect  # noqa: F401
from compv_tpu.features.hog import HogConfig, hog_descriptor, gradient_fast  # noqa: F401
