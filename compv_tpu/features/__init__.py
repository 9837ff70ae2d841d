"""Feature detection & description (reference core/features/, SURVEY.md §2.4)."""
from compv_tpu.features.fast import (  # noqa: F401
    FastConfig, fast_detect, fast_strengths, fast_nms, CIRCLE_OFFSETS,
)
from compv_tpu.features.orb import (  # noqa: F401
    OrbConfig, OrbResult, orb_detect_describe, brief_pattern,
    patch_orientation, brief_describe,
)
