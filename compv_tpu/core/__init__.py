from compv_tpu.core.types import Keypoints, Lines, Matches  # noqa: F401
