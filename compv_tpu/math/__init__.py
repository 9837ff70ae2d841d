"""Dense math layer (reference base/math/, SURVEY.md §2.3)."""
from compv_tpu.math.transform import (  # noqa: F401
    perspective_2d, homogeneous_to_cartesian_2d, to_homogeneous,
    apply_homography,
)
from compv_tpu.math.stats import (  # noqa: F401
    hartley_normalize, mse_2d, masked_mean, masked_variance,
)
