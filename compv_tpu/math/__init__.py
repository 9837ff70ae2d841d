"""Dense math layer (reference base/math/, SURVEY.md §2.3)."""
from compv_tpu.math.transform import (  # noqa: F401
    perspective_2d, homogeneous_to_cartesian_2d, to_homogeneous,
    apply_homography,
)
from compv_tpu.math.stats import (  # noqa: F401
    hartley_normalize, mse_2d, masked_mean, masked_variance,
)
from compv_tpu.math.matrix import (  # noqa: F401
    mul_ab, mul_abt, mul_ata, mul_ag, mul_ga, transpose, rank,
    is_symmetric, is_colinear_2d, eigen_symm, svd, pseudo_inverse,
    inverse_3x3, inverse_diagonal, trace, determinant,
)
from compv_tpu.math.distance import (  # noqa: F401
    hamming, hamming_packed, dist_line, dist_parabola, squared_l2, l2,
)
from compv_tpu.math.fit import LineFit, ParabolaFit, fit_line, fit_parabola  # noqa: F401
from compv_tpu.math.pca import (  # noqa: F401
    PcaModel, pca_compute, pca_project, pca_backproject, pca_save_json,
    pca_load_json,
)
from compv_tpu.math.ops import (  # noqa: F401
    add, sub, mul_elementwise, abs_, minmax, clip, scale_values, cast,
    tanh_activation, logistic_activation, relu, fast_exp, fast_atan2_deg,
    atan2_deg_exact,
    hypot_, image_moments, hu_moments,
)
