"""Image pipeline: conversion, scaling, pyramid, threshold, integral, remap,
histogram, morphology. Replaces the reference's base/image/ + parts of
base/math/ (SURVEY.md §2.2)."""
from compv_tpu.image.color import (  # noqa: F401
    rgb_to_gray, bgr_to_gray, rgba_to_gray, to_gray, rgb_to_yuv444,
    yuv_to_rgb, i420_to_rgb, nv12_to_rgb, nv21_to_rgb, yuyv_to_rgb,
    uyvy_to_rgb, i422_to_rgb, rgb_to_i420, rgb_to_hsv, yuv444_to_hsv,
    split_channels, merge_channels, rgb_to_hsl, rgb565_to_rgb,
    rgb_to_rgb565,
)
from compv_tpu.image.scale import (  # noqa: F401
    scale, scale_bilinear, scale_bicubic, scale_nearest, rotate_bilinear,
    rotate_fast,
)
from compv_tpu.image.pyramid import (  # noqa: F401
    Pyramid, build_pyramid, pyramid_sizes, scale_factors, scale_factors_sum,
)
from compv_tpu.image.threshold import (  # noqa: F401
    threshold_global, threshold_otsu, threshold_adaptive, otsu_value,
    threshold_wolf,
)
from compv_tpu.image.integral import integral, integral_squared, box_sum  # noqa: F401
from compv_tpu.image.remap import (  # noqa: F401
    remap_bilinear, remap_nearest, warp_perspective, warp_affine,
)
from compv_tpu.image.histogram import (  # noqa: F401
    histogram256, equalize, apply_lut256, projection_x, projection_y,
)
from compv_tpu.image.morph import (  # noqa: F401
    strel, erode, dilate, open_, close_, morph_gradient, top_hat, black_hat,
)
