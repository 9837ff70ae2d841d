"""Compute kernels: pure-XLA reference implementations + Pallas fast paths.

This layer replaces the reference's entire SIMD backend (~60k LoC asm +
~25k LoC intrinsics, SURVEY.md §1 "SIMD backend layer"). Every op has a
pure-jnp implementation (the correctness oracle — analogous to the
reference's portable *_C kernels) and, where profiling justifies it, a
Pallas kernel under ops/pallas/ selected via use_pallas flags.
"""
from compv_tpu.ops.conv import (  # noqa: F401
    gaussian_kernel1d, gaussian_kernel2d, convolve_separable, convolve2d,
    gaussian_blur,
)
from compv_tpu.ops.bitops import pack_bits_to_bytes, unpack_bytes_to_bits, popcount_bytes  # noqa: F401
