"""Descriptor matching (reference core/matchers/, SURVEY.md §2.4)."""
from compv_tpu.matchers.bruteforce import (  # noqa: F401
    MatcherConfig, hamming_distance_matrix, knn_match, match_bruteforce,
    ratio_test,
)
