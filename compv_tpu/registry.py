"""Factory registry: create detectors/descriptors/matchers by name.

Reference: CompVCornerDete::newObj(&d, COMPV_FAST_ID) etc. — algorithms are
registered by CompVCore::init() and instantiated through id-based factories
(base/include/compv/base/compv_features.h:166-261, core/compv_core.cxx:149-160).
Here the same late-binding surface exists by *name*, returning (callable,
config) pairs; pipelines that want textual configuration use this instead
of importing modules directly.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

__all__ = ["create_detector", "create_matcher", "create_edge_detector",
           "list_algorithms"]


def create_detector(name: str, **overrides) -> Tuple[Callable, Any]:
    """'fast' | 'orb' -> (fn(img, config) -> result, default config)."""
    if name == "fast":
        from compv_tpu.features.fast import FastConfig, fast_detect
        cfg = FastConfig(**overrides) if overrides else FastConfig()
        return fast_detect, cfg
    if name == "orb":
        from compv_tpu.features.orb import OrbConfig, orb_detect_describe
        cfg = OrbConfig(**overrides) if overrides else OrbConfig()
        return orb_detect_describe, cfg
    if name == "mser":
        from compv_tpu.features.mser import MserConfig, mser_detect
        cfg = MserConfig(**overrides) if overrides else MserConfig()
        return mser_detect, cfg
    raise KeyError(f"unknown detector {name!r}; have fast|orb|mser")


def create_edge_detector(name: str, **overrides) -> Tuple[Callable, Any]:
    """'sobel' | 'scharr' | 'prewitt' | 'canny'."""
    if name in ("sobel", "scharr", "prewitt"):
        from compv_tpu.features.edges import edge_detect
        return (lambda img, cfg=None, _op=name: edge_detect(img, _op)), None
    if name == "canny":
        from compv_tpu.features.canny import CannyConfig, canny
        cfg = CannyConfig(**overrides) if overrides else CannyConfig()
        return canny, cfg
    raise KeyError(f"unknown edge detector {name!r}")


def create_matcher(name: str, **overrides) -> Tuple[Callable, Any]:
    """'bruteforce' -> (fn(q_bits, t_bits, config, ...), default config).
    (The reference's FLANN matcher is an empty stub; our ANN equivalent is
    ml.ann_build/ann_search.)"""
    if name == "bruteforce":
        from compv_tpu.matchers.bruteforce import MatcherConfig, match_bruteforce
        cfg = MatcherConfig(**overrides) if overrides else MatcherConfig()
        return match_bruteforce, cfg
    raise KeyError(f"unknown matcher {name!r}")


def list_algorithms() -> Dict[str, list]:
    return {
        "detectors": ["fast", "orb", "mser"],
        "edges": ["sobel", "scharr", "prewitt", "canny"],
        "hough": ["sht", "kht"],
        "matchers": ["bruteforce"],
        "ccl": ["pointer-jumping (LSL-equivalent)"],
        "hog": ["std"],
    }
