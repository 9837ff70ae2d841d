"""Config system: file-backed construction of algorithm config dataclasses.

Reference (SURVEY.md §5 'Config / flag system'): three tiers — compile-time
defaults per algorithm, runtime CompVCaps set/get(id), JSON/YAML file
configs (compv_json.h, compv_yaml.h:50-63). Here: every algorithm exposes a
frozen dataclass with the same defaults; this module loads/saves them from
JSON or simple YAML, by name, so pipelines are reproducibly configured from
files.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Type

__all__ = ["CONFIG_REGISTRY", "config_to_dict", "config_from_dict",
           "load_config", "save_config", "parse_simple_yaml"]


def _registry() -> Dict[str, Type]:
    from compv_tpu.calib.camera import CalibrationConfig
    from compv_tpu.calib.checkerboard import CheckerboardConfig
    from compv_tpu.calib.homography import HomographyConfig
    from compv_tpu.calib.lm import LMConfig
    from compv_tpu.calib.ransac import RansacConfig
    from compv_tpu.features.canny import CannyConfig
    from compv_tpu.features.ccl import CclConfig
    from compv_tpu.features.fast import FastConfig
    from compv_tpu.features.hog import HogConfig
    from compv_tpu.features.hough import HoughKhtConfig, HoughShtConfig
    from compv_tpu.features.mser import MserConfig
    from compv_tpu.features.orb import OrbConfig
    from compv_tpu.matchers.bruteforce import MatcherConfig
    from compv_tpu.ml.svm import SvmConfig
    from compv_tpu.slam.ba import BAConfig
    from compv_tpu.slam.frontend import FrontendConfig
    from compv_tpu.slam.pipeline import PlanarTrackerConfig
    from compv_tpu.slam.posegraph import PoseGraphConfig
    return {
        "fast": FastConfig, "orb": OrbConfig, "canny": CannyConfig,
        "hough_sht": HoughShtConfig, "hough_kht": HoughKhtConfig,
        "hog": HogConfig, "ccl": CclConfig, "mser": MserConfig,
        "matcher": MatcherConfig, "homography": HomographyConfig,
        "ransac": RansacConfig, "lm": LMConfig,
        "calibration": CalibrationConfig, "checkerboard": CheckerboardConfig,
        "ba": BAConfig, "frontend": FrontendConfig,
        "planar_tracker": PlanarTrackerConfig, "pose_graph": PoseGraphConfig,
        "svm": SvmConfig,
    }


CONFIG_REGISTRY: Dict[str, Type] = {}


def _ensure_registry():
    if not CONFIG_REGISTRY:
        CONFIG_REGISTRY.update(_registry())
    return CONFIG_REGISTRY


def config_to_dict(cfg: Any) -> dict:
    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        out[f.name] = config_to_dict(v) if dataclasses.is_dataclass(v) else v
    return out


def config_from_dict(name_or_cls, data: dict):
    cls = (_ensure_registry()[name_or_cls] if isinstance(name_or_cls, str)
           else name_or_cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
            kwargs[f.name] = config_from_dict(f.type, v)
        elif isinstance(v, dict):
            # nested config declared via default value's type
            default = getattr(cls, f.name, None)
            if default is not None and dataclasses.is_dataclass(default):
                kwargs[f.name] = config_from_dict(type(default), v)
            else:
                kwargs[f.name] = v
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def parse_simple_yaml(text: str) -> dict:
    """Minimal YAML subset (scalars + one nesting level via indentation) —
    the reference ships a mini-YAML too (compv_yaml.h:50-63)."""
    root: dict = {}
    stack = [(0, root)]
    for raw in text.splitlines():
        if not raw.strip() or raw.strip().startswith("#"):
            continue
        indent = len(raw) - len(raw.lstrip())
        key, _, val = raw.strip().partition(":")
        val = val.strip()
        while stack and indent < stack[-1][0]:
            stack.pop()
        cur = stack[-1][1]
        if not val:
            child: dict = {}
            cur[key] = child
            stack.append((indent + 2, child))
        else:
            if val.lower() in ("true", "false"):
                cur[key] = val.lower() == "true"
            else:
                try:
                    cur[key] = int(val)
                except ValueError:
                    try:
                        cur[key] = float(val)
                    except ValueError:
                        cur[key] = val.strip("'\"")
    return root


def load_config(path: str, name: str):
    """Load <name>'s config dataclass from a JSON or YAML file holding
    {name: {field: value, ...}, ...}."""
    with open(path) as f:
        text = f.read()
    data = (json.loads(text) if path.endswith(".json")
            else parse_simple_yaml(text))
    return config_from_dict(name, data.get(name, {}))


def save_config(path: str, **configs) -> None:
    obj = {k: config_to_dict(v) for k, v in configs.items()}
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)
