"""Config system + profiling helpers tests."""
import json

import numpy as np
import pytest

from compv_tpu.config import (
    config_from_dict, config_to_dict, load_config, parse_simple_yaml,
    save_config,
)
from compv_tpu.profiling import Log, Timer, device_memory_stats


class TestConfig:
    def test_roundtrip_fast(self):
        from compv_tpu.features.fast import FastConfig
        cfg = FastConfig(threshold=33, nms=False)
        d = config_to_dict(cfg)
        back = config_from_dict("fast", d)
        assert back == cfg

    def test_json_file(self, tmp_path):
        from compv_tpu.features.orb import OrbConfig
        p = str(tmp_path / "cfg.json")
        save_config(p, orb=OrbConfig(max_features=123))
        cfg = load_config(p, "orb")
        assert cfg.max_features == 123
        assert cfg.scale_factor == pytest.approx(0.83)

    def test_yaml_parse(self):
        y = """
# comment
fast:
  threshold: 25
  nms: true
orb:
  max_features: 500
  scale_factor: 0.9
"""
        d = parse_simple_yaml(y)
        assert d["fast"]["threshold"] == 25
        assert d["fast"]["nms"] is True
        assert d["orb"]["scale_factor"] == 0.9

    def test_yaml_file(self, tmp_path):
        p = str(tmp_path / "cfg.yaml")
        with open(p, "w") as f:
            f.write("fast:\n  threshold: 42\n")
        cfg = load_config(p, "fast")
        assert cfg.threshold == 42

    def test_registry_covers_all(self):
        from compv_tpu.config import _ensure_registry
        reg = _ensure_registry()
        assert len(reg) >= 18
        for name, cls in reg.items():
            cfg = cls()  # all configs constructible with defaults
            d = config_to_dict(cfg)
            assert isinstance(d, dict)


class TestProfiling:
    def test_timer(self):
        t = Timer()
        with t.section("a"):
            _ = sum(range(1000))
        with t.section("a"):
            pass
        assert t.counts["a"] == 2
        assert "a:" in t.report()

    def test_memory_stats(self):
        s = device_memory_stats()
        assert len(s) >= 1
        assert "device" in s[0]

    def test_log_sinks(self):
        lines = []
        lg = Log()
        lg.add_sink("warn", lines.append)
        lg.warn("careful")
        lg.verbose("hidden")  # below level
        assert len(lines) == 1 and "careful" in lines[0]
