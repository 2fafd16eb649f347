import dataclasses
from typing import Optional

import pytest

from khronos_tpu.config import (
    Plugin,
    build,
    check_gt,
    load_mapping,
    parse_override,
    plugin_field,
    register,
    to_dict,
)


@register("test_detector", "Alpha")
@dataclasses.dataclass
class AlphaConfig:
    gain: float = 1.0

    def create(self):
        return ("alpha", self.gain)


@register("test_detector", "Beta")
@dataclasses.dataclass
class BetaConfig:
    window: int = 3

    def check(self):
        check_gt(self.window, 0, "window")

    def create(self):
        return ("beta", self.window)


@dataclasses.dataclass
class InnerConfig:
    voxel_size: float = 0.1
    vps: int = 16

    def check(self):
        check_gt(self.voxel_size, 0.0, "voxel_size")


@dataclasses.dataclass
class OuterConfig:
    name: str = "x"
    inner: InnerConfig = dataclasses.field(default_factory=InnerConfig)
    detector: Plugin = plugin_field("test_detector", default_type="Alpha")
    optional_rate: Optional[float] = None


def test_build_nested_and_defaults():
    cfg = build(OuterConfig, {"inner": {"voxel_size": 0.2}, "name": "run1"})
    assert cfg.name == "run1"
    assert cfg.inner.voxel_size == 0.2
    assert cfg.inner.vps == 16
    assert cfg.detector.type == "Alpha"
    assert cfg.detector.create() == ("alpha", 1.0)


def test_plugin_selection_and_disable():
    cfg = build(OuterConfig, {"detector": {"type": "Beta", "window": 5}})
    assert cfg.detector.type == "Beta"
    assert cfg.detector.create() == ("beta", 5)
    cfg2 = build(OuterConfig, {"detector": None})
    assert not cfg2.detector.enabled
    assert cfg2.detector.create() is None


def test_validation_rejects_bad_values():
    with pytest.raises(ValueError):
        build(OuterConfig, {"inner": {"voxel_size": -1.0}})
    with pytest.raises(ValueError):
        build(OuterConfig, {"detector": {"type": "Beta", "window": 0}})
    with pytest.raises(ValueError):
        build(OuterConfig, {"nonsense_key": 1})
    with pytest.raises(ValueError):
        build(OuterConfig, {"detector": {"type": "DoesNotExist"}})


def test_override_parsing_and_layering(tmp_path):
    f1 = tmp_path / "base.yaml"
    f1.write_text("name: base\ninner:\n  voxel_size: 0.1\n")
    f2 = tmp_path / "overlay.yaml"
    f2.write_text("inner:\n  vps: 8\n")
    data = load_mapping([str(f1), str(f2)], ["inner.voxel_size=0.3", "name=cli"])
    cfg = build(OuterConfig, data)
    assert cfg.name == "cli"
    assert cfg.inner.voxel_size == 0.3
    assert cfg.inner.vps == 8
    assert parse_override("a.b=2") == {"a": {"b": 2}}


def test_to_dict_roundtrip():
    cfg = build(OuterConfig, {"detector": {"type": "Beta"}})
    d = to_dict(cfg)
    assert d["detector"]["type"] == "Beta"
    cfg2 = build(OuterConfig, d)
    assert cfg2.detector.type == "Beta"


def test_shipped_configs_build():
    """Every yaml under configs/ must produce a valid PipelineConfig and
    instantiable plugins (reference: config_utilities validates all configs
    at startup; here the shipped files are the contract)."""
    import glob
    import os

    import yaml

    from khronos_tpu.pipeline.pipeline import PipelineConfig

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert paths, "no shipped configs found"
    for path in paths:
        with open(path) as fh:
            data = yaml.safe_load(fh)
        cfg = build(PipelineConfig, data["pipeline"])
        for plug in (cfg.active_window.tracker, cfg.backend.lcd):
            if plug is not None:
                plug.create()
        assert "dataset" in data and "kind" in data["dataset"], path
