"""CLI grammar + config system tests (reference tests/test_cli.py style,
in-process instead of subprocess for the 1-core CI)."""

import pytest

from edgeyolo_tpu.cfg import check_dict_alignment, get_cfg
from edgeyolo_tpu.cfg.cli import entrypoint, parse_key_value


def test_cfg_defaults_loaded():
    cfg = get_cfg()
    assert cfg.epochs == 100
    assert cfg.imgsz == 640
    assert cfg.warmup_bias_lr == 0.0  # fork default (upstream was 0.1)
    assert cfg.nbs == 64


def test_cfg_override_precedence():
    cfg = get_cfg(overrides={"epochs": 5, "lr0": 0.5})
    assert cfg.epochs == 5 and cfg.lr0 == 0.5


def test_cfg_typo_suggestion():
    with pytest.raises(SyntaxError) as e:
        get_cfg(overrides={"epochz": 3})
    assert "epochs" in str(e.value)  # did-you-mean


def test_cfg_type_checking():
    with pytest.raises(ValueError):
        get_cfg(overrides={"lr0": 1.5})  # fraction key out of [0,1]
    with pytest.raises(TypeError):
        get_cfg(overrides={"epochs": "ten"})


def test_parse_key_value_literals():
    assert parse_key_value("epochs=3") == ("epochs", 3)
    assert parse_key_value("lr0=0.01") == ("lr0", 0.01)
    assert parse_key_value("save=False") == ("save", False)
    assert parse_key_value("device=none") == ("device", None)
    assert parse_key_value("name=run1") == ("name", "run1")


def test_cli_help_and_version(capsys=None):
    assert entrypoint(["help"]) == 0
    assert entrypoint(["version"]) == 0


def test_cli_rejects_garbage():
    with pytest.raises(SyntaxError):
        entrypoint(["detect", "flytome", "x=1"])
    with pytest.raises(SyntaxError):
        entrypoint(["detect"])  # no MODE


def test_cli_checks_runs():
    assert entrypoint(["checks"]) == 0


def test_settings_manager_roundtrip(tmp_path, monkeypatch):
    """Persistent settings JSON: versioned defaults, validated update, reset
    (reference SettingsManager, utils/__init__.py:1155)."""
    monkeypatch.setenv("EDGEYOLO_CONFIG_DIR", str(tmp_path))
    from edgeyolo_tpu.utils import SettingsManager

    s = SettingsManager()
    assert s["settings_version"] == SettingsManager.VERSION
    s.update(runs_dir=str(tmp_path / "runs2"))
    s2 = SettingsManager()
    assert s2["runs_dir"] == str(tmp_path / "runs2")
    import pytest as _pt

    with _pt.raises(KeyError):
        s2.update(not_a_key=1)
    with _pt.raises(TypeError):
        s2.update(sync="yes")
    s2.reset()
    assert SettingsManager()["runs_dir"] == s2.defaults["runs_dir"]


def test_cli_special_commands(tmp_path, monkeypatch):
    """settings / cfg / copy-cfg / solutions special commands (reference
    entrypoint SPECIAL map, cfg/__init__.py:851)."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("EDGEYOLO_CONFIG_DIR", str(tmp_path / "cfgdir"))
    assert entrypoint(["cfg"]) == 0
    assert entrypoint(["solutions"]) == 0
    assert entrypoint(["copy-cfg"]) == 0
    assert (tmp_path / "default_copy.yaml").exists()
    assert entrypoint(["settings"]) == 0


def test_cli_tune_mode_dispatches(monkeypatch):
    """`edgeyolo detect tune ...` must reach YOLO.tune (it used to parse and
    silently do nothing)."""
    import edgeyolo_tpu.cfg.cli as cli

    calls = {}

    class FakeYOLO:
        def __init__(self, model, task=None):
            calls["model"] = model

        def tune(self, iterations=10, **kw):
            calls["iterations"] = iterations
            return {"ok": True}

    monkeypatch.setattr("edgeyolo_tpu.engine.model.YOLO", FakeYOLO)
    import edgeyolo_tpu

    # setitem on the module dict, NOT setattr: the package resolves YOLO via
    # a lazy __getattr__, so setattr's recorded "old value" would itself be
    # the (already-patched) FakeYOLO and teardown would leak it permanently.
    monkeypatch.setitem(vars(edgeyolo_tpu), "YOLO", FakeYOLO)
    assert cli.entrypoint(["detect", "tune", "iterations=3"]) == 0
    assert calls.get("iterations") == 3
