"""CLI entrypoint: `edgeyolo TASK MODE k=v ...` (also exposed as `yolo`-style).

Behavioral spec: ultralytics/cfg/__init__.py:738-880 (entrypoint grammar
`yolo TASK MODE ARGS`, smart k=v literal parsing, special commands
help/version/settings/checks, typo suggestions).
"""

from __future__ import annotations

import ast
import json
import sys
from pathlib import Path

from edgeyolo_tpu.cfg import check_dict_alignment
from edgeyolo_tpu.utils import DEFAULT_CFG_DICT, DEFAULT_CFG_PATH, LOGGER, MODES, TASKS, colorstr

CLI_HELP = f"""
    Usage: edgeyolo TASK MODE ARGS

        TASK (optional): one of {sorted(TASKS)}
        MODE (required): one of {sorted(MODES)}
        ARGS (optional): any number of 'arg=value' pairs overriding defaults.

    Examples:
        edgeyolo detect train data=dataset.yaml model=yolo11n.yaml epochs=10
        edgeyolo detect val model=runs/train/last.msgpack data=dataset.yaml
        edgeyolo detect predict model=runs/train/best.msgpack source=imgs/
        edgeyolo export model=runs/train/best.msgpack format=stablehlo
        edgeyolo benchmark model=yolo11n.yaml imgsz=640
"""


def parse_key_value(pair: str) -> tuple[str, object]:
    """Parse 'k=v' with smart literal evaluation."""
    k, v = pair.split("=", 1)
    k, v = k.strip(), v.strip()
    if v.lower() == "none":
        return k, None
    if v.lower() == "true":
        return k, True
    if v.lower() == "false":
        return k, False
    try:
        return k, ast.literal_eval(v)
    except (ValueError, SyntaxError):
        return k, v


def entrypoint(argv: list[str] | None = None) -> int:
    args = list(argv if argv is not None else sys.argv[1:])
    if not args or args[0] in {"help", "-h", "--help"}:
        LOGGER.info(CLI_HELP)
        return 0
    if args[0] in {"version", "-v", "--version"}:
        from edgeyolo_tpu import __version__

        LOGGER.info(__version__)
        return 0
    if args[0] == "checks":
        from edgeyolo_tpu.utils.checks import collect_system_info

        LOGGER.info(collect_system_info())
        return 0
    if args[0] == "settings":
        # `edgeyolo settings [reset | key=value ...]` (reference
        # handle_yolo_settings, cfg/__init__.py:579)
        from edgeyolo_tpu.utils import SettingsManager

        s = SettingsManager()
        rest = args[1:]
        if rest and rest[0] == "reset":
            s.reset()
            LOGGER.info("settings reset to defaults")
        elif rest:
            s.update(**dict(parse_key_value(a) for a in rest if "=" in a))
        LOGGER.info(json.dumps(dict(s), indent=2))
        return 0
    if args[0] == "cfg":
        LOGGER.info(json.dumps(DEFAULT_CFG_DICT, indent=2, default=str))
        return 0
    if args[0] == "copy-cfg":
        import shutil

        dst = Path.cwd() / "default_copy.yaml"
        shutil.copy2(DEFAULT_CFG_PATH, dst)
        LOGGER.info(f"copied default cfg -> {dst} (use with cfg={dst.name})")
        return 0
    if args[0] == "solutions":
        from edgeyolo_tpu import solutions as _sol

        names = [n for n in dir(_sol) if n[:1].isupper()]
        LOGGER.info("available solutions (use from Python, edgeyolo_tpu.solutions):\n  "
                    + "\n  ".join(names))
        return 0

    task = None
    mode = None
    overrides: dict = {}
    for a in args:
        if "=" in a:
            k, v = parse_key_value(a)
            if k not in {"iterations"}:  # tune-only key, not a cfg flag
                check_dict_alignment(DEFAULT_CFG_DICT, {k: v})
            overrides[k] = v
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        else:
            raise SyntaxError(
                f"'{colorstr('red', 'bold', a)}' is not a valid task, mode or k=v pair.\n{CLI_HELP}"
            )
    if mode is None:
        raise SyntaxError(f"a MODE is required: {sorted(MODES)}\n{CLI_HELP}")

    from edgeyolo_tpu import YOLO

    model_arg = overrides.pop("model", None) or "yolo11n.yaml"
    model = YOLO(model_arg, task=task)
    if mode == "train":
        model.train(**overrides)
    elif mode == "val":
        model.val(**overrides)
    elif mode == "predict":
        source = overrides.pop("source", None)
        if source is None:
            raise SyntaxError("predict requires source=<path>")
        results = model.predict(source, **overrides)
        LOGGER.info(f"{len(results)} images processed")
    elif mode == "track":
        source = overrides.pop("source", None)
        if source is None:
            raise SyntaxError("track requires source=<path>")
        list(model.track(source, **overrides))
    elif mode == "export":
        out = model.export(**overrides)
        LOGGER.info(f"exported -> {out}")
    elif mode == "benchmark":
        model.benchmark(**{k: v for k, v in overrides.items() if k in {"imgsz", "data"}})
    elif mode == "tune":
        iterations = int(overrides.pop("iterations", 10))
        model.tune(iterations=iterations, **overrides)
    return 0


if __name__ == "__main__":
    raise SystemExit(entrypoint())
