"""edgeyolo_tpu: a TPU-native (JAX/XLA/Pallas/pjit) detection framework with
the capabilities of the EdgeLine-YOLO reference stack.

Public API mirrors the reference surface: `YOLO(model).train/val/predict/...`.
"""

__version__ = "0.1.0"

__all__ = ["YOLO", "__version__"]


def __getattr__(name):
    if name == "YOLO":
        from edgeyolo_tpu.engine.model import YOLO

        return YOLO
    raise AttributeError(f"module 'edgeyolo_tpu' has no attribute '{name}'")
