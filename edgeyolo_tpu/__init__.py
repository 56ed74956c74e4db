"""edgeyolo_tpu: a TPU-native (JAX/XLA/Pallas/pjit) detection framework with
the capabilities of the EdgeLine-YOLO reference stack.

Public API mirrors the reference surface: `YOLO(model).train/val/predict/...`.
"""

__version__ = "0.1.0"

__all__ = ["YOLO", "YOLOWorld", "SAM", "FastSAM", "RTDETR", "NAS", "__version__"]


def __getattr__(name):
    if name == "YOLO":
        from edgeyolo_tpu.engine.model import YOLO

        return YOLO
    if name == "SAM":
        from edgeyolo_tpu.engine.sam import SAM

        return SAM
    if name == "NAS":
        from edgeyolo_tpu.engine.nas import NAS

        return NAS
    if name == "FastSAM":
        from edgeyolo_tpu.engine.fastsam import FastSAM

        return FastSAM
    if name == "YOLOWorld":
        from edgeyolo_tpu.engine.model import YOLO

        def YOLOWorld(model="yolov8-worldv2.yaml", **kw):
            return YOLO(model, **kw)

        return YOLOWorld
    if name == "RTDETR":
        from edgeyolo_tpu.engine.model import YOLO

        def RTDETR(model="rtdetr-l", **kw):
            return YOLO(model, **kw)

        return RTDETR
    raise AttributeError(f"module 'edgeyolo_tpu' has no attribute '{name}'")
