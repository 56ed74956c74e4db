"""YOLO-NAS facade (inference-only model family).

Behavioral spec: reference ultralytics/models/nas/ — model.py:26 (NAS facade:
pretrained .pt only, no YAML; loads via super_gradients), predict.py (raw
output is decoded xyxy boxes + per-class scores, postprocess = concat +
NMS), val.py (NASValidator: same box format into the standard validator).

The reference family cannot construct weights from a spec: it torch-loads a
pickled super-gradients model. In this zero-egress image (no
super_gradients, no weight downloads) loading is gated with the same failure
modes; the NAS postprocess path — the part with real behavior — runs against
any backend callable producing the NAS output layout, so converted weights
plug straight in.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from edgeyolo_tpu.utils import LOGGER


class NAS:
    """YOLO-NAS handle: pretrained checkpoints only (reference model.py:49)."""

    def __init__(self, model: str = "yolo_nas_s.pt", backend=None, nc: int = 80):
        assert Path(model).suffix not in {".yaml", ".yml"}, \
            "YOLO-NAS models only support pre-trained weights, not YAML specs"
        self.model_name = str(model)
        self.nc = nc
        self.backend = backend  # callable: (B,H,W,3)->(boxes (B,A,4) xyxy, scores (B,A,nc))
        if backend is None:
            self._load(self.model_name)

    def _load(self, weights: str):
        try:
            import super_gradients  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "YOLO-NAS weights are super-gradients pickles; the super_gradients "
                "package is not available in this environment. Pass `backend=` with "
                "a callable producing (boxes_xyxy, scores) to run NAS inference."
            ) from e
        raise ConnectionError(f"cannot download {weights}: offline environment")  # pragma: no cover

    def postprocess(self, boxes: np.ndarray, scores: np.ndarray, conf: float = 0.25,
                    iou: float = 0.45, max_det: int = 300):
        """NAS raw output -> detections, reference predict.py:20-48 semantics:
        boxes already decoded xyxy; concat scores; standard class-aware NMS."""
        import jax.numpy as jnp

        from edgeyolo_tpu.ops.boxes import xyxy2xywh
        from edgeyolo_tpu.ops.nms import non_max_suppression

        # our NMS consumes (B, A, 4+nc) with xywh boxes (reference converts
        # the other way; same geometry)
        pred = jnp.concatenate([xyxy2xywh(jnp.asarray(boxes)), jnp.asarray(scores)], -1)
        return non_max_suppression(pred, conf_thres=conf, iou_thres=iou, max_det=max_det)

    def predict(self, images: np.ndarray, conf: float = 0.25, iou: float = 0.45,
                max_det: int = 300):
        """Run the backend + NAS postprocess on a uint8/float NHWC batch."""
        if self.backend is None:
            raise RuntimeError("no backend loaded (see _load error above)")
        boxes, scores = self.backend(images)
        return self.postprocess(np.asarray(boxes), np.asarray(scores), conf, iou, max_det)

    __call__ = predict

    def info(self):
        LOGGER.info(f"NAS {self.model_name}: inference-only family, nc={self.nc}")
