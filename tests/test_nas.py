"""YOLO-NAS facade (engine/nas.py): load gating + NAS postprocess path.

Behavioral spec: reference models/nas/{model,predict,val}.py — pretrained-only
family (no YAML), raw output = decoded xyxy + scores, postprocess = NMS.
"""

import numpy as np
import pytest

from edgeyolo_tpu.engine.nas import NAS


def test_nas_rejects_yaml_and_gates_load():
    with pytest.raises(AssertionError):
        NAS("yolo_nas_s.yaml")
    with pytest.raises(ImportError, match="super_gradients"):
        NAS("yolo_nas_s.pt")


def test_nas_postprocess_with_backend():
    rng = np.random.RandomState(0)

    def fake_backend(imgs):
        B = imgs.shape[0]
        A, nc = 50, 80
        boxes = np.zeros((B, A, 4), np.float32)
        boxes[..., :2] = rng.rand(B, A, 2) * 300
        boxes[..., 2:] = boxes[..., :2] + 20 + rng.rand(B, A, 2) * 60
        scores = rng.rand(B, A, nc).astype(np.float32) * 0.2
        scores[:, 7, 3] = 0.95  # one strong detection
        return boxes, scores

    nas = NAS("yolo_nas_s.pt", backend=fake_backend)
    imgs = np.zeros((2, 320, 320, 3), np.uint8)
    det, n = nas.predict(imgs, conf=0.5)
    det, n = np.asarray(det), np.asarray(n)
    assert det.shape[0] == 2 and det.shape[2] == 6
    assert (n == 1).all()  # exactly the planted detection survives
    assert int(det[0, 0, 5]) == 3 and det[0, 0, 4] > 0.9
