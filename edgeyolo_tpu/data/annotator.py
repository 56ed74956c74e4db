"""Auto-annotation: YOLO detections prompting SAM into polygon labels.

Behavioral spec: ultralytics/data/annotator.py:8-72 (auto_annotate — detect
with a YOLO model, feed the boxes to SAM as prompts, write one txt per image
with `cls poly-xyn` lines to <data>_auto_annotate_labels by default).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from edgeyolo_tpu.utils import LOGGER


def auto_annotate(
    data,
    det_model="yolo11n.yaml",
    sam_model="vit_b",
    conf: float = 0.25,
    iou: float = 0.45,
    imgsz: int = 640,
    max_det: int = 300,
    classes: list[int] | None = None,
    output_dir: str | Path | None = None,
    sam_img_size: int = 1024,
) -> Path:
    """Annotate every image under `data` with SAM masks seeded by YOLO boxes.

    det_model / sam_model may be names (yaml / SAM variant) or already-built
    YOLO / SAM instances (pass instances to reuse loaded weights). Returns the
    label directory. Each txt line: `cls x1 y1 x2 y2 ...` normalized polygon.
    """
    from edgeyolo_tpu.engine.model import YOLO
    from edgeyolo_tpu.engine.sam import SAM
    from edgeyolo_tpu.ops.segments import masks2segments

    det = det_model if not isinstance(det_model, str) else YOLO(det_model)
    sam = sam_model if not isinstance(sam_model, str) else SAM(sam_model, img_size=sam_img_size)

    data = Path(data)
    out = Path(output_dir) if output_dir else data.parent / f"{data.stem}_auto_annotate_labels"
    out.mkdir(parents=True, exist_ok=True)

    results = det.predict(data, stream=True, conf=conf, iou=iou, imgsz=imgsz,
                          max_det=max_det, verbose=False)
    n_img = 0
    for r in results:
        n_img += 1
        if r.boxes is None or len(r.boxes) == 0:
            continue
        cls_ids = r.boxes.cls.astype(int)
        keep = np.ones(len(cls_ids), bool) if classes is None else np.isin(cls_ids, classes)
        if not keep.any():
            continue
        boxes = r.boxes.xyxy[keep]
        h, w = r.orig_shape
        sam.set_image(r.orig_img)
        lines = []
        for c, box in zip(cls_ids[keep], boxes):
            masks, _ = sam(bboxes=box)
            for seg in masks2segments(masks):
                if len(seg) < 3:
                    continue
                pts = (seg / np.asarray([w, h], np.float32)).reshape(-1)
                lines.append(f"{int(c)} " + " ".join(f"{v:.6g}" for v in pts))
        if lines:
            txt = out / (Path(r.path).stem + ".txt")
            txt.write_text("\n".join(lines) + "\n")
    LOGGER.info(f"auto_annotate: {n_img} images -> {out}")
    return out
