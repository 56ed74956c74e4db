"""Minimal torchvision shim for the reference's val path (ops.nms only).

The reference imports torchvision solely for ops.nms inside
non_max_suppression (ultralytics/utils/ops.py:214) and version metadata in
checks. Greedy NMS in pure torch reproduces torchvision.ops.nms exactly
(same sort + IoU>thresh suppression semantics).
"""

import torch

__version__ = "0.99.0"


def _nms(boxes: torch.Tensor, scores: torch.Tensor, iou_threshold: float) -> torch.Tensor:
    order = scores.argsort(descending=True)
    keep = []
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    while order.numel() > 0:
        i = order[0].item()
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.maximum(x1[i], x1[rest])
        yy1 = torch.maximum(y1[i], y1[rest])
        xx2 = torch.minimum(x2[i], x2[rest])
        yy2 = torch.minimum(y2[i], y2[rest])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[rest] - inter).clamp(min=1e-12)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.long, device=boxes.device)


class ops:  # torchvision.ops namespace
    nms = staticmethod(_nms)


class _BatchedNMSModule:
    pass
