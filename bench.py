#!/usr/bin/env python
"""Benchmark harness: end-to-end 640px single-chip inference throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: images/sec for the full on-device pipeline (normalize + forward +
DFL decode + class-aware NMS) on the flagship EdgeLine-YOLO model at 640px,
batch 16, bf16 activations — the reference's headline is ~8 ms FP16/img
(125 img/s) end-to-end on an RTX 4090 (BASELINE.md), which we use as
vs_baseline denominator.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

BASELINE_IMGS_PER_SEC = 125.0  # reference: ~8 ms FP16 end-to-end on RTX 4090


def main():
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.tasks import DetectionModel
    from edgeyolo_tpu.ops.nms import non_max_suppression

    imgsz, batch = 640, 16
    model = DetectionModel("edgeline-yolo.yaml")
    model.init(0, imgsz=imgsz, batch=1)
    variables = model.variables

    use_bf16 = jax.devices()[0].platform != "cpu"

    @jax.jit
    def pipeline(v, img_u8):
        x = img_u8.astype(jnp.bfloat16 if use_bf16 else jnp.float32) / 255.0
        out = model.net.apply(v, x, train=False)
        return non_max_suppression(
            out["pred"].astype(jnp.float32), conf_thres=0.25, iou_thres=0.7,
            max_det=300, max_nms=4096, multi_label=False,
        )

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))

    # warmup / compile
    det, n = pipeline(variables, img)
    jax.block_until_ready((det, n))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        det, n = pipeline(variables, img)
    jax.block_until_ready((det, n))
    dt = time.perf_counter() - t0
    imgs_per_sec = batch * iters / dt

    print(json.dumps({
        "metric": "edgeline-yolo-n 640px e2e imgs/sec/chip (fwd+decode+NMS, bf16, b16)",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
