#!/usr/bin/env python
"""Benchmark harness: end-to-end 640px single-chip inference throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the full on-device pipeline (normalize + forward + DFL decode +
class-aware NMS) on the flagship EdgeLine-YOLO model, 640px batch 16, bf16.

Timing method: chained dispatch with a single scalar fetch, reporting the
marginal per-batch time (T(N) - T(1)) / (N - 1). On this runtime
block_until_ready returns at enqueue, and every host fetch pays a ~25 ms
relay round trip, so naive per-iteration sync under- or over-states device
throughput; chaining isolates the device time.

Baseline: the reference's headline ~8 ms FP16 end-to-end per image on an
RTX 4090 (BASELINE.md) => 125 img/s.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

BASELINE_IMGS_PER_SEC = 125.0


def main():
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.tasks import DetectionModel
    from edgeyolo_tpu.ops.nms import non_max_suppression

    imgsz, batch = 640, 16
    model = DetectionModel("edgeline-yolo.yaml")
    model.init(0, imgsz=imgsz, batch=1)
    v = model.variables
    use_bf16 = jax.devices()[0].platform != "cpu"
    dt_in = jnp.bfloat16 if use_bf16 else jnp.float32

    @jax.jit
    def step(v, img_u8, salt):
        x = (img_u8.astype(dt_in) + salt) / 255.0
        out = model.net.apply(v, x, train=False)
        det, n = non_max_suppression(
            out["pred"].astype(jnp.float32), conf_thres=0.25, iou_thres=0.7,
            max_det=300, max_nms=4096, multi_label=False, method="matrix",
        )
        return jnp.sum(det) + n.sum()  # scalar checksum forces execution

    rng = np.random.RandomState(0)
    img = jax.device_put(jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)))

    def run(n_iters: int) -> float:
        t0 = time.perf_counter()
        salt = jnp.float32(0.0)
        for _ in range(n_iters):
            salt = step(v, img, salt * 1e-12)  # chain: serialize on device
        float(salt)  # one fetch
        return time.perf_counter() - t0

    run(1)
    run(1)  # warm compile + cache
    t1 = min(run(1), run(1))
    tn = min(run(17), run(17))
    per_batch = (tn - t1) / 16
    imgs_per_sec = batch / per_batch

    print(json.dumps({
        "metric": "edgeline-yolo-n 640px e2e imgs/sec/chip (fwd+decode+NMS, bf16, b16)",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
