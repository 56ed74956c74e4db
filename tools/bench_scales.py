"""Throughput sweep over model scales on the real chip: e2e inference
(normalize + forward + DFL decode + NMS, bf16) for edgeline-yolo at n/s/m
and yolo11 n/s/m, plus the FLOP-derived MXU utilization. Extends PERF.md's
single-scale roofline to the zoo the reference benchmarks (BASELINE.md
reports the 4090 numbers for the nano flagship only).

Run: python tools/bench_scales.py  (TPU; one process at a time)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def bench_one(name: str, scale: str, batch: int, imgsz: int = 640):
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.tasks import DetectionModel
    from edgeyolo_tpu.ops.nms import non_max_suppression

    spec = name.replace(".yaml", f"{scale}.yaml") if scale else name
    model = DetectionModel(spec)
    model.init(0, imgsz=imgsz, batch=1)
    v = model.variables

    @jax.jit
    def step(v, img_u8, salt):
        x = (img_u8.astype(jnp.bfloat16) + salt) / 255.0
        out = model.net.apply(v, x, train=False)
        det, n = non_max_suppression(
            out["pred"].astype(jnp.float32), conf_thres=0.25, iou_thres=0.7,
            max_det=300, max_nms=1024, multi_label=False, method="matrix")
        return jnp.sum(det) + n.sum()

    rng = np.random.RandomState(0)
    img = jax.device_put(jnp.asarray(
        rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)))

    def run(n_iters):
        t0 = time.perf_counter()
        salt = jnp.float32(0.0)
        for _ in range(n_iters):
            salt = step(v, img, salt * 1e-12)
        float(salt)
        return time.perf_counter() - t0

    run(1); run(1)
    t1 = min(run(1), run(1))
    tn = min(run(9), run(9))
    per_batch = (tn - t1) / 8
    n_params = sum(int(np.prod(p.shape)) for p in
                   __import__("jax").tree.leaves(v["params"]))
    return {"model": spec, "batch": batch, "imgs_per_sec": round(batch / per_batch, 1),
            "ms_per_img": round(per_batch / batch * 1e3, 3), "params_M": round(n_params / 1e6, 2)}


def main():
    import jax
    assert jax.devices()[0].platform != "cpu", "scale sweep wants the real chip"
    rows = []
    for name, scales_batches in (("edgeline-yolo.yaml", (("", 128),)),
                                 ("yolo11n.yaml", (("", 128),)),
                                 ("yolo11s.yaml", (("", 128),)),
                                 ("yolo11m.yaml", (("", 64),)),):
        for scale, b in scales_batches:
            r = bench_one(name, scale, b)
            print(json.dumps(r), flush=True)
            rows.append(r)
    Path("/tmp/bench_scales.json").write_text(json.dumps(rows))


if __name__ == "__main__":
    main()
