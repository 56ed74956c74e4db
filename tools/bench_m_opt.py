"""Quiet-window follow-ups for the yolo11m roofline (PERF.md round 4):

1. re-measure the train-step benches (the first sweep ran against heavy host
   CPU contention; the chained-dispatch method still needs a responsive host
   for step dispatch over the axon tunnel),
2. A/B the inference feats path with BatchNorm FOLDED into conv weights
   (export-style fuse_conv_bn applied to live variables) — at m scale every
   BN is an extra elementwise pass over a 512-channel map unless XLA fuses
   it into the conv epilogue; measuring decides whether a fused-inference
   mode is worth exposing.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from tools.bench_scales import bench_one, bench_train_one, _timeit  # noqa: E402


def bench_fused(spec: str, batch: int, imgsz: int = 640):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from edgeyolo_tpu.nn.tasks import DetectionModel, fuse_conv_bn

    model = DetectionModel(spec)
    model.init(0, imgsz=imgsz, batch=1)
    v = fuse_conv_bn(model.variables, eps=getattr(model, "bn_eps", None))

    def pipeline(v, img_u8, salt):
        x = (img_u8.astype(jnp.bfloat16) + salt.astype(jnp.bfloat16)) / 255.0
        out = model.net.apply(v, x, train=False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in out["feats"])

    step = jax.jit(pipeline)
    rng = np.random.RandomState(0)
    img = jax.device_put(jnp.asarray(
        rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)))
    per_batch = _timeit(step, v, img)
    return {"model": spec, "stage": "feats+bnfold", "batch": batch,
            "imgs_per_sec": round(batch / per_batch, 1),
            "ms_per_img": round(per_batch / batch * 1e3, 3)}


def main():
    import jax
    assert jax.devices()[0].platform != "cpu"
    rows = []
    for fn, args in [
        (bench_one, ("yolo11m.yaml", 128, 640, "feats")),
        (bench_fused, ("yolo11m.yaml", 128)),
        (bench_one, ("yolo11m.yaml", 128, 640, "e2e")),
        (bench_train_one, ("yolo11s.yaml", 64)),
        (bench_train_one, ("yolo11m.yaml", 32)),
        (bench_train_one, ("yolo11m.yaml", 64)),
    ]:
        r = fn(*args)
        print(json.dumps(r), flush=True)
        rows.append(r)
    Path("/tmp/bench_m_opt.json").write_text(json.dumps(rows))


if __name__ == "__main__":
    main()
