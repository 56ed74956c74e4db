"""One real train step per model family on tiny shapes — catches wiring
breaks (loss plumbing, head outputs, E2E branches, CBFuse/HyperACE graphs)
that parse-time param parity cannot see. Mirrors the reference's
test_train_scratch over the model zoo (tests/test_python.py:205) without
the dataset download."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from edgeyolo_tpu.nn.tasks import DetectionModel
from edgeyolo_tpu.train.loss import DetectionLoss, E2EDetectLoss

pytestmark = pytest.mark.slow  # heavy: see README fast tier

FAMILIES = [
    ("yolov3-tiny.yaml", DetectionLoss),
    ("yolov5n.yaml", DetectionLoss),
    ("yolov6n.yaml", DetectionLoss),
    ("yolov8n.yaml", DetectionLoss),
    ("yolov9t.yaml", DetectionLoss),
    ("yolov10n.yaml", E2EDetectLoss),   # v10Detect trains one2many+one2one
    ("yolo11n.yaml", DetectionLoss),
    ("yolov12n.yaml", DetectionLoss),
    ("yolov13n.yaml", DetectionLoss),   # HyperACE + FullPAD_Tunnel graph
    ("yolov8-p2.yaml", DetectionLoss),  # 4-level head
    ("yolov8-test.yaml", E2EDetectLoss),  # EdgeLine E2EDetect
]


@pytest.mark.parametrize("cfg,loss_cls", FAMILIES, ids=[f[0] for f in FAMILIES])
def test_family_one_train_step(cfg, loss_cls):
    imgsz, B, M = 64, 2, 4
    model = DetectionModel(cfg, nc=3)
    v = model.init(0, imgsz=imgsz, batch=1)
    crit = loss_cls(model, hyp={"box": 7.5, "cls": 0.5, "dfl": 1.5})
    tx = optax.sgd(0.01)
    opt = tx.init(v["params"])
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, imgsz, imgsz, 3), jnp.float32)
    tgt = {
        "cls": jnp.zeros((B, M)),
        "bboxes": jnp.tile(jnp.asarray([[0.5, 0.5, 0.4, 0.4]]), (B, M, 1)),
        "mask_gt": jnp.concatenate([jnp.ones((B, 2)), jnp.zeros((B, M - 2))], 1),
    }

    @jax.jit
    def step(params, bs, opt):
        def lf(p):
            out, mut = model.net.apply({"params": p, "batch_stats": bs}, img,
                                       train=True, mutable=["batch_stats"])
            if loss_cls is E2EDetectLoss:  # consumes the full head dict
                loss, items = crit(out, tgt)
            else:
                loss, items = crit(out["feats"], tgt, out.get("quality"))
            return loss, (items, mut["batch_stats"])

        (loss, (items, nbs)), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, nopt = tx.update(g, opt, params)
        gnorm = optax.global_norm(g)
        return optax.apply_updates(params, u), nbs, nopt, loss, gnorm

    p2, bs2, opt2, loss, gnorm = step(v["params"], v["batch_stats"], opt)
    assert bool(jnp.isfinite(loss)), cfg
    assert bool(jnp.isfinite(gnorm)) and float(gnorm) > 0, cfg
    # params actually moved
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(p2))
    )
    assert moved, cfg
