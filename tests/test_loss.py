"""Detection loss + TAL parity tests.

Golden values were produced by running the reference criterion
(ultralytics/utils/loss.py v8DetectionLoss, incl. the fork's quality-joint
path) on the identical deterministic inputs:
    plain  total=481.9049,  items=(box 1.825, cls 238.05, dfl 1.0737)
    quality total=207.5087, items=(box 1.825, cls 100.86, dfl 1.0737)
TAL matches the reference except for tie-breaks among zero-align candidates
(zero target weight either way — no loss impact).
"""

import jax
import jax.numpy as jnp
import numpy as np

from edgeyolo_tpu.train.loss import DetectionLoss, df_loss, quality_focal_loss
from edgeyolo_tpu.train.tal import task_aligned_assign

NC, REG_MAX, B = 4, 16, 2
SHAPES = [(8, 8), (4, 4), (2, 2)]
STRIDES = (8, 16, 32)


def _setup():
    no = NC + 4 * REG_MAX
    rng = np.random.RandomState(7)
    feats = [jnp.asarray(np.transpose(rng.randn(B, no, h, w).astype(np.float32) * 0.5, (0, 2, 3, 1)))
             for h, w in SHAPES]
    boxes = np.array(
        [[0.3, 0.3, 0.2, 0.25], [0.6, 0.55, 0.3, 0.3], [0.8, 0.2, 0.15, 0.2],
         [0.5, 0.5, 0.4, 0.4], [0.25, 0.7, 0.2, 0.2]], np.float32)
    clss = np.array([0, 1, 2, 3, 1], np.float32)
    gtb = np.zeros((B, 3, 4), np.float32)
    gtc = np.zeros((B, 3), np.float32)
    mg = np.zeros((B, 3), np.float32)
    gtb[0, :3], gtc[0, :3], mg[0, :3] = boxes[:3], clss[:3], 1
    gtb[1, :2], gtc[1, :2], mg[1, :2] = boxes[3:], clss[3:], 1
    batch = {"cls": jnp.asarray(gtc), "bboxes": jnp.asarray(gtb), "mask_gt": jnp.asarray(mg)}
    quals = [jnp.asarray(np.transpose(1 / (1 + np.exp(-rng.randn(B, 1, h, w).astype(np.float32))), (0, 2, 3, 1)))
             for h, w in SHAPES]
    return feats, batch, quals


def test_loss_matches_reference_golden():
    feats, batch, _ = _setup()
    crit = DetectionLoss(nc=NC, reg_max=REG_MAX, stride=STRIDES)
    total, items = crit(feats, batch)
    np.testing.assert_allclose(float(total), 481.9049, rtol=1e-4)
    np.testing.assert_allclose(float(items["box"]), 1.824973, rtol=1e-4)
    np.testing.assert_allclose(float(items["cls"]), 238.0537, rtol=1e-4)
    np.testing.assert_allclose(float(items["dfl"]), 1.073740, rtol=1e-4)


def test_quality_joint_loss_matches_reference_golden():
    feats, batch, quals = _setup()
    crit = DetectionLoss(nc=NC, reg_max=REG_MAX, stride=STRIDES)
    total, items = crit(feats, batch, quality=quals)
    np.testing.assert_allclose(float(total), 207.5087, rtol=1e-4)
    np.testing.assert_allclose(float(items["cls"]), 100.8556, rtol=1e-4)


def test_loss_is_differentiable_and_finite():
    feats, batch, quals = _setup()
    crit = DetectionLoss(nc=NC, reg_max=REG_MAX, stride=STRIDES)

    def f(feats):
        return crit(feats, batch, quality=quals)[0]

    grads = jax.grad(f)(feats)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


def test_loss_empty_image_no_nan():
    feats, batch, _ = _setup()
    empty = {k: jnp.zeros_like(v) for k, v in batch.items()}
    crit = DetectionLoss(nc=NC, reg_max=REG_MAX, stride=STRIDES)
    total, items = crit(feats, empty)
    assert bool(jnp.isfinite(total))
    assert float(items["box"]) == 0.0  # no positives -> no box loss


def test_loss_empty_image_gradient_finite():
    """Gradient regression for the dense-masking NaN (round-3 fix): an image
    with ZERO gt puts degenerate (0,0,0,0) targets on every anchor; CIoU's
    arctan(0/0) and probiou's sqrt(det)' are NaN/inf there and 0-weight
    multiply-masking does NOT stop the NaN in the backward (0 x NaN = NaN).
    The reference never sees those pairs (fg boolean indexing); our dense
    formulation must where-guard. The OBB twin lives below."""
    feats, batch, _ = _setup()
    empty = {k: jnp.zeros_like(v) for k, v in batch.items()}
    crit = DetectionLoss(nc=NC, reg_max=REG_MAX, stride=STRIDES)

    def f(feats):
        return crit(feats, empty)[0]

    grads = jax.grad(f)(feats)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g))), "NaN grad on empty-gt image"


def test_obb_loss_empty_image_gradient_finite():
    from edgeyolo_tpu.train.loss import OBBLoss

    no = NC + 4 * REG_MAX
    rng = np.random.RandomState(11)
    feats = [jnp.asarray(np.transpose(rng.randn(B, no, h, w).astype(np.float32) * 0.5,
                                      (0, 2, 3, 1))) for h, w in SHAPES]
    angle = jnp.asarray(rng.randn(B, sum(h * w for h, w in SHAPES), 1).astype(np.float32) * 0.1)
    empty = {"cls": jnp.zeros((B, 3)), "bboxes": jnp.zeros((B, 3, 5)),
             "mask_gt": jnp.zeros((B, 3))}
    crit = OBBLoss(nc=NC, reg_max=REG_MAX, stride=STRIDES)

    def f(feats, angle):
        return crit({"feats": feats, "angle": angle}, empty)[0]

    grads = jax.grad(f, argnums=(0, 1))(feats, angle)
    for g in jax.tree.leaves(grads):
        assert bool(jnp.all(jnp.isfinite(g))), "NaN grad on empty-gt OBB image"


def test_tal_fg_anchors_inside_their_gt():
    rng = np.random.RandomState(3)
    A, M = 64, 4
    anc = (rng.rand(A, 2) * 32).astype(np.float32)
    wh = rng.rand(1, A, 2).astype(np.float32) * 8 + 2
    pdb = np.concatenate([anc[None] - wh / 2, anc[None] + wh / 2], -1)
    pds = rng.rand(1, A, 2).astype(np.float32)
    gtb = np.array([[[4, 4, 16, 16], [18, 18, 30, 30], [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32)
    gtl = np.array([[0, 1, 0, 0]])
    mg = np.array([[1, 1, 0, 0]], np.float32)
    tl, tb, ts, fg, tgi = task_aligned_assign(
        jnp.asarray(pds), jnp.asarray(pdb), jnp.asarray(anc), jnp.asarray(gtl),
        jnp.asarray(gtb), jnp.asarray(mg), topk=10, num_classes=2)
    fg_np = np.asarray(fg)[0]
    tgi_np = np.asarray(tgi)[0]
    for a in np.where(fg_np)[0]:
        g = gtb[0, tgi_np[a]]
        assert g[0] < anc[a, 0] < g[2] and g[1] < anc[a, 1] < g[3]


def test_df_loss_perfect_prediction_low():
    """Sharp correct distribution -> near-zero DFL; uniform -> higher."""
    t = jnp.asarray([[[3.0, 5.0, 2.0, 7.0]]])
    sharp = jax.nn.one_hot(t.astype(jnp.int32), 16) * 50.0
    uniform = jnp.zeros((1, 1, 4, 16))
    assert float(df_loss(sharp, t).sum()) < 1e-3
    assert float(df_loss(uniform, t).sum()) > 1.0


def test_qfl_modulation():
    logits = jnp.asarray([0.0, 0.0])
    target = jnp.asarray([1.0, 0.0])
    l = quality_focal_loss(logits, target)
    # positive with sigma=0.5: bce*|1-0.5|^2; negative: bce*0.5^2 -> equal here
    np.testing.assert_allclose(np.asarray(l)[0], np.asarray(l)[1], rtol=1e-6)


def test_zero_gains_disable_loss_terms():
    """Regression: attribute-style hyp with box/cls/dfl = 0.0 used to fall
    through an `or`-chain back to the defaults, silently training a loss the
    user turned off."""
    from types import SimpleNamespace

    feats, batch, _ = _setup()
    crit = DetectionLoss(nc=NC, reg_max=REG_MAX, stride=STRIDES,
                         hyp=SimpleNamespace(box=0.0, cls=0.0, dfl=0.0))
    assert crit.box_gain == crit.cls_gain == crit.dfl_gain == 0.0
    total, items = crit(feats, batch)
    assert float(total) == 0.0


def test_seg_pose_share_one_assignment_with_det_terms():
    """The seg/pose extra terms must consume the same TAL assignment as the
    detection terms (single _prepare): det items equal plain DetectionLoss."""
    from edgeyolo_tpu.train.loss import SegmentationLoss

    feats, batch, _ = _setup()
    det_total, det_items = DetectionLoss(nc=NC, reg_max=REG_MAX, stride=STRIDES)(feats, batch)
    A = sum(h * w for h, w in SHAPES)
    rng = np.random.RandomState(3)
    out = {"feats": feats,
           "mask_coefs": jnp.asarray(rng.randn(B, A, 8).astype(np.float32) * 0.1),
           "proto": jnp.asarray(rng.randn(B, 16, 16, 8).astype(np.float32) * 0.1)}
    sbatch = dict(batch, masks=jnp.asarray((rng.rand(B, 3, 16, 16) > 0.5).astype(np.float32)))
    seg_total, seg_items = SegmentationLoss(nc=NC, reg_max=REG_MAX, stride=STRIDES)(out, sbatch)
    for k in det_items:
        np.testing.assert_allclose(float(seg_items[k]), float(det_items[k]), rtol=1e-6)
    assert float(seg_items["seg"]) > 0 and bool(jnp.isfinite(seg_total))


def test_padded_duplicates_train_at_zero_weight():
    """img_weight masking: a batch padded with a duplicate at weight 0 must
    produce the same loss as the unpadded batch (dataset._collate pads the
    final partial batch with repeats of its last item)."""
    feats, batch, _ = _setup()
    # batch of 2 -> keep only image 0 real, mark image 1 as padding
    w = jnp.asarray([1.0, 0.0])
    crit = DetectionLoss(nc=NC, reg_max=REG_MAX, stride=STRIDES)
    total_w, items_w = crit(feats, dict(batch, img_weight=w))
    # reference: single-image batch built from image 0 alone
    feats1 = [f[:1] for f in feats]
    batch1 = {k: v[:1] for k, v in batch.items()}
    total_1, items_1 = crit(feats1, batch1)
    np.testing.assert_allclose(float(total_w), float(total_1), rtol=1e-5)
    for k in items_1:
        np.testing.assert_allclose(float(items_w[k]), float(items_1[k]), rtol=1e-5)


def test_adamw_is_decoupled_from_adam():
    """AdamW must apply decay OUTSIDE the moment estimates (torch AdamW);
    with decay=0 the two coincide, with decay>0 they must differ."""
    import optax

    from edgeyolo_tpu.train.trainer import build_optimizer

    p = {"w": {"kernel": jnp.ones((4, 4))}}
    g = {"w": {"kernel": jnp.full((4, 4), 0.5)}}
    outs = {}
    for name in ("Adam", "AdamW"):
        tx = build_optimizer(p, name, 0.01, 0.9, 0.1, lambda s: 0.01)
        st = tx.init(p)
        u, _ = tx.update(g, st, p)
        outs[name] = float(jnp.sum(u["w"]["kernel"]))
    assert abs(outs["Adam"] - outs["AdamW"]) > 1e-6, outs
