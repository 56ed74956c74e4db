"""RT-DETR tests: auction matcher optimality, loss gradients, head shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeyolo_tpu.train.detr_loss import RTDETRDetectionLoss, auction_assign


def test_auction_matches_hungarian():
    import scipy.optimize

    rng = np.random.RandomState(1)
    for _ in range(10):
        C = rng.rand(5, 30).astype(np.float32)
        r, c = scipy.optimize.linear_sum_assignment(C)
        col = np.asarray(auction_assign(jnp.asarray(C), jnp.ones(5, bool)))
        assert C[np.arange(5), col].sum() <= C[r, c].sum() + 1e-3


def test_auction_respects_row_mask():
    C = jnp.asarray(np.random.RandomState(0).rand(4, 10), jnp.float32)
    col = np.asarray(auction_assign(C, jnp.asarray([True, True, False, False])))
    assert (col[:2] >= 0).all() and (col[2:] == -1).all()


def test_detr_loss_differentiable():
    rng = np.random.RandomState(0)
    nq, nc, B, M = 16, 3, 2, 4
    out = {
        "feats": [jax.nn.sigmoid(jnp.asarray(rng.randn(B, nq, 4), jnp.float32)),
                  jnp.asarray(rng.randn(B, nq, nc), jnp.float32)],
        "aux": ([], []),
        "enc_bboxes": jax.nn.sigmoid(jnp.asarray(rng.randn(B, nq, 4), jnp.float32)),
        "enc_scores": jnp.asarray(rng.randn(B, nq, nc), jnp.float32),
    }
    batch = {"cls": jnp.zeros((B, M)),
             "bboxes": jnp.asarray(rng.rand(B, M, 4) * 0.5 + 0.25, jnp.float32),
             "mask_gt": jnp.ones((B, M))}
    crit = RTDETRDetectionLoss(nc=nc)
    val, grads = jax.value_and_grad(lambda o: crit(o, batch)[0])(out)
    assert bool(jnp.isfinite(val))
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))


@pytest.mark.slow
def test_rtdetr_model_builds():
    from edgeyolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("rtdetr-l.yaml")
    assert m.count_params() == 32970476
