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


@pytest.mark.slow
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


def test_cdn_group_semantics():
    """make_cdn_group: static shapes, group layout, noise scaling (reference
    models/utils/ops.py:259-345)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from edgeyolo_tpu.train.detr_loss import make_cdn_group

    B, M, nc = 3, 10, 7
    key = jax.random.PRNGKey(0)
    cls = jax.random.randint(key, (B, M), 0, nc)
    box = jnp.clip(jax.random.uniform(key, (B, M, 4)) * 0.4 + 0.3, 0.1, 0.9)
    mask = (jnp.arange(M)[None] < jnp.array([[6], [2], [10]])).astype(jnp.float32)
    dn = make_cdn_group(cls, box, mask, nc, jax.random.PRNGKey(1))

    g = max(1, 100 // M)
    D = 2 * g * M
    assert dn["cls"].shape == (B, D) and dn["bbox"].shape == (B, D, 4)
    assert dn["group_size"] == 2 * M and dn["num_groups"] == g
    assert dn["neg"].shape == (D,) and dn["neg"].sum() == D // 2
    # boxes stay normalized
    assert float(dn["bbox"].min()) >= 0.0 and float(dn["bbox"].max()) <= 1.0
    # valid mask tiles the gt mask
    v = np.asarray(dn["valid"]).reshape(B, 2 * g, M)
    assert (v == np.asarray(mask)[:, None, :]).all()
    # negatives are displaced further from their source than positives (cx shift)
    src = np.tile(np.asarray(box), (1, 2 * g, 1))
    disp = np.abs(np.asarray(dn["bbox"]) - src).sum(-1)
    valid = np.asarray(dn["valid"]) > 0
    neg = np.asarray(dn["neg"])[None, :] & valid
    pos = ~np.asarray(dn["neg"])[None, :] & valid
    assert disp[neg].mean() > disp[pos].mean()
    # labels only flip for a minority of slots
    flips = (np.asarray(dn["cls"]) != np.tile(np.asarray(cls), (1, 2 * g)))[valid]
    assert 0.0 < flips.mean() < 0.5


def test_cdn_attention_mask_isolation():
    """dn groups must not leak into each other or into the real queries."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import flax.linen as nn
    from edgeyolo_tpu.nn.modules.transformer import _mha

    class SA(nn.Module):
        @nn.compact
        def __call__(self, q, mask):
            dense = lambda f, nm: nn.Dense(f, name=nm)
            return _mha(q, q, q, 4, dense, "sa", mask=mask)

    D, nq, gs = 8, 5, 4  # 2 groups of 4
    T = D + nq
    m = np.zeros((T, T), bool)
    m[D:, :D] = True
    for gi in range(2):
        a, b = gi * gs, (gi + 1) * gs
        m[a:b, :a] = True
        m[a:b, b:D] = True
    mod = SA()
    q = jax.random.normal(jax.random.PRNGKey(0), (1, T, 16))
    v = mod.init(jax.random.PRNGKey(1), q, jnp.asarray(m))
    base = mod.apply(v, q, jnp.asarray(m))
    # perturbing group 0 must not change group 1 nor the real queries
    q2 = q.at[:, 0].add(100.0)
    out2 = mod.apply(v, q2, jnp.asarray(m))
    assert float(jnp.abs(out2[:, gs:D] - base[:, gs:D]).max()) < 1e-5
    assert float(jnp.abs(out2[:, D:] - base[:, D:]).max()) < 1e-5
    # but group 0 itself does change
    assert float(jnp.abs(out2[:, :gs] - base[:, :gs]).max()) > 1e-3
