"""Data-parallel SPMD tests over the virtual 8-device CPU mesh — the CI
coverage the reference lacks entirely (its DDP test is hardware-gated,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgeyolo_tpu.parallel.mesh import batch_sharding, get_mesh, replicated, shard_batch


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return get_mesh(8)


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_batch_sharded_over_data_axis(mesh):
    x = np.zeros((16, 8, 8, 3), np.float32)
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    # each device holds 16/8 = 2 examples
    shard = xs.addressable_shards[0]
    assert shard.data.shape[0] == 2


def test_psum_gradient_semantics(mesh):
    """Replicated params + sharded batch: grads computed under jit equal the
    full-batch gradient (XLA inserts the reduction)."""
    w = jax.device_put(jnp.ones((4,)), replicated(mesh))
    x = np.arange(32 * 4, dtype=np.float32).reshape(32, 4) / 100.0
    xs = jax.device_put(x, batch_sharding(mesh))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_sharded = jax.jit(jax.grad(loss))(w, xs)
    g_local = jax.grad(loss)(jnp.ones((4,)), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_local), rtol=1e-5)


@pytest.mark.slow
def test_full_train_step_on_mesh():
    """The driver's dryrun contract: full training step over 8 devices."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_shard_batch_keeps_meta(mesh):
    b = {"img": np.zeros((8, 4, 4, 3)), "meta": ["x"] * 8, "n_real": 8}
    sb = shard_batch(b, mesh)
    assert sb["meta"] == ["x"] * 8 and sb["n_real"] == 8
    assert len(sb["img"].sharding.device_set) == 8


@pytest.mark.slow
def test_classify_train_step_on_mesh():
    """Classification training shards over the same data-parallel mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from edgeyolo_tpu.data.augment_device import classify_augment_batch
    from edgeyolo_tpu.nn.tasks import ClassificationModel
    from edgeyolo_tpu.parallel.mesh import batch_sharding, get_mesh, replicated

    mesh = get_mesh(8)
    model = ClassificationModel("yolo11-cls.yaml", nc=4)
    v = model.init(0, imgsz=32, batch=1)
    tx = optax.sgd(0.01)
    opt = tx.init(v["params"])

    @jax.jit
    def step(params, bs, opt, img_u8, labels, key):
        x = classify_augment_batch(img_u8, key, {"scale": 0.3, "fliplr": 0.5})

        def lf(p):
            logits, mut = model.net.apply({"params": p, "batch_stats": bs}, x,
                                          train=True, mutable=["batch_stats"])
            lp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(lp, labels[:, None], 1).mean(), mut["batch_stats"]

        (loss, nbs), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, nopt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), nbs, nopt, loss

    rng = np.random.RandomState(0)
    bsh = batch_sharding(mesh)
    img = jax.device_put(rng.randint(0, 255, (16, 32, 32, 3), np.uint8), bsh)
    lab = jax.device_put(rng.randint(0, 4, (16,)).astype(np.int32), bsh)
    state = jax.device_put((v["params"], v["batch_stats"], opt), replicated(mesh))
    p2, bs2, opt2, loss = step(*state, img, lab, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(loss))


@pytest.mark.slow
def test_world_forward_on_mesh():
    """WorldModel text-conditioned forward shards the batch over the mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from edgeyolo_tpu.nn.tasks import WorldModel
    from edgeyolo_tpu.parallel.mesh import batch_sharding, get_mesh, replicated

    mesh = get_mesh(8)
    m = WorldModel("yolov8-worldv2.yaml")
    emb = np.random.RandomState(0).randn(3, 512).astype(np.float32)
    m.set_classes(emb, names=["a", "b", "c"])
    v = m.init(0, imgsz=64, batch=1)
    x = jax.device_put(np.random.RandomState(1).rand(8, 64, 64, 3).astype(np.float32),
                       batch_sharding(mesh))
    vr = jax.device_put(v, replicated(mesh))
    out = jax.jit(lambda vv, xx: m.apply(vv, xx, train=False)["pred"])(vr, x)
    assert out.shape[0] == 8 and bool(jnp.isfinite(out).all())


@pytest.mark.slow
def test_multichip_training_converges_and_matches_single_device(tmp_path_factory):
    """Multi-chip convergence proof (VERDICT r2 #8): a short training run on
    the 8-device mesh must (a) decrease the loss and (b) land on the same
    loss trajectory and final metrics as a single-device run at the same
    seed — the DDP grad-mean == full-batch-grad contract (reference
    trainer.py:382-383), upgraded from one step to an actual run."""
    import csv as csv_mod

    from edgeyolo_tpu import YOLO
    from edgeyolo_tpu.data.synthetic import generate_dataset
    from edgeyolo_tpu.nn.tasks import DetectionModel

    root = tmp_path_factory.mktemp("conv")
    data = generate_dataset(root, n_train=16, n_val=4, imgsz=96, nc=3)
    runs = tmp_path_factory.mktemp("runs")

    def run(tag, n_dev):
        m = YOLO("yolo11n.yaml")
        m.model = DetectionModel("yolo11n.yaml", nc=3)
        m.train(data=str(data), epochs=4, imgsz=96, batch=8, nbs=8, val=False,
                plots=False, close_mosaic=0, amp=False, mosaic=0.0,
                warmup_epochs=0, lr0=0.01, optimizer="SGD", seed=3,
                project=str(runs), name=tag, device=str(n_dev), patience=10)
        with open(runs / tag / "results.csv") as f:
            rows = list(csv_mod.DictReader(f))
        tot = [sum(float(r[k]) for k in
                   ("train/box_loss", "train/cls_loss", "train/dfl_loss"))
               for r in rows]
        res = m.val(data=str(data), imgsz=96, batch=4, plots=False, device="1")
        return tot, res, m

    tot8, res8, _ = run("mesh8", 8)
    tot1, res1, _ = run("mesh1", 1)

    # (a) converges: last-epoch loss below first-epoch loss on the mesh run
    assert tot8[-1] < tot8[0], f"no loss decrease on 8-dev mesh: {tot8}"
    # (b) sharding is semantics-free. Epoch 1 is the tight check: identical
    # params + identical global batch stats (GSPMD partitions the BN
    # reductions over the same global batch), so only collective reduction
    # ORDER differs — the first-epoch loss must agree to fp32 noise. Later
    # epochs amplify that noise chaotically through SGD on 16 images (a
    # trajectory property, not a semantics one), so they get a loose band.
    np.testing.assert_allclose(tot8[0], tot1[0], rtol=1e-4, err_msg="epoch-1 loss")
    np.testing.assert_allclose(tot8, tot1, rtol=2e-2, err_msg="loss trajectory")
    for k in ("metrics/mAP50-95(B)", "metrics/mAP50(B)"):
        np.testing.assert_allclose(res8[k], res1[k], atol=5e-3, err_msg=k)


@pytest.mark.slow
def test_data_parallel_val_equals_single_device(tmp_path_factory):
    """Data-parallel eval (SURVEY §2.9): the validator sharded over the
    8-device CPU mesh must produce the same mAP as single-device val —
    the whole matching pipeline runs on device either way, so only the
    batch sharding differs."""
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.data.synthetic import generate_dataset
    from edgeyolo_tpu.engine.validator import DetectionValidator
    from edgeyolo_tpu.nn.tasks import DetectionModel

    root = tmp_path_factory.mktemp("dpval")
    data = generate_dataset(root, n_train=4, n_val=8, imgsz=96, nc=3)
    m = DetectionModel("yolo11n.yaml", nc=3)
    m.init(0, imgsz=96)
    vargs = get_cfg(overrides={"mode": "val", "imgsz": 96, "batch": 8, "conf": 0.01,
                               "iou": 0.7, "max_det": 32})
    r1 = DetectionValidator(vargs, save_dir=root / "v1", max_devices=1)(m, data=data)
    r8 = DetectionValidator(vargs, save_dir=root / "v8", max_devices=8)(m, data=data)
    assert len(jax.devices()) == 8
    for k in r1:
        np.testing.assert_allclose(r8[k], r1[k], atol=1e-7, err_msg=k)


def test_fsdp_mesh_and_shardings():
    """The ("data", "fsdp") mesh: batch shards over all 8 devices, flat
    vectors shard over the fsdp axis only."""
    from edgeyolo_tpu.parallel.mesh import flat_sharding, shard_flat_state

    mesh = get_mesh(8, fsdp=4)
    assert mesh.axis_names == ("data", "fsdp") and mesh.devices.shape == (2, 4)
    x = jax.device_put(np.zeros((16, 4, 4, 3), np.float32), batch_sharding(mesh))
    assert x.addressable_shards[0].data.shape[0] == 2  # 16 / (2*4)
    flat = jnp.arange(32.0)
    st = shard_flat_state((flat, {"bn": jnp.ones((3,))}, jnp.int32(0)), mesh, 32)
    # the flat vector is split 4-way (replicated over "data"), bn replicated
    assert st[0].sharding == flat_sharding(mesh)
    assert st[0].addressable_shards[0].data.shape[0] == 8
    assert st[1]["bn"].sharding.is_fully_replicated


@pytest.mark.slow
def test_fsdp_training_matches_data_parallel(tmp_path_factory):
    """ZeRO-style fsdp=4 over the 8-device mesh is semantics-free: the loss
    trajectory and final metrics must match the plain data-parallel run at
    the same seed (only the collective schedule differs — params all-gather
    forward, grads reduce-scatter backward, optimizer math on shards)."""
    import csv as csv_mod

    from edgeyolo_tpu import YOLO
    from edgeyolo_tpu.data.synthetic import generate_dataset
    from edgeyolo_tpu.nn.tasks import DetectionModel

    root = tmp_path_factory.mktemp("fsdp")
    data = generate_dataset(root, n_train=16, n_val=4, imgsz=96, nc=3)
    runs = tmp_path_factory.mktemp("runs")

    def run(tag, fsdp):
        m = YOLO("yolo11n.yaml")
        m.model = DetectionModel("yolo11n.yaml", nc=3)
        m.train(data=str(data), epochs=3, imgsz=96, batch=8, nbs=8, val=False,
                plots=False, close_mosaic=0, amp=False, mosaic=0.0,
                warmup_epochs=0, lr0=0.01, optimizer="SGD", seed=3,
                project=str(runs), name=tag, patience=10, fsdp=fsdp)
        with open(runs / tag / "results.csv") as f:
            rows = list(csv_mod.DictReader(f))
        tot = [sum(float(r[k]) for k in
                   ("train/box_loss", "train/cls_loss", "train/dfl_loss"))
               for r in rows]
        res = m.val(data=str(data), imgsz=96, batch=4, plots=False, device="1")
        return tot, res

    tot_f, res_f = run("fsdp4", 4)
    tot_d, res_d = run("dp8", 0)
    np.testing.assert_allclose(tot_f, tot_d, rtol=2e-3, err_msg="loss trajectory")
    for k in ("metrics/mAP50-95(B)", "metrics/mAP50(B)"):
        np.testing.assert_allclose(res_f[k], res_d[k], atol=5e-3, err_msg=k)


@pytest.mark.slow
def test_spatial_partitioned_forward_matches_replicated():
    """Sequence/context-parallel inference (SURVEY §2.9 stretch goal): the
    image H axis sharded 8-way through the FULL detect network — conv halo
    exchanges, SPPF pools and C2PSA attention psums all inserted by GSPMD —
    must reproduce the replicated forward exactly."""
    from jax.sharding import PartitionSpec as P

    from edgeyolo_tpu.nn.tasks import DetectionModel
    from edgeyolo_tpu.parallel.mesh import spatial_sharding

    mesh = get_mesh(8)
    m = DetectionModel("yolo11n.yaml", nc=3)
    v = m.init(0, imgsz=256, batch=1)
    x = np.random.RandomState(0).rand(1, 256, 256, 3).astype(np.float32)
    f = jax.jit(lambda vv, xx: m.net.apply(vv, xx, train=False)["pred"])
    vr = jax.device_put(v, replicated(mesh))
    sp = spatial_sharding(mesh)
    assert sp.spec == P(None, "data")
    ys = f(vr, jax.device_put(x, sp))
    yr = f(vr, jax.device_put(x, replicated(mesh)))
    np.testing.assert_array_equal(np.asarray(ys), np.asarray(yr))


@pytest.mark.slow
def test_multiprocess_train_step(tmp_path):
    """REAL multi-process run (the DCN/multi-host story, SURVEY §2.9): two
    gloo-connected processes, each owning 4 virtual CPU devices, jit one
    classify train step over the GLOBAL 8-device mesh with
    host_local_batch feeding each process its half of the batch. Both
    processes must report the same loss as a single-process full-batch
    step — the reference's DDP grad contract, actually executed across
    process boundaries (its own DDP test is hardware-gated)."""
    import json
    import subprocess
    import sys

    worker = tmp_path / "worker.py"
    worker.write_text(
        "import os, sys, json\n"
        "pid, n, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]\n"
        "os.environ['PALLAS_AXON_POOL_IPS'] = ''\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'\n"
        "sys.path.insert(0, '/root/repo')\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from edgeyolo_tpu.parallel.distributed import init_distributed, host_local_batch\n"
        "init_distributed('127.0.0.1:12939', n, pid)\n"
        "assert jax.device_count() == 8 and jax.local_device_count() == 4\n"
        "import jax.numpy as jnp, numpy as np\n"
        "from edgeyolo_tpu.nn.tasks import ClassificationModel\n"
        "from edgeyolo_tpu.parallel.mesh import get_mesh, replicated\n"
        "mesh = get_mesh()\n"
        "m = ClassificationModel('yolo11-cls.yaml', nc=3)\n"
        "v = m.init(0, imgsz=32, batch=1)\n"
        "rng = np.random.RandomState(0)\n"
        "imgs = rng.rand(8, 32, 32, 3).astype(np.float32)\n"
        "labs = rng.randint(0, 3, (8,)).astype(np.int32)\n"
        "local = slice(pid * 4, (pid + 1) * 4)\n"
        "b = host_local_batch({'img': imgs[local], 'cls': labs[local]}, mesh)\n"
        "vr = jax.device_put(v, replicated(mesh))\n"
        "def lf(p, bs, img, lab):\n"
        "    logits = m.net.apply({'params': p, 'batch_stats': bs}, img, train=False)\n"
        "    return -jnp.take_along_axis(jax.nn.log_softmax(logits), lab[:, None], 1).mean()\n"
        "loss, g = jax.jit(jax.value_and_grad(lf))(vr['params'], vr['batch_stats'], b['img'], b['cls'])\n"
        "gnorm = jax.jit(lambda g: jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(g))))(g)\n"
        "json.dump({'loss': float(loss), 'gnorm': float(gnorm)}, open(out, 'w'))\n"
    )
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), "2",
                          str(tmp_path / f"out{i}.json")],
                         stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    for p in procs:
        assert p.wait(timeout=900) == 0, "distributed worker failed"
    r0 = json.loads((tmp_path / "out0.json").read_text())
    r1 = json.loads((tmp_path / "out1.json").read_text())
    assert np.isfinite(r0["loss"])
    np.testing.assert_allclose(r0["loss"], r1["loss"], rtol=1e-6)
    np.testing.assert_allclose(r0["gnorm"], r1["gnorm"], rtol=1e-6)

    # single-process full-batch reference: same seed, same math
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.tasks import ClassificationModel

    m = ClassificationModel("yolo11-cls.yaml", nc=3)
    v = m.init(0, imgsz=32, batch=1)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32))
    labs = jnp.asarray(rng.randint(0, 3, (8,)).astype(np.int32))
    logits = m.net.apply({"params": v["params"], "batch_stats": v["batch_stats"]},
                         imgs, train=False)
    ref = float(-jnp.take_along_axis(jax.nn.log_softmax(logits), labs[:, None], 1).mean())
    np.testing.assert_allclose(r0["loss"], ref, rtol=1e-5,
                               err_msg="2-process loss != single-process full batch")
