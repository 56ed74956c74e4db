"""HUB session + Events queue + Triton URL parsing (all offline paths).

Behavioral spec: ultralytics/hub/session.py:19, hub/utils.py:170,
utils/triton.py (URL forms scheme://host/endpoint and (url, endpoint,
scheme) triple).
"""

from edgeyolo_tpu.hub import Events, HUBTrainingSession, login
from edgeyolo_tpu.utils.callbacks import CallbackMixin, try_register_integrations
from edgeyolo_tpu.utils.triton import TritonRemoteModel


def test_hub_offline_login_and_session():
    assert login() is False  # zero-egress image
    s = HUBTrainingSession("https://hub.invalid/models/abc123?x=1")
    assert s.model_id == "abc123"
    s2 = HUBTrainingSession("k" * 42 + "_deadbeef")
    assert s2.model_id == "deadbeef"
    s.upload_metrics(0, '{"m": 1.0}')
    assert 0 in s.metrics_queue  # offline: retained as local record
    s.upload_model(0, "/tmp/none.msgpack")  # no raise offline


def test_hub_session_trainer_wiring():
    class T(CallbackMixin):
        epoch = 3
        last_metrics = {"fitness": 0.5}
        last_ckpt_path = "/tmp/last.msgpack"
        best_ckpt_path = None
    t = T()
    t.init_callbacks()
    s = HUBTrainingSession("mid")
    s.register_callbacks(t)
    t.run_callbacks("on_fit_epoch_end")
    t.run_callbacks("on_train_end")
    assert 3 in s.metrics_queue and s.alive is False


def test_events_queue_disabled_offline():
    e = Events()
    assert e.enabled is False
    class Cfg: task, mode = "detect", "train"
    e(Cfg())
    assert e.events == []  # disabled: nothing queued
    e2 = Events(enabled=True)
    e2.rate_limit = 1e9  # never drains in-test
    for _ in range(30):
        e2(Cfg())
    assert len(e2.events) == 25  # capped


def test_triton_url_forms():
    m = TritonRemoteModel("http://localhost:8000/yolo")
    assert (m.url, m.endpoint, m.scheme) == ("localhost:8000", "yolo", "http")
    m2 = TritonRemoteModel("host:8001", endpoint="det", scheme="http")
    assert m2.base.endswith("/v2/models/det")


def test_integrations_registry():
    class T(CallbackMixin):
        pass
    t = T()
    t.init_callbacks()
    enabled = ("tensorboard", "wandb", "comet", "mlflow", "clearml", "dvc", "neptune")  # skip raytune: ray import is ~30s
    status = try_register_integrations(t, "/tmp/tb_test", enabled=enabled)
    assert set(status) == set(enabled)
    # none of the externals are baked in; tensorboard may or may not be
    assert not any(status[k] for k in ("wandb", "comet", "mlflow", "clearml", "dvc", "neptune"))


def test_hf_hub_save_from_pretrained_roundtrip(tmp_path):
    """The facade's HF-Hub surface (reference fork: PyTorchModelHubMixin base,
    engine/model.py:31): save_pretrained emits a loadable snapshot and
    from_pretrained reproduces the exact forward, all local (the network
    paths are probed huggingface_hub calls, untestable offline)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from edgeyolo_tpu import YOLO

    m = YOLO("yolo11n.yaml")
    m.model.init(0, imgsz=64)
    m.model.names = {0: "person"}
    out_dir = m.save_pretrained(tmp_path / "snap")
    assert (out_dir / "model.msgpack").exists() and (out_dir / "model.json").exists()
    cfg = json.loads((out_dir / "config.json").read_text())
    assert cfg["library_name"] == "edgeyolo_tpu" and cfg["task"] == "detect"
    assert "edgeyolo_tpu" in (out_dir / "README.md").read_text()

    m2 = YOLO.from_pretrained(str(out_dir))
    assert m2.task == "detect" and m2.model.names[0] == "person"
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    y1 = m.model(x, train=False)["pred"]
    y2 = m2.model(x, train=False)["pred"]
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
