"""Video/stream source loaders: pluggable decoder registry (PIL animated,
MJPEG-AVI scanner, imageio), FrameStream buffering, and model.track() over a
real video file — closing the reference's LoadStreams/LoadImagesAndVideos
surface (data/loaders.py:51-284) without cv2."""

import numpy as np
import pytest
from PIL import Image


def _make_gif(path, n=5, size=64):
    rng = np.random.RandomState(0)
    frames = []
    for i in range(n):
        img = rng.randint(0, 80, (size, size, 3), np.uint8)
        x = 8 + i * 6
        img[20:44, x : x + 16] = [240, 60, 60]
        frames.append(Image.fromarray(img))
    frames[0].save(path, save_all=True, append_images=frames[1:], duration=50, loop=0)
    return path


def test_gif_decodes_through_registry(tmp_path):
    from edgeyolo_tpu.data.loaders import open_video

    gif = _make_gif(tmp_path / "clip.gif")
    frames = list(open_video(gif))
    assert len(frames) == 5
    assert frames[0].shape == (64, 64, 3) and frames[0].dtype == np.uint8


def test_load_inference_source_video_file(tmp_path):
    from edgeyolo_tpu.data.loaders import load_inference_source

    gif = _make_gif(tmp_path / "clip.gif")
    loader, st = load_inference_source(str(gif))
    out = list(loader)
    assert len(out) == 5
    assert out[0][0].endswith(":0")


def test_custom_decoder_registration(tmp_path):
    from edgeyolo_tpu.data.loaders import (
        VIDEO_DECODERS,
        open_video,
        register_video_decoder,
    )

    fake = tmp_path / "video.xyz"
    fake.write_bytes(b"fake")

    def xyz_decoder(path):
        if not str(path).endswith(".xyz"):
            return None
        return iter([np.zeros((8, 8, 3), np.uint8)] * 3)

    register_video_decoder(xyz_decoder, prepend=True)
    try:
        frames = list(open_video(fake))
        assert len(frames) == 3
    finally:
        VIDEO_DECODERS.remove(xyz_decoder)


def test_unknown_video_is_gated_cleanly(tmp_path):
    from edgeyolo_tpu.data.loaders import open_video

    bad = tmp_path / "clip.mp4"
    bad.write_bytes(b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="register_video_decoder"):
        list(open_video(bad))


def test_framestream_buffers_iterables():
    from edgeyolo_tpu.data.loaders import FrameStream

    frames = [np.full((16, 16, 3), i, np.uint8) for i in range(6)]
    fs = FrameStream(iter(frames), buffer=4)
    out = list(fs)
    assert len(out) >= 4  # ring may drop under producer pressure, never dies
    assert out[0][1].shape == (16, 16, 3)


def test_track_over_video_file(tmp_path):
    """model.track() over a decoded video: detections per frame get track ids
    (reference Model.track engine flow, model.py:562-607)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from edgeyolo_tpu import YOLO

    gif = _make_gif(tmp_path / "clip.gif", n=4, size=64)
    m = YOLO("yolo11n.yaml")
    results = list(m.track(str(gif), imgsz=64, conf=0.0, verbose=False))
    assert len(results) == 4
    for r in results:
        assert hasattr(r, "track_ids")


def _mjpeg_server(frames_jpeg, boundary=b"frame"):
    """In-process MJPEG-over-HTTP server streaming the given JPEG blobs."""
    import http.server
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type",
                             f"multipart/x-mixed-replace; boundary={boundary.decode()}")
            self.end_headers()
            for blob in frames_jpeg:
                self.wfile.write(b"--" + boundary + b"\r\n")
                self.wfile.write(b"Content-Type: image/jpeg\r\n")
                self.wfile.write(f"Content-Length: {len(blob)}\r\n\r\n".encode())
                self.wfile.write(blob + b"\r\n")

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/stream"


def _jpeg_blobs(n=3, size=(32, 24)):
    from io import BytesIO

    from PIL import Image

    blobs = []
    for i in range(n):
        buf = BytesIO()
        arr = np.full((size[1], size[0], 3), i * 40 + 10, np.uint8)
        Image.fromarray(arr).save(buf, format="JPEG")
        blobs.append(buf.getvalue())
    return blobs


def test_mjpeg_http_stream():
    """Socket-level multipart reader: reference LoadStreams network-camera
    capability (data/loaders.py:51-212) without cv2."""
    from edgeyolo_tpu.data.loaders import open_mjpeg_http

    srv, url = _mjpeg_server(_jpeg_blobs(3))
    try:
        frames = list(open_mjpeg_http(url))
    finally:
        srv.shutdown()
    assert len(frames) == 3
    assert frames[0].shape == (24, 32, 3)
    assert frames[2].mean() > frames[0].mean()  # frames arrive in order


def test_mjpeg_http_via_inference_source():
    from edgeyolo_tpu.data.loaders import load_inference_source

    srv, url = _mjpeg_server(_jpeg_blobs(2))
    try:
        loader, st = load_inference_source(url)
        assert st.stream
        got = [f for _, f in loader]
    finally:
        srv.shutdown()
    assert len(got) == 2 and got[0].shape == (24, 32, 3)


def test_mjpeg_http_rejects_non_mjpeg():
    import http.server
    import threading

    import pytest

    from edgeyolo_tpu.data.loaders import open_mjpeg_http

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"<html></html>")

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        with pytest.raises(NotImplementedError, match="MJPEG"):
            open_mjpeg_http(f"http://127.0.0.1:{srv.server_address[1]}/page")
    finally:
        srv.shutdown()


def _write_mp4(path, n=6, size=64):
    import cv2

    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 5, (size, size))
    for i in range(n):
        w.write(np.full((size, size, 3), i * 40, np.uint8))
    w.release()


def test_mp4_decodes_through_cv2_registry(tmp_path):
    """cv2 is importable in this image (round-2 'no cv2' was a false gate);
    the registry's probed cv2 decoder handles real mp4 files."""
    from edgeyolo_tpu.data.loaders import open_video

    p = tmp_path / "clip.mp4"
    _write_mp4(p)
    frames = list(open_video(p))
    assert len(frames) == 6
    assert frames[0].shape == (64, 64, 3)
    # frame 3 is the BGR->RGB converted constant 120 plate
    assert abs(int(frames[3].mean()) - 120) <= 10  # mp4v is lossy


def test_load_streams_over_file_source(tmp_path):
    """LoadStreams (reference loaders.py:51-212): daemon reader + bounded
    queue; a video file stands in for the camera so the path tests headless."""
    from edgeyolo_tpu.data.loaders import LoadStreams

    p = tmp_path / "cam.mp4"
    _write_mp4(p, n=5)
    ls = LoadStreams(str(p), buffer_size=4)
    got = list(ls)
    ls.close()
    assert 1 <= len(got) <= 5  # latest-wins dropping may shed frames
    src, frame = got[0]
    assert src == str(p) and frame.shape == (64, 64, 3)


def test_predict_streams_mp4(tmp_path):
    """End-to-end: facade predict over an mp4 through the cv2 decoder."""
    from edgeyolo_tpu import YOLO
    from edgeyolo_tpu.nn.tasks import DetectionModel

    p = tmp_path / "pred.mp4"
    _write_mp4(p, n=3)
    m = YOLO("yolo11n.yaml")
    m.model = DetectionModel("yolo11n.yaml", nc=3)
    res = m.predict(str(p), imgsz=64, conf=0.5, verbose=False)
    assert len(res) == 3


def test_vid_stride_skips_frames(tmp_path):
    """vid_stride keeps frame 0 then every stride-th frame (reference
    LoadImagesAndVideos vid_stride, predictor arg)."""
    from PIL import Image

    from edgeyolo_tpu.data.loaders import LoadVideo

    frames = [Image.fromarray(np.full((16, 16, 3), 10 * i, np.uint8)) for i in range(7)]
    p = tmp_path / "clip.gif"
    frames[0].save(p, save_all=True, append_images=frames[1:], duration=50, loop=0)
    all_f = list(LoadVideo(str(p)))
    strided = list(LoadVideo(str(p), vid_stride=3))
    assert len(all_f) == 7 and len(strided) == 3  # frames 0, 3, 6
    assert [s[0].rsplit(":", 1)[1] for s in strided] == ["0", "3", "6"]


def test_load_streams_buffered_delivers_every_frame(tmp_path):
    """stream_buffer=True (cfg key, reference loaders.py:92-161): the reader
    WAITS for the consumer instead of dropping the oldest frame, so a slow
    consumer still sees every frame exactly once and in order."""
    import time

    from edgeyolo_tpu.data.loaders import LoadStreams

    import cv2

    p = tmp_path / "cam.mp4"
    # plates i*15 (NOT _write_mp4's i*40: uint8 wraps at i>=7, breaking the
    # monotone-order check below)
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 64))
    for i in range(12):
        w.write(np.full((64, 64, 3), i * 15, np.uint8))
    w.release()
    ls = LoadStreams(str(p), buffer_size=2, buffer=True)
    got = []
    for src, frame in ls:
        got.append(int(frame.mean()))
        time.sleep(0.05)  # slower than the reader; would shed frames unbuffered
    ls.close()
    assert len(got) == 12
    assert got == sorted(got)  # in order: constant plates brighten monotonically
