"""Triton Inference Server client (KServe v2 HTTP protocol, stdlib-only).

Behavioral spec: ultralytics/utils/triton.py (TritonRemoteModel, 93 LoC) —
wraps a served model behind `__call__(*inputs) -> outputs` so AutoBackend can
treat `http://host/model` like a local module. The reference uses
tritonclient; that package is not in this image, so the HTTP v2 protocol
(`/v2/models/{name}`, binary tensor payloads) is spoken directly over
urllib. Construction parses the URL eagerly; the first network touch happens
at `__call__`/`load_metadata`, so offline tests can cover URL parsing.
"""

from __future__ import annotations

import json
from urllib.parse import urlsplit

import numpy as np

_DTYPES = {
    "FP32": np.float32, "FP16": np.float16, "BF16": np.float32,
    "INT32": np.int32, "INT64": np.int64, "UINT8": np.uint8, "BOOL": np.bool_,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items() if k != "BF16"}


class TritonRemoteModel:
    """Callable proxy for one model on a Triton server."""

    def __init__(self, url: str, endpoint: str = "", scheme: str = ""):
        if not endpoint and not scheme:  # fully-qualified: scheme://host/endpoint
            parts = urlsplit(url)
            self.url = parts.netloc
            self.endpoint = parts.path.strip("/").split("/")[0]
            self.scheme = parts.scheme or "http"
        else:
            self.url = url
            self.endpoint = endpoint
            self.scheme = scheme or "http"
        if self.scheme == "grpc":
            raise NotImplementedError("grpc transport requires tritonclient; use http")
        self.base = f"{self.scheme}://{self.url}/v2/models/{self.endpoint}"
        self.metadata = None
        self.input_names: list[str] = []
        self.input_dtypes: list[str] = []
        self.output_names: list[str] = []

    def load_metadata(self):
        """Fetch input/output names+dtypes from the server (network)."""
        import urllib.request

        with urllib.request.urlopen(self.base, timeout=10) as r:  # pragma: no cover
            self.metadata = json.loads(r.read())
        self.input_names = [i["name"] for i in self.metadata["inputs"]]
        self.input_dtypes = [i["datatype"] for i in self.metadata["inputs"]]
        self.output_names = [o["name"] for o in self.metadata["outputs"]]

    def __call__(self, *inputs: np.ndarray) -> list[np.ndarray]:
        """Run inference via the v2 binary-tensor HTTP protocol."""
        import urllib.request

        if self.metadata is None:
            self.load_metadata()
        head = {"inputs": [], "outputs": [{"name": n, "parameters": {"binary_data": True}} for n in self.output_names]}
        blob = b""
        for name, dt, x in zip(self.input_names, self.input_dtypes, inputs):
            x = np.ascontiguousarray(x, dtype=_DTYPES[dt])
            head["inputs"].append({
                "name": name, "shape": list(x.shape), "datatype": dt,
                "parameters": {"binary_data_size": x.nbytes},
            })
            blob += x.tobytes()
        hj = json.dumps(head).encode()
        req = urllib.request.Request(
            f"{self.base}/infer", data=hj + blob,
            headers={"Inference-Header-Content-Length": str(len(hj)),
                     "Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=60) as r:  # pragma: no cover
            hlen = int(r.headers["Inference-Header-Content-Length"])
            raw = r.read()
        resp = json.loads(raw[:hlen])
        body = raw[hlen:]
        outs, off = [], 0
        for o in resp["outputs"]:
            n = o["parameters"]["binary_data_size"]
            arr = np.frombuffer(body[off:off + n], dtype=_DTYPES[o["datatype"]]).reshape(o["shape"])
            outs.append(arr)
            off += n
        return outs
