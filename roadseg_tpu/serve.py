"""Minimal inference server — beyond-parity serving subsystem.

The reference stops at a batch script (``run.py``); for deployment we also
provide a small HTTP server that loads a checkpoint once, keeps the jitted
sliding-window/TTA program warm, and serves mask predictions.

Stdlib-only (``http.server``): no web framework dependency. Single-model,
single-device-group serving; request bodies and responses are PNG images or
raw ``.npy`` tensors. Concurrency model: the TPU program runs under a lock
(XLA programs are not reentrant from Python threads); decode/encode runs
outside it, so PNG IO of one request overlaps device compute of another.

Endpoints:
  GET  /healthz          -> {"status": "ok", ...model config...}
  POST /predict          -> probability mask; body = PNG (1 image) or .npy
                            [N, H, W, 3] float; Accept: image/png or
                            application/x-npy (matches the body by default)

Input contract (breaking change vs the first revision): ``.npy`` bodies
must be either uint8 (0-255, rescaled server-side) or float already
normalized to [0, 1]. Float 0-255 data is *rejected* with a 400 — the old
``max() > 1.5`` auto-rescale heuristic silently corrupted legitimately
pre-normalized inputs and is gone. Clients sending float pixel data must
divide by 255 themselves (or send uint8).
  POST /predict?quantize=1 -> Kaggle-quantized binary mask (16x16 blocks)

Run: ``python -m roadseg_tpu.serve --port 8642 --restore_model ...``
(same flag surface as the CLI, plus --host/--port).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE


def _decode_body(body: bytes, content_type: str) -> tuple[np.ndarray, str]:
    """Returns (imgs [N, H, W, 3] float32 in [0,1], response format)."""
    if content_type.startswith("image/png") or body[:8] == b"\x89PNG\r\n\x1a\n":
        from PIL import Image
        img = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"),
                         dtype=np.float32) / 255.0
        return img[None], "png"
    if body[:6] == b"\x93NUMPY" or "npy" in content_type:
        arr = np.load(io.BytesIO(body), allow_pickle=False)
        is_uint8 = arr.dtype == np.uint8
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.ndim != 4 or arr.shape[-1] != 3:
            raise ValueError(f"expected [N, H, W, 3], got {arr.shape}")
        # only integer pixel data is rescaled; float inputs must already be
        # normalized — guessing from the value range would silently corrupt
        # legitimately pre-normalized data
        if is_uint8:
            arr = arr / 255.0
        elif arr.min() < 0.0 or arr.max() > 1.0:
            raise ValueError(
                "float npy input must be normalized to [0, 1] "
                f"(got range [{arr.min():.3g}, {arr.max():.3g}]); "
                "send uint8 for 0-255 pixel data")
        return arr, "npy"
    raise ValueError(f"unsupported content type {content_type!r}")


def _encode_masks(masks: np.ndarray, fmt: str) -> tuple[bytes, str]:
    if fmt == "npy":
        buf = io.BytesIO()
        np.save(buf, masks)
        return buf.getvalue(), "application/x-npy"
    if masks.shape[0] != 1:
        raise ValueError(
            f"PNG response supports a single image, got {masks.shape[0]}; "
            "request Accept: application/x-npy for batches")
    from PIL import Image
    img = (np.clip(masks[0, ..., 0], 0, 1) * 255).round().astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, format="PNG")
    return buf.getvalue(), "image/png"


class ModelRunner:
    """Thread-safe wrapper around ``Engine.predict`` for serving."""

    def __init__(self, engine):
        self.engine = engine
        self._lock = threading.Lock()
        self.requests_served = 0

    def info(self) -> dict:
        opts = self.engine._options
        return {
            "status": "ok",
            "num_layers": opts.num_layers,
            "root_size": opts.root_size,
            "dilated_layers": opts.dilated_layers,
            "patch_size": opts.patch_size,
            "stride": opts.stride,
            "ensemble_prediction": opts.ensemble_prediction,
            "params": self.engine.num_params,
            "requests_served": self.requests_served,
        }

    def predict(self, imgs: np.ndarray, quantize: bool) -> np.ndarray:
        h = imgs.shape[1]
        if imgs.shape[2] != h:
            raise ValueError("images must be square")
        with self._lock:
            masks = np.asarray(self.engine.predict(imgs))
            self.requests_served += imgs.shape[0]
        if quantize:
            from roadseg_tpu.ops import geometry
            masks = np.asarray(geometry.quantize_mask(
                masks, threshold=FOREGROUND_THRESHOLD,
                patch_size=IMG_PATCH_SIZE))
        return masks

    def warmup(self, image_size: int, n: int = 1):
        """Pre-compile the predict program for the expected request shape."""
        dummy = np.zeros((n, image_size, image_size, 3), np.float32)
        self.predict(dummy, quantize=False)


def make_handler(runner: ModelRunner):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._send(200, json.dumps(runner.info()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                imgs, fmt = _decode_body(
                    body, self.headers.get("Content-Type", ""))
                accept = self.headers.get("Accept", "")
                if "png" in accept:
                    fmt = "png"
                elif "npy" in accept:
                    fmt = "npy"
            except Exception as e:  # bad input -> client error
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")
                return
            try:
                q = parse_qs(url.query).get("quantize", ["0"])[0] == "1"
                masks = runner.predict(imgs, quantize=q)
                payload, ctype = _encode_masks(masks, fmt)
                self._send(200, payload, ctype)
            except ValueError as e:  # shape/format problems = client error
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")
            except Exception:  # noqa: BLE001 — server fault, don't leak
                import traceback
                traceback.print_exc()
                self._send(500, json.dumps(
                    {"error": "internal error"}).encode(),
                    "application/json")

    return Handler


def serve(engine, host: str = "127.0.0.1", port: int = 8642,
          warmup_size: int | None = None) -> ThreadingHTTPServer:
    """Start the server (non-blocking; returns the HTTPServer). Call
    ``.shutdown()`` to stop."""
    runner = ModelRunner(engine)
    if warmup_size:
        runner.warmup(warmup_size)
    httpd = ThreadingHTTPServer((host, port), make_handler(runner))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    print(f"serving on http://{host}:{httpd.server_address[1]} "
          f"({engine.num_params:,}-param model)")
    return httpd


def parse_cli(argv=None):
    """Parse the full flag surface + serving knobs.

    Returns (Options, host, port, warmup_size)."""
    from roadseg_tpu.config import (Options, apply_preset, build_parser,
                                    parse_rotation_angles)

    parser = build_parser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8642)
    parser.add_argument("--warmup_size", type=int, default=None,
                        help="pre-compile for this image size")
    ns = parser.parse_args(argv)
    host, port, warmup = ns.host, ns.port, ns.warmup_size
    for extra in ("host", "port", "warmup_size"):
        delattr(ns, extra)
    kwargs = vars(ns)
    kwargs["rotation_angles"] = parse_rotation_angles(
        kwargs.get("rotation_angles"))
    kwargs = apply_preset(kwargs, kwargs.pop("preset", None), argv)
    return Options(**kwargs), host, port, warmup


def main(argv=None):
    opts, host, port, warmup = parse_cli(argv)

    from roadseg_tpu.engine import Engine
    engine = Engine(opts)
    if opts.restore_model:
        if opts.model_path:
            engine.restore(file=opts.model_path)
        else:
            engine.restore(date=opts.restore_date, epoch=opts.restore_epoch)
    httpd = serve(engine, host, port, warmup_size=warmup)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
