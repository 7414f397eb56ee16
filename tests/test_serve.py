"""Tests for the inference HTTP server (serving subsystem)."""

import io
import json
import urllib.request

import numpy as np
import pytest

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine
from roadseg_tpu.serve import serve


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    opts = Options(num_layers=2, root_size=4, patch_size=16, stride=16,
                   batch_size=4, num_epoch=0,
                   save_path=str(tmp / "runs"), logdir=str(tmp / "logs"))
    engine = Engine(opts)
    httpd = serve(engine, host="127.0.0.1", port=0)  # ephemeral port
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, body, ctype, accept=None):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    if accept:
        req.add_header("Accept", accept)
    return urllib.request.urlopen(req, timeout=120)


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["num_layers"] == 2
    assert info["params"] > 0


def test_predict_npy_roundtrip(server):
    imgs = np.random.RandomState(0).rand(2, 48, 48, 3).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, imgs)
    with _post(f"{server}/predict", buf.getvalue(),
               "application/x-npy") as r:
        assert r.headers["Content-Type"] == "application/x-npy"
        masks = np.load(io.BytesIO(r.read()))
    assert masks.shape == (2, 48, 48, 1)
    assert (masks >= 0).all() and (masks <= 1).all()


def test_predict_png_roundtrip(server):
    from PIL import Image
    rng = np.random.RandomState(1)
    img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    with _post(f"{server}/predict", buf.getvalue(), "image/png") as r:
        assert r.headers["Content-Type"] == "image/png"
        mask = np.asarray(Image.open(io.BytesIO(r.read())))
    assert mask.shape == (48, 48)


def test_predict_quantized_is_binary_blocks(server):
    imgs = np.random.RandomState(2).rand(1, 48, 48, 3).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, imgs)
    with _post(f"{server}/predict?quantize=1", buf.getvalue(),
               "application/x-npy") as r:
        masks = np.load(io.BytesIO(r.read()))
    assert set(np.unique(masks)).issubset({0.0, 1.0})
    # constant within every 16x16 block
    blocks = masks[0, :, :, 0].reshape(3, 16, 3, 16)
    assert (blocks == blocks[:, :1, :, :1]).all()


def test_png_accept_with_batch_is_400(server):
    imgs = np.random.RandomState(5).rand(2, 48, 48, 3).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, imgs)
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(f"{server}/predict", buf.getvalue(), "application/x-npy",
              accept="image/png")
    assert exc.value.code == 400
    assert "single image" in json.loads(exc.value.read())["error"]


def test_parse_cli_applies_preset():
    from roadseg_tpu.serve import parse_cli
    opts, _, _, _ = parse_cli(["--preset", "mango", "--port", "9000"])
    # mango = the report's best config: 6-layer dilated, no dropout
    assert opts.num_layers == 6 and opts.dilated_layers
    assert opts.dropout == 1.0


def test_parse_cli_flags():
    from roadseg_tpu.serve import parse_cli
    opts, host, port, warmup = parse_cli([
        "--num_layers=6", "--dilated_layers", "--patch_size=388",
        "--stride=110", "--ensemble_prediction", "--restore_model",
        "--rotation_angles=0,45", "--host", "0.0.0.0", "--port", "9000",
        "--warmup_size", "608"])
    assert (host, port, warmup) == ("0.0.0.0", 9000, 608)
    assert opts.num_layers == 6 and opts.dilated_layers
    assert opts.ensemble_prediction and opts.restore_model
    assert opts.rotation_angles == [0, 45]


def test_bad_request_is_400(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(f"{server}/predict", b"garbage", "text/plain")
    assert exc.value.code == 400
    assert "error" in json.loads(exc.value.read())
