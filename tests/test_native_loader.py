"""Native C++ PNG batch loader: bit-parity with PIL and error paths."""

import numpy as np
import pytest
from PIL import Image

from roadseg_tpu.utils import images_io, native_loader


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        arr = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        p = root / f"img_{i:02d}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def test_native_available():
    assert native_loader.available(), "libroadseg_io.so should build"


def test_bit_parity_with_pil(pngs):
    batch = native_loader.load_png_batch(pngs)
    pil = np.stack([np.asarray(Image.open(p)) for p in pngs])
    assert batch.shape == (4, 40, 40, 3)
    np.testing.assert_array_equal(batch, pil)


def test_grayscale(tmp_path):
    arr = (np.random.RandomState(1).rand(16, 16) * 255).astype(np.uint8)
    p = tmp_path / "g.png"
    Image.fromarray(arr, "L").save(p)
    got = native_loader.load_png_batch([str(p)])
    assert got.shape == (1, 16, 16)
    np.testing.assert_array_equal(got[0], arr)


def test_shape_mismatch_raises(pngs, tmp_path):
    arr = np.zeros((8, 8, 3), np.uint8)
    odd = tmp_path / "odd.png"
    Image.fromarray(arr).save(odd)
    with pytest.raises(RuntimeError, match="shape mismatch"):
        native_loader.load_png_batch([pngs[0], str(odd)])


def test_images_io_load_uses_native(pngs, tmp_path, monkeypatch):
    import os
    d = os.path.dirname(pngs[0])
    out = images_io.load(d)
    assert out.shape == (4, 40, 40, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
