"""Full-image predict mode: one valid-conv pass per (TTA variant, image).

The sliding-window pipeline (reference ``tf_aerial_images.py:271-328``)
is the parity path; ``Options.full_image`` replaces it with a single
fully-convolutional pass (mirror-pad to the admissible input size, crop
the output ring). These tests pin:

  * the admissible-size search (608 @6 layers -> output 612 / input 988),
  * exact equivalence of the no-TTA full-image mask with a hand-built
    pad -> model.apply -> softmax -> crop pipeline,
  * exact equivalence of the 6-way-TTA mask with the manual
    transform/invert average,
  * batching invariance (chunk size must not change the masks).
"""

import jax
import numpy as np
import pytest

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine
from roadseg_tpu.models import unet
from roadseg_tpu.ops import augment as augment_ops
from roadseg_tpu.ops import geometry

pytestmark = pytest.mark.slow  # full-model predict comparisons: slow tier


def tiny_opts(tmp_path, **kw):
    base = dict(
        num_layers=3, root_size=4, patch_size=36, stride=16, batch_size=2,
        num_epoch=0, eval_every=0, train_score_every=0, seed=3,
        full_image=True,
        logdir=str(tmp_path / "logs"), save_path=str(tmp_path / "runs"))
    base.update(kw)
    return Options(**base)


def test_valid_output_size():
    assert unet.valid_output_size(608, 6) == 612
    assert unet.input_size_needed(612, 6) == 988
    # already-admissible sizes are returned unchanged
    assert unet.valid_output_size(388, 6) == 388
    assert unet.valid_output_size(40, 3) == 40


def test_full_image_matches_manual_pipeline(tmp_path):
    opts = tiny_opts(tmp_path, ensemble_prediction=False)
    eng = Engine(opts)
    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 40, 40, 3).astype(np.float32)

    masks = np.asarray(eng.predict(imgs))
    assert masks.shape == (2, 40, 40, 1)

    out_size = unet.valid_output_size(40, 3)           # 40
    in_size = unet.input_size_needed(out_size, 3)      # 80
    offset = (in_size - 40) // 2
    ext = np.asarray(geometry.mirror_border(imgs, offset))
    logits = eng.model.apply(eng.state["params"], ext, deterministic=True)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[..., 1]
    crop = (out_size - 40) // 2
    expect = probs[:, crop:crop + 40, crop:crop + 40, None]
    np.testing.assert_allclose(masks, expect, rtol=0, atol=1e-6)


def test_full_image_tta_matches_manual_ensemble(tmp_path):
    opts = tiny_opts(tmp_path, ensemble_prediction=True, batch_size=4)
    eng = Engine(opts)
    rng = np.random.RandomState(2)
    imgs = rng.rand(1, 40, 40, 3).astype(np.float32)

    masks = np.asarray(eng.predict(imgs))

    variants = np.asarray(augment_ops.image_augmentation_ensemble(
        jax.numpy.asarray(imgs)))
    in_size = unet.input_size_needed(40, 3)
    offset = (in_size - 40) // 2
    ext = np.asarray(geometry.mirror_border(variants, offset))
    logits = eng.model.apply(eng.state["params"], ext, deterministic=True)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[..., 1][..., None]
    expect = np.asarray(augment_ops.invert_image_augmentation_ensemble(
        jax.numpy.asarray(probs)))
    np.testing.assert_allclose(masks, expect, rtol=0, atol=1e-6)


@pytest.mark.parametrize("chunk", [1, 3, 8])
def test_full_image_chunk_invariance(tmp_path, chunk):
    opts = tiny_opts(tmp_path, ensemble_prediction=True, batch_size=chunk)
    eng = Engine(opts)
    rng = np.random.RandomState(3)
    imgs = rng.rand(2, 40, 40, 3).astype(np.float32)
    masks = np.asarray(eng.predict(imgs))

    ref_opts = tiny_opts(tmp_path, ensemble_prediction=True, batch_size=2,
                         seed=3)
    ref = Engine(ref_opts)
    np.testing.assert_allclose(
        masks, np.asarray(ref.predict(imgs)), rtol=0, atol=1e-6)


def test_full_image_close_to_sliding_window(tmp_path):
    """Same weights: the two modes must produce near-identical masks on
    interior pixels (they differ only by overlap averaging / border
    handling, not semantics)."""
    fi = Engine(tiny_opts(tmp_path, ensemble_prediction=False))
    sw_opts = tiny_opts(tmp_path, ensemble_prediction=False,
                        full_image=False, patch_size=20, stride=10,
                        batch_size=4)
    sw = Engine(sw_opts)
    # identical params (same seed/init geometry)
    sw.state["params"] = fi.state["params"]

    rng = np.random.RandomState(4)
    imgs = rng.rand(1, 40, 40, 3).astype(np.float32)
    m_fi = np.asarray(fi.predict(imgs))
    m_sw = np.asarray(sw.predict(imgs))
    # random init -> probs hover near 0.5; modes agree to float tolerance
    # on this scale because every window sees the same receptive field
    assert np.abs(m_fi - m_sw).mean() < 0.05
