"""Engine tests: train/predict/checkpoint round trips on the 8-device
CPU mesh (see conftest.py). Model shapes are tiny; semantics are real."""

import jax
import numpy as np
import pytest

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine


def tiny_opts(tmp_path, **kw):
    base = dict(
        num_layers=2, root_size=8, patch_size=36, stride=16, batch_size=8,
        num_epoch=1, eval_every=0, train_score_every=0, seed=3,
        logdir=str(tmp_path / "logs"), save_path=str(tmp_path / "runs"))
    base.update(kw)
    return Options(**base)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 100, 100, 3).astype(np.float32)
    gt = (rng.rand(4, 100, 100) > 0.5).astype(np.float32)
    return imgs, gt


def test_train_epoch_reduces_loss(tmp_path, data):
    imgs, gt = data
    opts = tiny_opts(tmp_path, lr=0.05)
    eng = Engine(opts)
    eng.prepare_training_data(imgs, gt, rotation_angles=[0])
    losses = []
    orig_drain = eng._drain_one

    def capture(num_errors, total):
        step, metrics, _ = eng._pending[0]
        losses.append(float(jax.device_get(metrics["loss"])))
        return orig_drain(num_errors, total)
    eng._drain_one = capture

    # 4 imgs x 5x5 grid = 100 patches; batches at offsets 0..88 -> 12 steps
    for _ in range(3):
        eng.train(imgs, gt)
    assert int(jax.device_get(eng.state["step"])) == 3 * 12
    # loss should drop vs the start (loose check; tiny model/noise data)
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) + 0.05


def test_train_with_augmentation_and_dropout(tmp_path, data):
    imgs, gt = data
    opts = tiny_opts(tmp_path, image_augmentation=True, dropout=0.8)
    eng = Engine(opts)
    eng.prepare_training_data(imgs, gt, rotation_angles=[0, 30])
    eng.train(imgs, gt)
    assert int(jax.device_get(eng.state["step"])) > 0


def test_predict_shapes_and_range(tmp_path, data):
    imgs, _ = data
    eng = Engine(tiny_opts(tmp_path))
    masks = np.asarray(eng.predict(imgs[:2]))
    assert masks.shape == (2, 100, 100, 1)
    assert masks.min() >= 0.0 and masks.max() <= 1.0


def test_predict_ensemble_symmetry(tmp_path, data):
    """TTA-averaged prediction of a flipped image equals the flipped
    prediction of the original (the 6-variant group is closed under
    flips), up to float tolerance."""
    imgs, _ = data
    eng = Engine(tiny_opts(tmp_path, ensemble_prediction=True))
    m1 = np.asarray(eng.predict(imgs[:1]))
    m2 = np.asarray(eng.predict(np.flip(imgs[:1], axis=2).copy()))
    np.testing.assert_allclose(m1, np.flip(m2, axis=2), atol=2e-2)


def test_predict_batchwise_matches_predict(tmp_path, data):
    imgs, _ = data
    eng = Engine(tiny_opts(tmp_path))
    full = np.asarray(eng.predict(imgs))
    chunked = eng.predict_batchwise(imgs, 2)
    np.testing.assert_allclose(full, chunked, atol=1e-5)


def test_checkpoint_roundtrip_and_resolution(tmp_path, data):
    imgs, gt = data
    opts = tiny_opts(tmp_path)
    eng = Engine(opts)
    eng.prepare_training_data(imgs, gt, rotation_angles=[0])
    eng.train(imgs, gt)
    before = np.asarray(eng.predict(imgs[:1]))
    eng.save(0)
    eng.train(imgs, gt)
    eng.save(1)
    after = np.asarray(eng.predict(imgs[:1]))

    # restore epoch 0 -> predictions revert
    eng.restore(epoch=0)
    np.testing.assert_allclose(np.asarray(eng.predict(imgs[:1])), before,
                               atol=1e-6)
    # newest-epoch resolution (epoch=None) -> epoch 1
    eng.restore()
    np.testing.assert_allclose(np.asarray(eng.predict(imgs[:1])), after,
                               atol=1e-6)
    # restore into a FRESH engine (different init) by date dir
    eng2 = Engine(Options(**{**opts.__dict__, "seed": 99}),
                  experiment_name="other")
    eng2._checkpointer.save_path = eng._checkpointer.save_path
    eng2.restore(date=eng.experiment_name, epoch=0)
    np.testing.assert_allclose(np.asarray(eng2.predict(imgs[:1])), before,
                               atol=1e-6)
    assert eng2._global_step == int(np.asarray(eng2.state["step"]))


def test_tensor_parallel_mesh_matches_data_parallel(tmp_path, data):
    """data=4,model=2 TP run produces the same predictions as pure DP."""
    from roadseg_tpu.parallel.mesh import make_mesh
    imgs, _ = data
    opts_dp = tiny_opts(tmp_path, num_layers=3, root_size=128, batch_size=8)
    eng_dp = Engine(opts_dp)
    opts_tp = tiny_opts(tmp_path, num_layers=3, root_size=128, batch_size=8,
                        mesh="data=4,model=2")
    eng_tp = Engine(opts_tp, mesh=make_mesh("data=4,model=2"))
    # same seed -> same init params
    m_dp = np.asarray(eng_dp.predict(imgs[:2]))
    m_tp = np.asarray(eng_tp.predict(imgs[:2]))
    np.testing.assert_allclose(m_dp, m_tp, atol=5e-3)
