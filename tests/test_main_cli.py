"""End-to-end CLI orchestration test (tiny config, CPU mesh): train ->
checkpoint -> restore -> predict -> submission CSV, through
``roadseg_tpu.main`` exactly as a user would run it."""

import glob

import numpy as np
import pytest
from PIL import Image

from roadseg_tpu import main as main_mod


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    (root / "training" / "images").mkdir(parents=True)
    (root / "training" / "groundtruth").mkdir(parents=True)
    (root / "test").mkdir()
    for i in range(3):
        img = (rng.rand(100, 100, 3) * 255).astype(np.uint8)
        gt = ((rng.rand(100, 100) > 0.5) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            root / "training" / "images" / f"satImage_{i+1:03d}.png")
        Image.fromarray(gt, "L").save(
            root / "training" / "groundtruth" / f"satImage_{i+1:03d}.png")
        # test images 96x96: divisible by the 16px Kaggle blocks
        Image.fromarray(img[:96, :96]).save(
            root / "test" / f"test_{i+1:02d}.png")
    return root


@pytest.mark.slow
def test_train_then_submit(data_dir, tmp_path):
    save = tmp_path / "runs"
    common = [
        "--num_layers=2", "--root_size=8", "--patch_size=36", "--stride=16",
        "--batch_size=8", "--eval_every=0", "--train_score_every=0",
        f"--save_path={save}", f"--logdir={tmp_path / 'logs'}",
        f"--train_data_dir={data_dir / 'training'}",
    ]
    # train 1 epoch
    main_mod.main(common + ["--num_epoch=1", "--rotation_angles=0"])
    ckpts = glob.glob(str(save / "*" / "model-epoch-000.chkpt"))
    assert len(ckpts) == 1

    # restore newest + predict test dir + write submission
    main_mod.main(common + [
        "--num_epoch=0", "--restore_model", "--stride=30",
        f"--eval_data_dir={data_dir / 'test'}",
    ])
    csvs = glob.glob(str(save / "*" / "submission.csv"))
    assert len(csvs) == 1
    rows = open(csvs[0]).read().strip().split("\n")
    # 3 images of 96x96 -> 6x6 blocks of 16 => 36 rows each
    assert rows[0] == "id,prediction"
    assert len(rows) == 1 + 3 * 36
    overlays = glob.glob(str(save / "*" / "images_*.png"))
    assert len(overlays) == 3


def test_eval_train_dump(data_dir, tmp_path):
    save = tmp_path / "runs"
    out = tmp_path / "eval_out"
    main_mod.main([
        "--num_layers=2", "--root_size=8", "--patch_size=36", "--stride=32",
        "--batch_size=4", "--num_epoch=0", "--eval_train",
        f"--eval_data_dir={out}", f"--save_path={save}",
        f"--logdir={tmp_path / 'logs2'}",
        f"--train_data_dir={data_dir / 'training'}",
    ])
    for pat in ("eval_binary_pred_*.png", "eval_probability_pred_*.png",
                "eval_overlays_pred_*.png", "eval_confusion_*.png",
                "eval_orror_*.png"):
        assert len(glob.glob(str(out / pat))) == 3, pat
