"""Flag-surface parity: the 25 reference flags, names/defaults/semantics
(``src/tf_aerial_images.py:15-46``)."""

import os

import pytest

from roadseg_tpu.config import Options, build_parser, options_from_args

REFERENCE_DEFAULTS = {
    "batch_size": 25,
    "dilated_layers": False,
    "dropout": 0.8,
    "ensemble_prediction": False,
    "eval_data_dir": None,
    "eval_every": 500,
    "eval_train": False,
    "gpu": -1,
    "image_augmentation": False,
    "interactive": False,
    "logdir": os.path.abspath("./logdir"),
    "lr": 0.01,
    "model_path": None,
    "momentum": 0.9,
    "num_epoch": 5,
    "num_eval_images": 4,
    "num_gpu": 1,
    "num_layers": 5,
    "patch_size": 128,
    "pred_batch_size": 2,
    "restore_date": None,
    "restore_epoch": None,
    "restore_model": False,
    "root_size": 64,
    "rotation_angles": None,
    "save_path": os.path.abspath("./runs"),
    "seed": 2017,
    "stride": 16,
    "train_data_dir": os.path.abspath("./data/training"),
    "train_score_every": 1000,
}


def test_all_25_reference_flags_with_identical_defaults():
    opts = Options()
    for flag, want in REFERENCE_DEFAULTS.items():
        assert getattr(opts, flag) == want, flag
    # 30 DEFINE_* calls at tf_aerial_images.py:15-46 (SURVEY §2.15 says
    # "25" but the actual count is 30)
    assert len(REFERENCE_DEFAULTS) == 30


def test_parser_exposes_every_flag():
    parser = build_parser()
    known = {a.dest for a in parser._actions}
    missing = set(REFERENCE_DEFAULTS) - known
    assert not missing, missing


def test_rotation_angles_csv_parse():
    o = options_from_args(["--rotation_angles=15,30,45"])
    assert o.rotation_angles == [15, 30, 45]
    assert options_from_args([]).rotation_angles is None


@pytest.mark.parametrize("form", [["--dilated_layers"],
                                  ["--dilated_layers=true"],
                                  ["--dilated_layers", "1"]])
def test_boolean_flag_forms(form):
    assert options_from_args(form).dilated_layers is True


def test_boolean_false_form():
    assert options_from_args(
        ["--dilated_layers=false"]).dilated_layers is False
