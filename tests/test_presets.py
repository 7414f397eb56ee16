"""Named report presets build valid configs (report/report.tex:256-271)."""

import pytest

from roadseg_tpu.models.unet import input_size_needed
from roadseg_tpu.presets import PRESETS, REPORT_F1, list_presets, preset


def test_all_presets_build_and_are_valid():
    for name in list_presets():
        o = preset(name)
        # size arithmetic must be valid for every preset
        size = input_size_needed(o.patch_size, o.num_layers)
        assert size in (572, 764)
        assert (400 - o.patch_size) % o.stride == 0


def test_mango_is_flagship():
    o = preset("mango")
    assert o.num_layers == 6 and o.dilated_layers and o.dropout == 1.0
    assert o.ensemble_prediction and o.image_augmentation
    assert REPORT_F1["mango"] == max(REPORT_F1.values())


def test_overrides_and_unknown():
    assert preset("vanilla", batch_size=8).batch_size == 8
    with pytest.raises(KeyError):
        preset("durian")


def test_presets_cover_report_table():
    assert set(PRESETS) == set(REPORT_F1)


def test_cli_preset_flag():
    from roadseg_tpu.config import options_from_args
    o = options_from_args(["--preset=mango"])
    assert o.num_layers == 6 and o.dilated_layers and o.patch_size == 388
    # explicit flag overrides the preset
    o = options_from_args(["--preset=mango", "--batch_size=8",
                           "--num_layers=5"])
    assert o.batch_size == 8 and o.num_layers == 5 and o.dilated_layers
