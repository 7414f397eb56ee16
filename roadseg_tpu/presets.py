"""Named experiment presets from the reference report's results table
(``report/report.tex:256-271``): the six U-Net configurations the authors
trained and scored on Kaggle, as ready-made ``Options``.

| preset  | layers | augmentation                  | Kaggle F1 |
|---------|--------|-------------------------------|-----------|
| vanilla | 5      | none                          | 0.926     |
| kiwi    | 5      | offline 45-deg rotations      | 0.932     |
| apple   | 5      | offline multi-rotation        | 0.935     |
| guava   | 5      | stochastic + ensemble pred    | 0.935     |
| lime    | 6      | stochastic + ensemble pred    | 0.936     |
| mango   | 6      | + dilated convs, no dropout   | 0.939     |

All share patch 388 / stride 12 / root 64 / lr 0.01 / momentum 0.9
(the reference README training command).
"""

from __future__ import annotations


from roadseg_tpu.config import Options

_BASE = dict(patch_size=388, stride=12, root_size=64, lr=0.01,
             momentum=0.9, batch_size=1, dropout=0.8)

PRESETS = {
    "vanilla": dict(_BASE, num_layers=5, rotation_angles=[0]),
    "kiwi": dict(_BASE, num_layers=5, rotation_angles=[0, 45]),
    "apple": dict(_BASE, num_layers=5,
                  rotation_angles=[0, 15, 30, 45, 60, 75, 90]),
    "guava": dict(_BASE, num_layers=5,
                  rotation_angles=[0, 15, 30, 45, 60, 75, 90],
                  image_augmentation=True, ensemble_prediction=True),
    "lime": dict(_BASE, num_layers=6,
                 rotation_angles=[0, 15, 30, 45, 60, 75, 90],
                 image_augmentation=True, ensemble_prediction=True),
    "mango": dict(_BASE, num_layers=6, dilated_layers=True, dropout=1.0,
                  rotation_angles=[0, 15, 30, 45, 60, 75, 90],
                  image_augmentation=True, ensemble_prediction=True),
}

# Kaggle F1 scores from the report table, for reference.
REPORT_F1 = {"vanilla": 0.926, "kiwi": 0.932, "apple": 0.935,
             "guava": 0.935, "lime": 0.936, "mango": 0.939}


def preset(name: str, **overrides) -> Options:
    """Build Options for a named preset, with keyword overrides."""
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; "
                       f"choose from {sorted(PRESETS)}")
    cfg = dict(PRESETS[name])
    cfg.update(overrides)
    return Options(**cfg)


def list_presets():
    return sorted(PRESETS)
