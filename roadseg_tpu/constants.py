"""Global constants shared across the pipeline.

Same public surface as the reference ``src/constants.py:1-5``.
"""

# A 16x16 patch whose mean road-pixel ratio exceeds this threshold is
# labelled "road" for the Kaggle submission.
FOREGROUND_THRESHOLD = 0.25

# Kaggle evaluates at this patch granularity.
IMG_PATCH_SIZE = 16

# RGB input images.
NUM_CHANNELS = 3

# Binary segmentation: road / background.
NUM_LABELS = 2

# Input PNGs are 8-bit.
PIXEL_DEPTH = 255
