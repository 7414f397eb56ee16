from roadseg_tpu.ops import geometry, rotate, augment  # noqa: F401
