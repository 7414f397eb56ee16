from roadseg_tpu.train.optim import learning_rate_schedule, make_optimizer  # noqa: F401
from roadseg_tpu.train.engine import SegmentationEngine  # noqa: F401
