from roadseg_tpu.train.optim import (  # noqa: F401
    learning_rate_schedule, make_optimizer)
