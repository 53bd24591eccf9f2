from tumseg.train.loop import (  # noqa: F401
    TrainEngine,
    bn_momentum_schedule,
    fit,
    lr_schedule,
    make_optimizer,
)
