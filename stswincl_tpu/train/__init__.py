from stswincl_tpu.train.optim import (
    warmup_cosine_schedule,
    poly_schedule,
    step_schedule,
    make_adam,
    make_sgd,
    make_lars,
    scale_lr_linear,
)
from stswincl_tpu.train.train_seg import (
    SegTrainState,
    make_seg_train_step,
    make_seg_eval_step,
)
from stswincl_tpu.train.train_contrast import (
    ContrastTrainState,
    make_contrast_train_step,
    contrast_momentum,
)
