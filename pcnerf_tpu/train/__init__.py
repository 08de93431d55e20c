from pcnerf_tpu.train.system import (  # noqa: F401
    TrainState,
    init_train_state,
    lr_at_epoch,
    make_train_step,
    make_val_step,
)
