from .train_unet import (  # noqa: F401
    TrainConfig,
    TrainState,
    batch_shardings,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    shard_train_state,
)
