from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    fsdp_sharding_for,
    init_distributed,
    is_main_process,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
