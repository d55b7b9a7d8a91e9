from .mesh import (
    DATA_AXIS,
    SPACE_AXIS,
    image_spec,
    trace_mesh,
    unshard_space,
    make_mesh,
    replicated,
    batch_sharded,
    shard_batch,
    shard_inference,
    shard_train_step,
    sync_batch_stats,
)
