from .dp import (  # noqa: F401
    broadcast_scalar,
    gather_objects,
    gather_predictions,
    init_multihost,
    is_main_process,
    make_dp_train_step,
    make_mesh,
    process_count,
    process_index,
    replicate,
    shard_batch,
    unreplicate,
)
