from .mesh import make_mesh, shard_window, shard_state, replicate, batch_sharding
from .eval import (
    EVAL_EVENT_AXIS,
    make_eval_mesh,
    shard_eval_batch,
    shard_eval_window,
    shard_val_state,
)
from .event import (
    EVENT_AXIS,
    make_event_mesh,
    make_event_parallel_train_step,
    shard_state_2d,
    shard_window_2d,
)
from .multihost import (
    exchange_flags,
    globalize_state,
    globalize_window,
    init_distributed,
    local_lane_range,
    make_multihost_event_mesh,
)

__all__ = [
    "EVAL_EVENT_AXIS",
    "make_eval_mesh",
    "shard_eval_batch",
    "shard_eval_window",
    "shard_val_state",
    "EVENT_AXIS",
    "make_event_mesh",
    "make_event_parallel_train_step",
    "shard_state_2d",
    "shard_window_2d",
    "make_mesh",
    "shard_window",
    "shard_state",
    "replicate",
    "batch_sharding",
    "exchange_flags",
    "globalize_state",
    "globalize_window",
    "init_distributed",
    "local_lane_range",
    "make_multihost_event_mesh",
]
