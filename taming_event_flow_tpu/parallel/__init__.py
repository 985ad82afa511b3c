from .mesh import make_mesh, shard_window, shard_state, replicate, batch_sharding

__all__ = [
    "make_mesh",
    "shard_window",
    "shard_state",
    "replicate",
    "batch_sharding",
]
