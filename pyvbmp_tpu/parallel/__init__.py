from .api import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_update,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_update"]
