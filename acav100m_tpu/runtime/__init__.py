from .mesh import (
    get_mesh,
    data_sharding,
    replicated_sharding,
    local_batch_size,
    host_device_count,
    initialize_runtime,
)

__all__ = [
    "get_mesh",
    "data_sharding",
    "replicated_sharding",
    "local_batch_size",
    "host_device_count",
    "initialize_runtime",
]
