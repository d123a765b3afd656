from .mesh import (
    get_mesh,
    data_sharding,
    replicated_sharding,
    local_batch_size,
    cpu_mesh_env,
    initialize_runtime,
    DATA_AXIS,
    MODEL_AXIS,
)

__all__ = [
    "get_mesh",
    "data_sharding",
    "replicated_sharding",
    "local_batch_size",
    "cpu_mesh_env",
    "initialize_runtime",
    "DATA_AXIS",
    "MODEL_AXIS",
]
