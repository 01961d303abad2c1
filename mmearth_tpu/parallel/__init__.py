from .mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    init_distributed,
    place_state,
    replicated,
    shard_batch,
    shard_params,
)
