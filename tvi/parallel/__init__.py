from tvi.parallel.mesh import (  # noqa: F401
    MeshSpec,
    create_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
