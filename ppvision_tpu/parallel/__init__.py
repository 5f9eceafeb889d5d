"""Device-mesh parallelism: mesh construction and sharding rules."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
