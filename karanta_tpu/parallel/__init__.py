from karanta_tpu.parallel.mesh import MeshConfig, create_mesh, local_mesh  # noqa: F401
from karanta_tpu.parallel.sharding import (  # noqa: F401
    LogicalAxisRules,
    DEFAULT_RULES,
    logical_to_named_sharding,
    shard_pytree,
)
