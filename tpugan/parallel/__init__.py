from tpugan.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_train_state,
)
from tpugan.parallel.fsdp import (  # noqa: F401
    batch_sharding_2d,
    make_mesh_2d,
    shard_params_fsdp,
    shard_train_state_fsdp,
)
from tpugan.parallel.inference import ShardedSampler  # noqa: F401
