from .mesh import (  # noqa: F401
    data_parallel_step,
    make_mesh,
    replicate,
    shard_batch,
)
from .sampler import HostShardSampler  # noqa: F401
