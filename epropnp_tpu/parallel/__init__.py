from .mesh import (  # noqa: F401
    data_parallel_infer,
    data_parallel_step,
    make_mesh,
    replicate,
    shard_batch,
)
from .prefetch import (  # noqa: F401
    BackgroundIterator,
    PrefetchLoader,
    prefetch_to_device,
)
from .sampler import HostShardSampler  # noqa: F401
