from pct.parallel.mesh import (
    make_mesh,
    shard_params,
    shard_batch,
    replicated,
    param_spec,
)
from pct.parallel.infer import ShardedFrameDecoder, ShardedFrameEncoder

__all__ = [
    "make_mesh",
    "shard_params",
    "shard_batch",
    "replicated",
    "param_spec",
    "ShardedFrameEncoder",
    "ShardedFrameDecoder",
]
