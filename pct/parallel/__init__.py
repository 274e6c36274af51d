from pct.parallel.mesh import (
    make_mesh,
    shard_params,
    shard_batch,
    replicated,
    param_spec,
)

__all__ = ["make_mesh", "shard_params", "shard_batch", "replicated", "param_spec"]
