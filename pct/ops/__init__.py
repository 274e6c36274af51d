from pct.ops.kernel_maps import (
    kernel_offsets,
    build_kernel_map,
    derive_child_self_kmap,
)
from pct.ops.conv import (
    sparse_conv,
    sparse_conv_down,
    generative_conv_up,
    downsample_coords,
    down_plan,
    prune_block,
)
from pct.ops.topk import topk_per_batch_mask, counts_per_batch

__all__ = [
    "kernel_offsets",
    "build_kernel_map",
    "sparse_conv",
    "sparse_conv_down",
    "generative_conv_up",
    "downsample_coords",
    "down_plan",
    "derive_child_self_kmap",
    "prune_block",
    "topk_per_batch_mask",
    "counts_per_batch",
]
