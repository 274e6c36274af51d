from pct.ops.kernel_maps import kernel_offsets, build_kernel_map
from pct.ops.conv import (
    sparse_conv,
    sparse_conv_down,
    generative_conv_up,
    downsample_coords,
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
    "prune_block",
    "topk_per_batch_mask",
    "counts_per_batch",
]
