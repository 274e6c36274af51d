from pct.entropy.rans import (
    encode_with_indexes,
    decode_with_indexes,
    pmf_to_quantized_cdf,
)
from pct.entropy.tables import CdfTables
from pct.entropy.bottleneck import EntropyBottleneck
from pct.entropy.gaussian import GaussianConditional, default_scale_table
from pct.entropy.bitstream import (
    SegmentBitstream,
    pack_segment,
    unpack_segment,
)

__all__ = [
    "encode_with_indexes",
    "decode_with_indexes",
    "pmf_to_quantized_cdf",
    "CdfTables",
    "EntropyBottleneck",
    "GaussianConditional",
    "default_scale_table",
    "SegmentBitstream",
    "pack_segment",
    "unpack_segment",
]
