from pct.sparse.coords import (
    COORD_BIAS,
    pack_keys,
    lex_argsort,
    lex_sort_coords,
    searchsorted_coords,
    find_coords,
    mark_first_occurrences,
)
from pct.sparse.block import SparseBlock, canonicalize, features_at_coordinates, bucket_size
from pct.sparse.voxelize import voxelize_points, devoxelize

__all__ = [
    "COORD_BIAS",
    "pack_keys",
    "lex_argsort",
    "lex_sort_coords",
    "searchsorted_coords",
    "find_coords",
    "mark_first_occurrences",
    "SparseBlock",
    "canonicalize",
    "features_at_coordinates",
    "bucket_size",
    "voxelize_points",
    "devoxelize",
]
