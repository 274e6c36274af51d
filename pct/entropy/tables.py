"""Quantized CDF table container shared by the entropy models and the coder."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CdfTables:
    """Host-side quantized CDF tables (the output of a model ``update()``).

    ``cdfs``: int32 ``[rows, max_len]`` (row r valid through ``lengths[r]``);
    ``offsets``: symbol value of table slot 0 per row. Serializable with the
    checkpoint so encoder/decoder share bit-identical tables.
    """

    cdfs: np.ndarray
    lengths: np.ndarray
    offsets: np.ndarray

    def astuple(self):
        return self.cdfs, self.lengths, self.offsets
