"""Segment bitstream container — the reference's batched wire format (§2.4).

Layout (written by reference ``codec_pipeline.py:464-517``, read by
``codec_parallel.py:173-216``), one blob per quality level:

    [num_frames: int32][q_g: float64][q_a: float64]
    [y_shape: int32][z_shape: int32][len(y_string): int32][len(z_string): int32]
    [y_string: bytes][z_string: bytes]
    repeat num_frames times:
      [len(gpcc_i): int32][k1_i: int32][k2_i: int32][k3_i: int32][gpcc_i: bytes]

The reference assembled this through a char-'0'/'1' BitStream (its slowest
encoder step, E7 ≈ 0.19 s); here it is direct little-endian struct packing —
microseconds, byte-compatible field order.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Sequence


@dataclasses.dataclass
class SegmentBitstream:
    """One quality level's compressed GOP."""

    q_g: float
    q_a: float
    y_shape: int  # total latent rows in the batched y tensor
    z_shape: int  # total hyper-latent rows
    y_string: bytes
    z_string: bytes
    # per frame:
    gpcc_strings: list[bytes]
    ks: list[tuple[int, int, int]]  # (k1, k2, k3) occupancy counts per frame
    # "latent": gpcc strings code the stride-8 latent coords / 8 (the
    # reference's scheme); "lossless": they code the full-resolution voxel
    # set — the decoder derives the whole coordinate pyramid exactly and
    # synthesis needs no occupancy prediction. Signaled on the wire by the
    # sign of the num_frames field (negative = lossless) so latent-mode
    # bytes are unchanged (golden-pinned). "guided": latent-mode layout
    # plus an "OC1" tail of per-level occupancy strings — every candidate
    # child's true occupancy bit, entropy-coded under the synthesis head's
    # predicted probability (pct/entropy/binary.py); decoded geometry is
    # exact, like "lossless", at the model-priced rate.
    geometry_mode: str = "latent"
    # Guided-occupancy streams, one per synthesis level (coarse -> fine);
    # non-empty list <=> geometry_mode == "guided".
    occ_strings: list[bytes] = dataclasses.field(default_factory=list)
    # "OC2" streams carry a per-segment empirical calibration header (64
    # uint16 bin probabilities) ahead of each level's rANS payload
    # (pct/entropy/binary.py::compress_calibrated); "OC1" streams code under
    # the static bin-center sigmoids. The decoder accepts all tags
    # (published OC1/OC2 media keeps decoding).
    occ_calibrated: bool = True
    # "OC3" (round 5): calibrated like OC2, but candidates are enumerated in
    # CANDIDATE-INDEX order (parent-row-major over the previous level's
    # sort-free compaction) and the coding logits come from the FAMILY-form
    # pyramid (pct/pipeline/serial.py::_guided_step_fam_core) — the format
    # bump that deletes the legacy contract's per-level 8n canonical sorts
    # and the child-grid conv gathers (PERF.md round 5). The profile is
    # pinned by the tag: an OC3 stream decodes through the family pyramid on
    # any backend; OC1/OC2 always decode through the legacy pyramid.
    occ_family: bool = False
    # Optional color-residual stream (any geometry mode): quantized
    # (target - predicted) colors, rANS-coded with the Gaussian-conditional
    # tables at the shipped per-channel scale indexes. ``color_step`` is the
    # quantization step in 1/255 units (0 = absent). Appended as a tagged
    # tail, so streams without it are byte-identical to round-2. "CR2"
    # (``color_transform``) codes the residuals in the orthonormal opponent
    # color basis (pct/entropy/colorres.py) — decorrelated channels cost
    # less under the per-channel Gaussian scales at identical RGB MSE; "CR1"
    # (round-3 streams) codes raw RGB residuals and still decodes.
    color_step: int = 0
    color_scale_idx: tuple[int, ...] = ()
    color_string: bytes = b""
    color_transform: bool = True

    @property
    def num_frames(self) -> int:
        return len(self.gpcc_strings)

    def num_bytes(self) -> int:
        return len(self.pack())

    def pack(self) -> bytes:
        out = bytearray()
        # Only "lossless" flips the num_frames sign. "guided" keeps the
        # latent sign: its gpcc strings ARE the latent skeleton, so a blob
        # whose OC1 tail is truncated/corrupted degrades to a valid latent
        # top-k decode instead of silently mis-decoding the stride-8
        # skeleton as the full-resolution voxel set (ADVICE r3). Old guided
        # blobs (negative nf + OC1) still unpack: the OC1 tag flips the
        # mode regardless of the sign.
        nf = -self.num_frames if self.geometry_mode == "lossless" else self.num_frames
        out += struct.pack("<i", nf)
        out += struct.pack("<dd", self.q_g, self.q_a)
        out += struct.pack(
            "<iiii", self.y_shape, self.z_shape, len(self.y_string), len(self.z_string)
        )
        out += self.y_string
        out += self.z_string
        for g, (k1, k2, k3) in zip(self.gpcc_strings, self.ks):
            out += struct.pack("<iiii", len(g), k1, k2, k3)
            out += g
        if self.geometry_mode == "guided":
            assert self.occ_strings, "guided mode requires occupancy streams"
            if self.occ_family:
                out += b"OC3"
            else:
                out += b"OC2" if self.occ_calibrated else b"OC1"
            out += struct.pack("<i", len(self.occ_strings))
            for s in self.occ_strings:
                out += struct.pack("<i", len(s))
                out += s
        if self.color_step > 0:
            out += b"CR2" if self.color_transform else b"CR1"
            out += struct.pack("<iBBB", self.color_step, *self.color_scale_idx)
            out += struct.pack("<i", len(self.color_string))
            out += self.color_string
        return bytes(out)

    @classmethod
    def unpack(cls, data: bytes) -> "SegmentBitstream":
        off = 0

        def take(fmt):
            nonlocal off
            size = struct.calcsize(fmt)
            vals = struct.unpack_from(fmt, data, off)
            off += size
            return vals

        (num_frames,) = take("<i")
        mode = "latent" if num_frames >= 0 else "lossless"
        num_frames = abs(num_frames)
        q_g, q_a = take("<dd")
        y_shape, z_shape, ylen, zlen = take("<iiii")
        y_string = bytes(data[off : off + ylen]); off += ylen
        z_string = bytes(data[off : off + zlen]); off += zlen
        gpcc_strings, ks = [], []
        for _ in range(num_frames):
            glen, k1, k2, k3 = take("<iiii")
            gpcc_strings.append(bytes(data[off : off + glen])); off += glen
            ks.append((k1, k2, k3))
        color_step, color_scale_idx, color_string = 0, (), b""
        color_transform = True
        occ_strings: list[bytes] = []
        occ_calibrated = True
        occ_family = False
        while off + 3 <= len(data):
            tag = data[off : off + 3]
            if tag in (b"OC1", b"OC2", b"OC3"):
                occ_calibrated = tag != b"OC1"
                occ_family = tag == b"OC3"
                off += 3
                (n_occ,) = take("<i")
                for _ in range(n_occ):
                    (slen,) = take("<i")
                    occ_strings.append(bytes(data[off : off + slen])); off += slen
                mode = "guided"
            elif tag in (b"CR1", b"CR2"):
                color_transform = tag == b"CR2"
                off += 3
                color_step, i0, i1, i2 = take("<iBBB")
                color_scale_idx = (i0, i1, i2)
                (clen,) = take("<i")
                color_string = bytes(data[off : off + clen]); off += clen
            else:
                break
        return cls(
            q_g, q_a, y_shape, z_shape, y_string, z_string, gpcc_strings, ks, mode,
            occ_strings=occ_strings, occ_calibrated=occ_calibrated,
            occ_family=occ_family,
            color_step=color_step,
            color_scale_idx=color_scale_idx, color_string=color_string,
            color_transform=color_transform,
        )


def pack_segment(levels: Sequence[SegmentBitstream]) -> bytes:
    """Concatenate multiple quality levels with a tiny index header."""
    blobs = [lv.pack() for lv in levels]
    out = bytearray(struct.pack("<i", len(blobs)))
    for b in blobs:
        out += struct.pack("<i", len(b))
    for b in blobs:
        out += b
    return bytes(out)


def unpack_segment(data: bytes) -> list[SegmentBitstream]:
    (n,) = struct.unpack_from("<i", data, 0)
    sizes = struct.unpack_from(f"<{n}i", data, 4)
    off = 4 + 4 * n
    out = []
    for s in sizes:
        out.append(SegmentBitstream.unpack(data[off : off + s]))
        off += s
    return out
