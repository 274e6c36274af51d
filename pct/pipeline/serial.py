"""Serial encode/decode pipelines — the end-to-end codec slice.

TPU-native counterpart of the reference's serial codecs
(``sender/encoder/codec_single.py`` steps E1-E7 and
``receiver/decoder/codec_single.py`` steps D1-D6), engineered for *minimum
device dispatches and transfer bytes*: on deployments where the chip sits
behind a link (PCIe, or a network relay as in this rig), per-op latency and
device<->host bandwidth — not FLOPs — bound the pipeline.

Encode = ONE fused device graph + one compact pack/pull:
  [canonicalize -> g_a -> h_a -> on-device factorized quantization
   (round(z - median), mathematically identical to the entropy round-trip the
   reference performs through CompressAI, ``codec_pipeline.py:294-317``) ->
   h_s -> per-quality gains/symbols/indexes]
then host-side rANS + octree coding of int16/uint8 symbol planes.

Decode = host entropy decode feeding TWO fused device graphs:
  phase 1: canonicalize y coords -> derive z -> hyper synthesis -> indexes
  phase 2: offset dequantization -> g_s with per-frame top-k -> packed
  int16 coords / uint8 colors.

Stage-capacity strategy: inside a fused graph the latent/hyper row capacities
are static fractions of the input capacity (surface-like clouds shrink ~4-8x
per stride level); a post-hoc count check falls back to full-capacity graphs
in the rare overflow case. The reference's per-step timing telemetry is kept:
the fused device wall is attributed across E1/E2/E4 by a modeled MAC split
(``_device_step_fractions``; structure ops land in E1 by construction).

Determinism note: decode correctness requires encoder and decoder to agree on
the Gaussian (scale, mean) parameters bit-wise. Two mechanisms: (1) the
decoder reconstructs the encoder's static y/z capacities from the bitstream
(``SerialDecoder.encoder_caps``) and runs hyper-synthesis under those exact
shapes, so on the same backend both sides execute the same XLA program on
the same values — bit-identical by construction (same-host parity is what
the reference also relies on, pinning deterministic CUDA,
``codec_pipeline.py:16-18``); (2) the coding-index derivation is
INTEGERIZED (``GaussianConditional.build_indexes_from_codes``): scales and
gains are rounded once onto fixed-point grids (1/256 and 1/64) and
everything after — the scale*gain product and the table compare — is int32
arithmetic, bit-exact on any backend by construction. The parity surface of
a cross-backend deployment (TPU encode -> CPU decode) is therefore exactly
the two grid roundings, whose flip risk is confined to h_s outputs within
one float ulp of a grid boundary — measured 0 flips over 315k x 3 by
``scripts/cross_backend_check.py``, kept as a regression.
"""

from __future__ import annotations

import functools
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pct.entropy.bitstream import SegmentBitstream, pack_segment
from pct.gpcc import decode_points, encode_points
from pct.models.unified import ColorModel, Params
from pct.sparse import coords as coords_lib
from pct.sparse.block import SparseBlock, bucket_size, canonicalize


PARAM_GRID = 256.0  # (scale, mean) quantization grid, see module docstring

# Loud cold-compile detection: jitted codec graphs are keyed on bucket
# capacities; compiling one mid-stream stalls the live pipeline for tens of
# seconds (the round-2 10 fps campaign lost 40% of segments to exactly
# this). First-seen shape keys that take >1 s are logged so steady-state
# cold compiles are visible; pct.pipeline.warmup pre-compiles the ladder.
_SEEN_SHAPES: set = set()


def _loud_compile(kind: str, key, fn):
    k = (kind, key)
    first = k not in _SEEN_SHAPES
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    if first:
        _SEEN_SHAPES.add(k)
        if dt > 1.0:
            print(
                f"[pct] cold compile on the hot path: {kind} {key} took {dt:.1f}s "
                f"(prewarm the bucket ladder: pct.pipeline.warmup.prewarm_codec)",
                flush=True,
            )
    return out

# Static capacity divisors per stride level relative to the input capacity.
# Measured on the recorded camera data (max per-stride occupancy ratios over
# the test sequence): stride2 0.42, stride4 0.141, stride8 0.046, stride32
# 0.004. The round-2 divisors (2, 8, 16) put the stride-4 cap at 0.125 —
# BELOW the measured 0.141 — so dense frames routinely fired the
# full-capacity overflow fallback (an extra graph family to compile, and a
# far slower one). These divisors keep >=1.3x margin at every level.
LEVEL_CAP_FRACTIONS = (1.6, 5.5, 14.0)  # after down0 (stride 2), down1 (4), down2 (8=y)
Z_CAP_FRACTION = 64
SMALL_INPUT = 4096  # below this, skip fractional capacities entirely


def frames_to_block(frames: Sequence[dict], capacity: int | None = None) -> SparseBlock:
    """Stack per-frame ``{"points": int [N,3], "colors": float [N,3]}`` dicts
    into one batched canonical block with features ``[1, R, G, B]``
    (constant-1 channel as in reference ``codec_pipeline.py:258``)."""
    coords, feats, mask = _frames_to_arrays(frames, capacity)
    return canonicalize(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(mask), dedup=True)


def _frames_to_arrays(frames: Sequence[dict], capacity: int | None = None):
    if len(frames) >= 0xFFFF:
        raise ValueError(f"batch of {len(frames)} frames exceeds the 16-bit batch-index range")
    coords, feats = [], []
    for b, fr in enumerate(frames):
        pts = np.asarray(fr["points"], np.int32)
        if pts.size and (pts.min() < -coords_lib.COORD_BIAS or pts.max() >= coords_lib.COORD_BIAS):
            # out-of-range coordinates would silently wrap in the packed
            # canonical keys (pct/sparse/coords.py contract) and corrupt the
            # bitstream geometry
            raise ValueError(
                f"frame {b}: coordinates outside [-{coords_lib.COORD_BIAS}, "
                f"{coords_lib.COORD_BIAS}): min {int(pts.min())}, max {int(pts.max())}"
            )
        col = np.asarray(fr["colors"], np.float32)
        # Dedup per frame BEFORE bucketing: the decoder reconstructs the
        # encoder's static capacities from sum(ks[:, -1]) — the post-dedup
        # voxel count (SerialDecoder.encoder_caps). Bucketing the raw row
        # count would give the two sides different static shapes whenever
        # duplicate input points straddle a bucket boundary (ADVICE round-2).
        if pts.shape[0]:
            _, first = np.unique(pts, axis=0, return_index=True)
            first.sort()  # keep first occurrence, original order
            pts, col = pts[first], col[first]
        n = pts.shape[0]
        coords.append(np.concatenate([np.full((n, 1), b, np.int32), pts], axis=1))
        feats.append(np.concatenate([np.ones((n, 1), np.float32), col], axis=1))
    coords = np.concatenate(coords, axis=0)
    feats = np.concatenate(feats, axis=0)
    cap = capacity or bucket_size(coords.shape[0])
    pad = cap - coords.shape[0]
    mask = np.concatenate([np.ones(coords.shape[0], bool), np.zeros(pad, bool)])
    coords = np.concatenate([coords, np.zeros((pad, 4), np.int32)], axis=0)
    feats = np.concatenate([feats, np.zeros((pad, feats.shape[1]), np.float32)], axis=0)
    return coords, feats, mask


def block_to_frames(block: SparseBlock, num_frames: int) -> list[dict]:
    """Split a decoded stride-1 block back into per-frame point/color dicts
    (reference ``get_points_per_batch``/``pack_batches``)."""
    coords = np.asarray(block.coords)
    feats = np.asarray(block.feats)
    mask = np.asarray(block.mask)
    return _split_frames(coords, feats, mask, num_frames)


def _split_frames(coords, feats, mask, num_frames):
    out = []
    for b in range(num_frames):
        sel = mask & (coords[:, 0] == b)
        out.append(
            {
                "points": coords[sel][:, 1:].astype(np.int32),
                "colors": np.clip(feats[sel].astype(np.float32), 0.0, 1.0),
            }
        )
    return out


def _unpack_synth_buf(buf: np.ndarray, cap_out: int):
    """Unpack the synthesis graphs' packed uint8 output buffer
    ``[int16 coords ⧺ uint8 colors ⧺ mask]`` -> (coords int32 [n,4],
    colors float32 [n,3] in 0..255) at the masked rows."""
    coords16 = buf[: cap_out * 8].view(np.int16).reshape(cap_out, 4)
    colors8 = buf[cap_out * 8 : cap_out * 11].reshape(cap_out, 3)
    out_mask = buf[cap_out * 11 :].astype(bool)
    return coords16.astype(np.int32)[out_mask], colors8.astype(np.float32)[out_mask], out_mask


def _pack_occ_keys(coords: np.ndarray) -> np.ndarray:
    """Host-side (b, x, y, z) -> uint64 set-membership keys (16 bits per
    field, xyz biased to non-negative; b < 0xFFFF per ``_frames_to_arrays``)."""
    c = np.asarray(coords, np.int64)
    u = (c[:, 1:] + coords_lib.COORD_BIAS).astype(np.uint64)
    return (
        (c[:, 0].astype(np.uint64) << np.uint64(48))
        | (u[:, 0] << np.uint64(32))
        | (u[:, 1] << np.uint64(16))
        | u[:, 2]
    )


def _dedup_sorted(k: np.ndarray) -> np.ndarray:
    if k.size == 0:
        return k
    return k[np.concatenate([[True], k[1:] != k[:-1]])]


def _true_key_pyramid(frames: "Sequence[dict]", num_levels: int) -> list:
    """Sorted uint64 ground-truth occupancy key sets, one per synthesis level
    (strides ``2^(L-1) .. 1``), for the guided encoder's membership source.

    Coarser levels are derived by masking the low ``log2(s)`` bits of each
    16-bit coordinate lane of the packed key — ``COORD_BIAS`` is a multiple
    of every stride, so lane masking IS floor-to-stride. Field-wise flooring
    does NOT preserve lexicographic order (ties created in a coarser field
    re-expose finer-field inversions: (1,9) < (3,0) but floored-by-4
    (0,8) > (0,0)), so every masked level is re-sorted before dedup — the
    sorted-table contract is what ``find_keys``'s binary-search path needs.
    Frames concatenate already-sorted (batch is the top lane)."""
    per_level: list[list[np.ndarray]] = [[] for _ in range(num_levels)]
    for b, fr in enumerate(frames):
        pts = np.asarray(fr["points"], np.int32)
        bs = np.concatenate([np.full((pts.shape[0], 1), b, np.int32), pts], axis=1)
        k = _pack_occ_keys(bs)
        k.sort()
        k = _dedup_sorted(k)
        for lvl in range(num_levels):
            s = 2 ** (num_levels - 1 - lvl)
            if s == 1:
                per_level[lvl].append(k)
            else:
                m = np.uint64(s - 1)
                mk = k & ~((m << np.uint64(32)) | (m << np.uint64(16)) | m)
                mk.sort()
                per_level[lvl].append(_dedup_sorted(mk))
    return [
        np.concatenate(ks) if ks else np.zeros(0, np.uint64) for ks in per_level
    ]


@jax.jit
def _guided_membership(hi_s, lo_s, cand_c, cand_m, bins):
    """Device-side ground-truth membership test for the guided encoder.

    Replaces the old host round trip (download candidate coords at 16 B/row
    + int32 bins, ``np.isin`` on host, upload a bool plane) with an on-device
    sorted-key join against the uploaded true-set table: the pyramid's next
    step consumes ``bits`` without ever leaving the device, and the host
    downloads only the packed bit plane (1 bit/candidate) + uint8 bins it
    needs to write the rANS stream — ~14x fewer bytes over the host link,
    which dominated the guided encode wall (PERF.md round-5 campaign)."""
    hi_q, lo_q = coords_lib._masked_keys(cand_c, cand_m)
    bits = coords_lib.find_keys(hi_s, lo_s, hi_q, lo_q) & cand_m
    cap = bits.shape[0]
    cap8 = -(-cap // 8) * 8
    bp = jnp.pad(bits, (0, cap8 - cap)).reshape(-1, 8)
    weights = jnp.array([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
    packed = (bp.astype(jnp.int32) * weights[None, :]).sum(axis=1).astype(jnp.uint8)
    return bits, packed, bins.astype(jnp.uint8)


def _static_truncate(block: SparseBlock, cap: int) -> SparseBlock:
    if cap >= block.capacity:
        return block
    return SparseBlock(
        coords=block.coords[:cap],
        feats=block.feats[:cap],
        mask=block.mask[:cap],
        stride=block.stride,
    )


def _synth_caps(
    model: ColorModel, ks: np.ndarray, cap_mode: str = "tier"
) -> tuple[int, ...]:
    """Decode-side synthesis level capacities (``ks``: [L, B], coarse->fine).

    ``cap_mode="tier"`` (streaming default) — static per encode tier: the
    transmitted fine count reconstructs the encoder's post-dedup input
    bucket, and each coarser level reuses the encoder's own
    ``LEVEL_CAP_FRACTIONS`` bound for the same grid — so one tier compiles
    exactly ONE phase-2 graph family instead of one per live density
    profile. (Round-3 campaign: live density variation walked the per-level
    sum buckets mid-stream — e.g. warmed ``(8192, 24576, 65536)`` but hit
    ``(12288, 24576, 65536)`` — and every fresh tuple was a 2–130 s relay
    compile on the hot path.)

    ``cap_mode="counted"`` — each level gets its own half-octave bucket of
    the transmitted counts. The conv gathers and sorts of the synthesis run
    over capacity rows, so tier padding is paid in DEVICE TIME (the stride-2
    tier cap is ~2.4x the actual rows at vox10 shapes); counted caps trade
    more graph families for tight shapes — right for offline / large-scale
    decode where the shape set is known and prewarmable, wrong for a live
    ladder. Decoded output is bit-identical either way (capacity only pads;
    selection, ordering and values never depend on it — pinned by
    tests/test_counted_caps.py).

    If a level's actual sum exceeds the static bound (only possible when the
    encoder itself overflowed its caps and fell back to full capacity), that
    level falls back to the sum-bucketed cap — correct, loud, rare."""
    kf = model.config.keep_factors
    nl = ks.shape[0]
    last = nl - 1
    tier = int(bucket_size(int(ks[last].sum())))
    caps = []
    for l in range(nl):
        factor = kf[l] if l < last else 1.0
        # match g_s's per-frame k_eff = round(k_b * kf) (unified.py g_s):
        # summing the rounded values — ceil(sum * kf) can undershoot it by
        # up to B/2 rows and silently drop ranked survivors at segments
        # sitting exactly on the analysis cap (ADVICE r3).
        if factor == 1.0:
            need = int(ks[l].sum())
        else:
            need = int(np.round(ks[l].astype(np.float64) * factor).sum())
        if cap_mode == "counted":
            caps.append(int(bucket_size(need)))
            continue
        if tier <= SMALL_INPUT or l == last:
            stat = tier
        else:
            # ks level l lives on the same grid as encoder analysis cap
            # LEVEL_CAP_FRACTIONS[nl - 2 - l] (stride 4 -> /5.5, stride 2 -> /1.6)
            stat = int(np.ceil(tier / LEVEL_CAP_FRACTIONS[nl - 2 - l] * factor))
        caps.append(stat if need <= stat else int(bucket_size(need)))
    return tuple(caps)


def _dequant_y_core(model, params, y_mask, scales, means, y_syms, q):
    """Shared y-hat dequantization (gain + optional dead-zone offsets)."""
    gain = model.scale_nn(params, q)
    sym = y_syms.astype(jnp.float32)
    if model.config.use_offsets:
        offs = model.get_offsets(scales * gain[None, :], jnp.abs(sym))
        mag = jnp.abs(sym) + jnp.where(sym == 0, 0.0, offs)
    else:  # noise-trained synthesis: plain mid-bin reconstruction
        mag = jnp.abs(sym)
    y_hat = jnp.sign(sym) * mag / gain[None, :] + means
    return jnp.where(y_mask[:, None], y_hat, 0.0)


def _guided_head_core(model, params, y_block, scales, means, y_syms, q):
    """Guided head math (see ``SerialDecoder._guided_head``): module-level so
    the dp-sharded decoder can vmap the identical graph per frame
    (``pct.parallel.infer.ShardedFrameDecoder._decode_guided``) — the logits
    are parity-critical coding inputs, so both drivers MUST trace this one
    function."""
    from pct.models.unified import expand_children
    from pct.entropy.binary import logit_bins
    from pct.ops.conv import build_kmap, set_compute_dtype

    set_compute_dtype(jnp.float32)
    y_hat = _dequant_y_core(model, params, y_block.mask, scales, means, y_syms, q)
    x = y_block.with_feats(y_hat)
    kmap = build_kmap(x, 3)
    logits = model.occ_logits(params, x, kmap, 0).reshape(-1)
    cand_coords, cand_mask = expand_children(x)
    # the y-grid kernel map seeds the per-level derived-map chain
    return y_hat, cand_coords, cand_mask, logit_bins(logits), kmap[0], kmap[1]


def _guided_step_core(
    model, params, p_coords, p_feats, p_mask, p_kidx, p_kfound, cand_coords,
    cand_mask, bits, cap_next, level, stride,
):
    """Guided per-level step math (see ``SerialDecoder._guided_step`` for the
    contract); module-level for the same single-trace reason as
    ``_guided_head_core``."""
    from pct.models.unified import expand_children
    from pct.entropy.binary import logit_bins
    from pct.ops.conv import build_kmap, set_compute_dtype, sparse_conv, up_features_at
    from pct.ops.kernel_maps import derive_child_self_kmap
    from pct.sparse.block import PAD_COORD

    set_compute_dtype(jnp.float32)
    m = model
    p = params["g_s"]
    parent = SparseBlock(coords=p_coords, feats=p_feats, mask=p_mask, stride=stride)
    kept = cand_mask & bits
    kc = jnp.where(
        kept[:, None], cand_coords, jnp.array(PAD_COORD, jnp.int32)[None, :]
    )
    perm = coords_lib.lex_argsort(kc, kept)[:cap_next]
    kc, km = kc[perm], kept[perm]
    if m.use_derived_maps:
        from pct.ops.conv import up_features_compact

        feats = up_features_compact(
            p_feats, p[f"up{level}"]["w"], p[f"up{level}"]["b"], perm, km
        )
        kmap = derive_child_self_kmap(
            (p_kidx, p_kfound), perm // 8, perm % 8, kc, km, stride // 2
        )
    else:
        feats = up_features_at(
            parent, p[f"up{level}"]["w"], p[f"up{level}"]["b"], kc, km
        )
        kmap = None
    child = SparseBlock(coords=kc, feats=feats, mask=km, stride=stride // 2)
    if kmap is None:
        kmap = build_kmap(child, 3)
    child = sparse_conv(child, p[f"conv{level}"]["w"], p[f"conv{level}"]["b"], kmap=kmap)
    child = child.with_feats(jax.nn.relu(child.feats))
    if level == m.config.num_levels - 1:
        rgb = m._rgb_head(params, child, kmap)
        coords16 = child.coords.astype(jnp.int16)
        colors8 = jnp.clip(jnp.round(rgb.feats * 255.0), 0, 255).astype(jnp.uint8)
        return jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(coords16.reshape(-1), jnp.uint8).reshape(-1),
                colors8.reshape(-1),
                km.astype(jnp.uint8),
            ]
        )
    logits = m.occ_logits(params, child, kmap, level + 1).reshape(-1)
    cand2, cmask2 = expand_children(child)
    return (
        child.coords, child.feats, child.mask, cand2, cmask2,
        logit_bins(logits), kmap[0], kmap[1],
    )


def _guided_step_fam_core(
    model, params, x_coords, x_feats, x_mask, xk_idx, xk_found, cand_coords,
    cand_mask, bits, cap_next, level, stride,
):
    """OC3 guided per-level step in FAMILY form (pct/ops/family.py).

    Differences from the OC1/OC2 step (``_guided_step_core``), both wire
    contract and compute shape:
    - survivors stay in CANDIDATE-INDEX order (sort-free cumsum compaction)
      — the next level's occupancy stream enumerates candidates in this
      order, deleting the legacy contract's per-level 8n canonical sorts;
    - the child feature conv, the rgb head, and the next level's occupancy
      head all run family-form over the PARENT grid's kernel map (8x fewer
      gather descriptors — the round-5 decode-wall fix);
    - only the final level canonicalizes (its order is observable: packed
      output + color-residual addressing), over cap rows.

    Module-level for the single-trace parity reason of ``_guided_step_core``:
    the encoder produces OC3 streams by driving THIS function with
    ground-truth bits, so both sides compute bit-identical logits."""
    from pct.models.unified import expand_children
    from pct.entropy.binary import logit_bins
    from pct.ops.conv import build_kmap_unsorted, set_compute_dtype
    from pct.ops.family import family_conv, family_keep_mask, gather_family
    from pct.ops.topk import compact_mask
    from pct.sparse.block import PAD_COORD

    set_compute_dtype(jnp.float32)
    m = model
    p = params["g_s"]
    n = x_coords.shape[0]
    pkmap = (xk_idx, xk_found)
    perm, km = compact_mask(cand_mask & bits, cap_next)
    kc = jnp.where(
        km[:, None], cand_coords[perm], jnp.array(PAD_COORD, jnp.int32)[None, :]
    )
    last = level == m.config.num_levels - 1
    if last:
        order = coords_lib.lex_argsort(kc, km)
        kc, km, perm = kc[order], km[order], perm[order]
    premul = jnp.einsum(
        "nc,tcd->ntd", x_feats, p[f"up{level}"]["w"],
        preferred_element_type=x_feats.dtype,
    ) + p[f"up{level}"]["b"]
    kept = family_keep_mask(perm, km, n)
    fam = family_conv(
        premul * kept[:, :, None], pkmap, p[f"conv{level}"]["w"],
        p[f"conv{level}"]["b"], x_mask,
    )
    fam = jax.nn.relu(fam) * kept[:, :, None]
    if last:
        pr = p["rgb"]
        if m.config.rgb_layers == 2:
            h = family_conv(fam, pkmap, pr["w1"], pr["b1"], x_mask)
            h = jax.nn.relu(h) * kept[:, :, None]
            rgbf = gather_family(h, perm, km) @ pr["w2"] + pr["b2"]
            rgbf = jnp.where(km[:, None], rgbf, 0)
        else:
            rf = family_conv(fam, pkmap, pr["w"], pr["b"], x_mask)
            rgbf = gather_family(rf, perm, km)
        coords16 = kc.astype(jnp.int16)
        colors8 = jnp.clip(jnp.round(rgbf * 255.0), 0, 255).astype(jnp.uint8)
        return jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(coords16.reshape(-1), jnp.uint8).reshape(-1),
                colors8.reshape(-1),
                km.astype(jnp.uint8),
            ]
        )
    child_feats = gather_family(fam, perm, km)
    child = SparseBlock(coords=kc, feats=child_feats, mask=km, stride=stride // 2)
    kmap_c = build_kmap_unsorted(child, 3)
    po = p[f"occ{level + 1}"]
    if m.config.occ_layers == 2:
        h = family_conv(fam, pkmap, po["w1"], po["b1"], x_mask)
        h = jax.nn.relu(h) * kept[:, :, None]
        lf = family_conv(h, pkmap, po["w2"], po["b2"], x_mask)
    else:
        lf = family_conv(fam, pkmap, po["w"], po["b"], x_mask)
    logits = gather_family(lf, perm, km).reshape(-1)
    cand2, cmask2 = expand_children(child)
    return (
        kc, child_feats, km, kmap_c[0], kmap_c[1], cand2, cmask2,
        logit_bins(logits),
    )


def _caps_for(capacity: int) -> tuple[tuple[int, ...], int]:
    """(per-level g_a caps, z cap) for a given input capacity."""
    if capacity <= SMALL_INPUT:
        return (capacity,) * len(LEVEL_CAP_FRACTIONS), capacity
    return (
        tuple(int(capacity / f) for f in LEVEL_CAP_FRACTIONS),
        capacity // Z_CAP_FRACTION,
    )


def _transform_macs(params: Params, rows_of) -> float:
    """Sum ``taps * Cin * Cout * rows`` over one transform's conv weights.

    ``rows_of(name)`` maps a layer name (``conv0``, ``down1``, ``out``, ...)
    to the static row capacity that layer's output is evaluated at."""
    total = 0.0
    for name, layer in params.items():
        w = layer.get("w") if isinstance(layer, dict) else None
        if w is None or getattr(w, "ndim", 0) != 3:
            continue
        taps, cin, cout = w.shape
        total += float(rows_of(name)) * taps * cin * cout
    return total


def _device_step_fractions(params: Params, config, cap_in: int,
                           level_caps: tuple, cap_z: int) -> tuple:
    """Modeled split of the fused E1 device graph across the reference's
    E1/E2/E4 step keys: ``(f_analysis, f_hyper_analysis, f_hyper_synthesis)``.

    The encode transforms fuse into ONE XLA program, so per-step walls are
    not separately measurable without breaking the fusion that makes the
    graph fast. Instead the wall is attributed proportionally to each
    transform's modeled MAC work (taps x Cin x Cout x static row capacity
    per conv). Structure ops (canonical sort, kernel-map joins, top-k) run
    on the analysis-side grids and are not modeled, so their time lands in
    E1/analysis — the same bucket where the reference's E1 pays its
    MinkowskiEngine hash/stack cost (sender/encoder/codec_pipeline.py),
    keeping the stacked step bars comparable in kind. Hyper grids are ~64x
    smaller than the input, so E2/E4 land at a few percent — a modeled
    estimate, but far closer than the 0.0 reported through round 5."""
    L = config.num_levels
    ny = level_caps[L - 1]
    # g_a rows: v1 convs run at each level's INPUT rows, v2 at the
    # patchified OUTPUT rows; downs at their output rows; "out" at the y grid
    ga_in = (cap_in,) + tuple(level_caps[: L - 1])

    def ga_rows(name):
        i = int(name[-1]) if name[-1].isdigit() else L - 1
        if name.startswith("conv"):
            return level_caps[i] if config.arch == "v2" else ga_in[i]
        if name.startswith("down"):
            return level_caps[i]
        return ny  # "out"

    # h_a: conv0 at ny; down0 at the (unmaterialized-cap) mid grid ~ny/4;
    # down1 at the z grid
    mid = max(ny // 4, cap_z)
    ha_rows = {"conv0": ny, "down0": mid, "down1": cap_z}
    # h_s: up0 expands z 8x, conv0 on that grid; the final up+conv is
    # evaluated lazily at the ny y rows (generative_up_conv_at)
    hs_rows = {"up0": 8 * cap_z, "conv0": 8 * cap_z, "up1": ny, "conv1": ny}
    m_ga = _transform_macs(params["g_a"], ga_rows)
    m_ha = _transform_macs(params["h_a"], lambda n: ha_rows.get(n, ny))
    m_hs = _transform_macs(params["h_s"], lambda n: hs_rows.get(n, ny))
    total = m_ga + m_ha + m_hs
    if total <= 0:
        return (1.0, 0.0, 0.0)
    return (m_ga / total, m_ha / total, m_hs / total)


class SerialEncoder:
    """compress(frames, settings) -> (levels, sideinfo) — the
    ``CompressionPipeline.compress`` surface (reference ``codec_single.py:47``)."""

    def __init__(self, model: ColorModel, params: Params, tables: dict | None = None):
        self.model = model
        self.params = params
        # prefer checkpoint-shipped tables (bit-identical across hosts);
        # rebuild locally otherwise (the reference's update()-at-load analog)
        self.eb_tables = (tables or {}).get("eb") or model.entropy_bottleneck.update(
            params["entropy_bottleneck"]
        )
        self.gc_tables = (tables or {}).get("gc") or model.gaussian_conditional.update()
        # binary occupancy tables (guided mode) are checkpoint-independent
        self.bc_tables = model.binary_conditional.update()
        self._sim_decoder = None  # lazy local decoder for residual/guided coding

    # share jit traces across instances with the same model config (self is a
    # static jit argument; id-hashing would recompile per pipeline object)
    def __hash__(self):
        return hash((type(self).__name__, self.model.config))

    def __eq__(self, other):
        return type(other) is type(self) and other.model.config == self.model.config

    # ------------------------------------------------------------------
    # device stage: everything up to symbol planes, one dispatch
    # ------------------------------------------------------------------

    @functools.partial(
        jax.jit, static_argnames=("self", "num_frames", "level_caps", "cap_z")
    )
    def _stage1(self, params, coords, feats, mask, qs, num_frames, level_caps, cap_z):
        m = self.model
        block = canonicalize(coords, feats, mask, dedup=True)
        y, ks = m.g_a(params, block, num_frames, level_caps)
        ny = y.count()
        num_points = block.count()
        z = m.h_a(params, y)
        nz = z.count()
        z = _static_truncate(z, cap_z)

        # on-device factorized quantization (== the CompressAI entropy
        # round-trip the reference runs on host)
        med = m.entropy_bottleneck.medians(params["entropy_bottleneck"])  # [Cz]
        z_sym = jnp.round(z.feats - med[None, :])
        z_sym = jnp.where(z.mask[:, None], z_sym, 0)
        z_hat = z.with_feats(z_sym + med[None, :])

        scales, means = m.h_s(params, z_hat, y.coords, y.mask)
        # integerized index path: after these two grid roundings everything
        # is int32 — bit-exact across backends (gaussian.py docstring)
        s_codes = m.gaussian_conditional.quantize_scales(scales)
        means = jnp.round(means * PARAM_GRID) / PARAM_GRID

        syms, idxs = [], []
        for i in range(qs.shape[0]):  # static quality count
            gain = m.scale_nn(params, qs[i])
            g_codes = m.gaussian_conditional.quantize_gain(gain)
            sym = jnp.round(y.feats * gain[None, :] - means * gain[None, :])
            sym = jnp.where(y.mask[:, None], sym, 0)
            idx = m.gaussian_conditional.build_indexes_from_codes(s_codes, g_codes[None, :])
            syms.append(sym.astype(jnp.int16))
            idxs.append(idx.astype(jnp.uint8))
        # single int32 metadata vector: one host pull instead of four
        meta = jnp.concatenate(
            [ks.reshape(-1), jnp.stack([ny, nz, num_points])]
        ).astype(jnp.int32)
        return (
            meta,
            y.coords,
            jnp.stack(syms),
            jnp.stack(idxs),
            z_sym.astype(jnp.int16),
        )

    @functools.partial(jax.jit, static_argnames=("self", "ny_cap", "nz_cap"))
    def _pack(self, y_coords, y_syms, y_idxs, z_syms, ny_cap, nz_cap):
        """Slice to tight buckets and fuse everything into ONE uint8 buffer —
        each pulled array is a separate device->host round trip on
        relay-attached chips."""

        def as_bytes(x):
            return jax.lax.bitcast_convert_type(
                x.reshape(-1), jnp.uint8
            ).reshape(-1)

        parts = (
            as_bytes(y_coords[:ny_cap].astype(jnp.int16)),
            as_bytes(y_syms[:, :ny_cap]),
            as_bytes(y_idxs[:, :ny_cap]),
            as_bytes(z_syms[:nz_cap]),
        )
        return jnp.concatenate(parts)

    def device_encode(self, frames: Sequence[dict], settings) -> dict:
        """Fused device pass -> compact host-side symbol planes (E1)."""
        num_frames = len(frames)
        coords, feats, mask = _frames_to_arrays(frames)
        cap = coords.shape[0]
        level_caps, cap_z = _caps_for(cap)
        qs = jnp.asarray(np.asarray(settings, np.float32))
        out = _loud_compile(
            "encode",
            (cap, num_frames, len(settings)),
            lambda: self._stage1(
                self.params,
                jnp.asarray(coords),
                jnp.asarray(feats),
                jnp.asarray(mask),
                qs,
                num_frames,
                level_caps,
                cap_z,
            ),
        )
        def unpack_meta(meta):
            meta = np.asarray(meta)
            ks = meta[: -3].reshape(self.model.config.num_levels, num_frames)
            return ks, int(meta[-3]), int(meta[-2]), int(meta[-1])

        ks, ny, nz, num_points = unpack_meta(out[0])
        # overflow check: ks rows are occupancies at strides (4, 2, 1); the
        # capped levels hold strides (2, 4, 8=y)
        # ">= cap" because an in-graph truncation clamps the measured count to
        # exactly cap — indistinguishable from a lucky exact fit
        overflow = (
            int(ks[1].sum()) >= level_caps[0]
            or int(ks[0].sum()) >= level_caps[1]
            or ny >= level_caps[2]
            or nz >= cap_z
        )
        if overflow:  # rare: cloud denser than the surface-ratio assumption
            out = self._stage1(
                self.params,
                jnp.asarray(coords),
                jnp.asarray(feats),
                jnp.asarray(mask),
                qs,
                num_frames,
                (cap,) * len(level_caps),
                cap,
            )
            ks, ny, nz, num_points = unpack_meta(out[0])
        ny_cap = min(bucket_size(ny), out[1].shape[0])
        nz_cap = min(bucket_size(nz), out[4].shape[0])
        nq = len(settings)
        c_lat = self.model.config.latent_channels
        c_hyp = self.model.config.hyper_channels
        buf = np.asarray(jax.device_get(self._pack(out[1], out[2], out[3], out[4], ny_cap, nz_cap)))
        sizes = [ny_cap * 4 * 2, nq * ny_cap * c_lat * 2, nq * ny_cap * c_lat, nz_cap * c_hyp * 2]
        offs = np.cumsum([0] + sizes)
        y_coords = buf[offs[0] : offs[1]].view(np.int16).reshape(ny_cap, 4).astype(np.int32)
        y_syms = buf[offs[1] : offs[2]].view(np.int16).reshape(nq, ny_cap, c_lat)
        y_idxs = buf[offs[2] : offs[3]].reshape(nq, ny_cap, c_lat)
        z_syms = buf[offs[3] : offs[4]].view(np.int16).reshape(nz_cap, c_hyp)
        if overflow:
            level_caps, cap_z = (cap,) * len(level_caps), cap
        return {
            "num_frames": num_frames,
            "num_points": num_points,
            "ks": ks,
            "ny": ny,
            "nz": nz,
            "y_coords": y_coords[:ny],
            "y_syms": y_syms[:, :ny],
            "y_idxs": y_idxs[:, :ny],
            "z_syms": z_syms[:nz],
            "step_fracs": _device_step_fractions(
                self.params, self.model.config, cap, level_caps, cap_z
            ),
        }

    # ------------------------------------------------------------------
    # host stage: entropy + geometry coding (E3, E5, E6, E7)
    # ------------------------------------------------------------------

    def _attach_color_residuals(
        self, level: SegmentBitstream, frames: Sequence[dict], step: int,
        pred_frames: Sequence[dict] | None = None,
    ) -> None:
        """Append the color-residual stream (CR2 tail) to any level.

        The decoder's color prediction AND voxel set are DETERMINISTIC given
        the level bytes, so the encoder reproduces them by decoding the level
        locally and entropy-codes the quantized (target - predicted) colors
        in the orthonormal opponent basis (``pct/entropy/colorres.py``) with
        the Gaussian-conditional tables at per-channel scale indexes
        (shipped, 3 bytes). Targets: exact input color on hit voxels, the
        stride-2 input-cell mean on misses, the prediction itself elsewhere.
        This pays the honest rate for the sensor color noise the latent
        cannot carry (the attribute analog of the lossless geometry rung).
        Same-backend prediction parity is exact; a cross-backend decoder can
        differ by +-1 uint8 rounding step on rare boundary voxels — a
        bounded color error, never a stream desync (the residual coding
        indexes are position-independent). For LATENT rungs the decoded
        voxel ORDER additionally rides on float top-k tie-breaks; same
        backend it is bit-stable (tests pin it), cross-backend a tie flip
        would misaddress a handful of residuals — bounded color error on
        those voxels only."""
        from pct.entropy import colorres

        m = self.model
        if pred_frames is None:
            if self._sim_decoder is None:
                self._sim_decoder = SerialDecoder(
                    m, self.params, {"eb": self.eb_tables, "gc": self.gc_tables}
                )
            pred_frames, _ = self._sim_decoder.decompress(level)
        tgt, pred = colorres.residual_targets(frames, pred_frames, _pack_occ_keys)
        level.color_step = int(step)
        level.color_transform = True
        level.color_scale_idx, level.color_string = colorres.encode_residuals(
            m.gaussian_conditional,
            self.gc_tables,
            (tgt - pred) * 255.0,
            int(step),
            True,
        )

    def _guided_true_tables(self, frames: Sequence[dict]) -> list:
        """Upload the per-level ground-truth occupancy key tables ONCE per
        segment (shared by every guided rung — the sets depend only on the
        input frames, not the rung's latents).

        Tables upload TIGHT (uploads don't key compiles) and are padded to
        each level's static candidate capacity lazily in ``_attach_guided``
        — an eager on-device sentinel pad. Every true voxel at a level is a
        child of a true parent, so the true set always fits the candidate
        capacity, and the membership graph is then keyed ONLY on the
        candidate capacity the prewarm ladder already compiles. Bucketing
        the table by its own size instead put a (table, cand) bucket PAIR
        on the hot path — live true-set sizes land in pairs the prewarm
        never saw, and one cold membership compile costs 20-50 s mid-stream
        (measured: the first r5m campaign run staggered to 6 segments at
        35 s/segment walls)."""
        keys = _true_key_pyramid(frames, self.model.config.num_levels)
        return [
            (
                jnp.asarray((k >> np.uint64(32)).astype(np.uint32)),
                jnp.asarray((k & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            )
            for k in keys
        ]

    def _attach_guided(
        self,
        level: SegmentBitstream,
        frames: Sequence[dict],
        true_tabs: list | None = None,
        need_pred: bool = True,
    ) -> None:
        """Attach guided-occupancy streams to a latent-layout level and flip
        it to ``geometry_mode="guided"``.

        Drives the DECODER's own jitted guided pyramid
        (``SerialDecoder._guided_head`` / ``_guided_step`` /
        ``_guided_step_fam`` — same graphs, same static shapes) with
        ground-truth membership as the bit source: the candidate logits the
        streams are coded under are bit-identical to the ones the real
        decoder recomputes (same-backend structurally; cross-backend via the
        1/256 logit grid of ``pct/entropy/binary.py``). Decoded geometry is
        therefore the exact input voxel set at every level, at a rate equal
        to the occupancy heads' BCE.

        New encodes write the OC3 contract (family pyramid, candidate-index
        enumeration — pct/entropy/bitstream.py) whenever the model resolves
        ``use_family_synth``; the stream tag pins the decode profile."""
        m = self.model
        if m.config.arch != "v1":
            raise NotImplementedError("guided geometry mode requires arch v1")
        if self._sim_decoder is None:
            self._sim_decoder = SerialDecoder(
                m, self.params, {"eb": self.eb_tables, "gc": self.gc_tables}
            )
        dec = self._sim_decoder
        family = m.use_family_synth
        y_block, scales, means, y_syms, q, _ = dec._latent_phase1_host(level)
        # ground-truth occupancy key tables per synthesis level (strides
        # 2^(L-1) .. 1), device-resident — built once per SEGMENT and shared
        # across guided rungs (host_encode passes them in)
        if true_tabs is None:
            true_tabs = self._guided_true_tables(frames)
        streams: list = [None] * m.config.num_levels

        def source(lvl, n_parent, cand_c, cand_m, bins):
            n_sym = n_parent * 8
            hi_s, lo_s = true_tabs[lvl]
            cap = int(cand_m.shape[0])
            if int(hi_s.shape[0]) != cap:
                # eager on-device sentinel pad to the candidate capacity:
                # keys the membership graph on cand_cap alone (prewarmed)
                pad = cap - int(hi_s.shape[0])
                assert pad >= 0, "true set exceeds candidate capacity"
                sent = jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)
                hi_s = jnp.concatenate([hi_s, sent])
                lo_s = jnp.concatenate([lo_s, sent])
                true_tabs[lvl] = (hi_s, lo_s)  # reuse across sibling rungs
            bits_d, packed, bins_u8 = _loud_compile(
                "encode.guided_membership",
                (cap,),
                lambda: _guided_membership(hi_s, lo_s, cand_c, cand_m, bins),
            )
            packed_h, bins_h = jax.device_get((packed, bins_u8))
            bits_n = np.unpackbits(packed_h, bitorder="little")[:n_sym]
            # OC2: per-segment empirical bin calibration — rate drops to the
            # bins' empirical entropy instead of the head's (miscalibrated)
            # cross entropy, +128 B/level header
            streams[lvl] = m.binary_conditional.compress_calibrated(
                bits_n.astype(np.int32),
                bins_h[:n_sym].astype(np.int32),
            )
            # device-resident: the pyramid's next step consumes it directly,
            # no host round trip
            return bits_d

        buf, cap_out = dec._guided_pyramid(
            level, y_block, scales, means, y_syms, q, source, family=family
        )
        level.geometry_mode = "guided"
        level.occ_strings = list(streams)
        level.occ_family = family
        if not need_pred:
            return None
        # the pyramid's last level IS the decoder's color prediction at the
        # exact set — return it so a color-residual attach needn't re-decode
        coords, colors, out_mask = _unpack_synth_buf(np.asarray(jax.device_get(buf)), cap_out)
        return _split_frames(
            coords, colors / 255.0, np.ones(coords.shape[0], bool), level.num_frames
        )

    def host_encode(
        self, dev: dict, settings, frames: Sequence[dict] | None = None,
        geometry_mode: "str | Sequence[str]" = "latent", lossless_extra: bool = False,
        lossless_color_step: "int | Sequence[int]" = 0,
    ) -> tuple[list[SegmentBitstream], dict]:
        """``lossless_extra`` appends one more representation that shares the
        last setting's entropy-coded latents but carries the full-resolution
        voxel set (octree coded) — the highest-quality DASH rung at the cost
        of one extra octree encode, no extra neural work.

        ``lossless_color_step`` > 0 additionally attaches an entropy-coded
        color-residual stream to every lossless-geometry level (see
        :meth:`_attach_color_residuals`) — exact geometry AND
        quantization-bounded color at the cost of one local decode."""
        times: dict[str, float] = {}
        # per-rung geometry modes / residual steps: a scalar applies to every
        # rung (back-compat); a list configures each DASH representation
        # independently — e.g. a mixed ladder [latent, guided, guided] with
        # steps [0, 0, 12] spans lossy -> exact-geometry -> near-lossless
        modes = (
            [geometry_mode] * len(settings)
            if isinstance(geometry_mode, str)
            else list(geometry_mode)
        )
        assert len(modes) == len(settings), "one geometry mode per rung"
        assert all(m in ("latent", "guided", "lossless") for m in modes), modes
        steps = (
            [lossless_color_step] * len(settings)
            if not isinstance(lossless_color_step, (list, tuple))
            else [int(s) for s in lossless_color_step]
        )
        assert len(steps) == len(settings), "one color step per rung"
        t0 = time.time()
        z_string = self.model.entropy_bottleneck.compress_symbols(
            self.eb_tables, dev["z_syms"].T
        )
        times["factorized_model"] = time.time() - t0

        t0 = time.time()
        latent_strings = full_strings = None
        if any(m != "lossless" for m in modes):
            # stride-8 latent skeleton per frame (octree coded)
            latent_strings = []
            yc = dev["y_coords"]
            for b in range(dev["num_frames"]):
                pts = yc[yc[:, 0] == b][:, 1:] // 8
                latent_strings.append(encode_points(pts))
        if any(m == "lossless" for m in modes) or lossless_extra:
            # full-resolution voxel set per frame (octree coded); the decoder
            # derives the entire coordinate pyramid from it and synthesis
            # runs at the exact sets (no occupancy prediction)
            assert frames is not None, "lossless geometry needs the input frames"
            full_strings = [
                encode_points(np.unique(np.asarray(fr["points"], np.int32), axis=0))
                for fr in frames
            ]
        times["geometry_compression"] = time.time() - t0

        gc = self.model.gaussian_conditional
        levels = []
        times["gaussian_model"] = times["bitstream_writing"] = 0.0
        ks = dev["ks"]
        for qi, q in enumerate(settings):
            t0 = time.time()
            y_string = gc.compress_symbols(
                self.gc_tables,
                dev["y_syms"][qi].ravel(),
                dev["y_idxs"][qi].astype(np.int32).ravel(),
            )
            times["gaussian_model"] += time.time() - t0
            t0 = time.time()
            levels.append(
                SegmentBitstream(
                    q_g=float(q[0]),
                    q_a=float(q[1]),
                    y_shape=dev["ny"],
                    z_shape=dev["nz"],
                    y_string=y_string,
                    z_string=z_string,
                    gpcc_strings=(
                        full_strings if modes[qi] == "lossless" else latent_strings
                    ),
                    ks=[
                        tuple(int(ks[l, b]) for l in range(ks.shape[0]))
                        for b in range(dev["num_frames"])
                    ],
                    geometry_mode="lossless" if modes[qi] == "lossless" else "latent",
                )
            )
            times["bitstream_writing"] += time.time() - t0
        guided_preds: dict[int, list] = {}
        if any(m == "guided" for m in modes):
            # entropy-code every candidate child's true occupancy bit under
            # the decoder's own predicted probabilities: decoded geometry
            # becomes exact (see _attach_guided)
            assert frames is not None, "guided geometry needs the input frames"
            t0 = time.time()
            true_tabs = self._guided_true_tables(frames)
            for qi, (lv, m) in enumerate(zip(levels, modes)):
                if m == "guided":
                    # the decoded prediction is only needed when this rung
                    # carries a color-residual tail — skip the synthesis
                    # buffer download otherwise
                    pred = self._attach_guided(
                        lv, frames, true_tabs=true_tabs, need_pred=steps[qi] > 0
                    )
                    if pred is not None:
                        guided_preds[id(lv)] = pred
            times["occupancy_coding"] = time.time() - t0
        if lossless_extra and modes[-1] != "lossless":
            last = levels[-1]
            levels.append(
                SegmentBitstream(
                    q_g=last.q_g,
                    q_a=last.q_a,
                    y_shape=last.y_shape,
                    z_shape=last.z_shape,
                    y_string=last.y_string,
                    z_string=last.z_string,
                    gpcc_strings=full_strings,
                    ks=last.ks,
                    geometry_mode="lossless",
                )
            )
            steps = steps + [steps[-1]]
        if any(steps):
            t0 = time.time()
            for lv, step in zip(levels, steps):
                # every rung supports the residual stream: exact-geometry
                # rungs correct true voxel colors; latent rungs correct the
                # decoded top-k set (exact color on hits, cell mean on
                # misses) at the cost of one local simulated decode
                if step > 0:
                    assert frames is not None, "color residuals need the input frames"
                    self._attach_color_residuals(
                        lv, frames, step, pred_frames=guided_preds.get(id(lv))
                    )
            times["gaussian_model"] += time.time() - t0
        return levels, times

    def compress(
        self,
        frames: Sequence[dict],
        settings: Sequence[Sequence[float]],
        geometry_mode: "str | Sequence[str]" = "latent",
        lossless_extra: bool = False,
        lossless_color_step: "int | Sequence[int]" = 0,
    ):
        """Returns ``(levels: list[SegmentBitstream], sideinfo: dict)``.

        ``geometry_mode="lossless"`` transmits the full-resolution voxel set
        (octree coded) instead of the stride-8 latent skeleton: decoded
        geometry is exact and synthesis evaluates at the true sets.

        ``geometry_mode="guided"`` keeps the latent layout but entropy-codes
        every candidate child's true occupancy bit under the synthesis
        heads' predicted probabilities (see :meth:`_attach_guided`): decoded
        geometry is exact like "lossless", at the learned-model rate instead
        of the octree rate (the reference's top-k pruning,
        ``receiver/decoder/codec_parallel.py:465-472``, is lossy in which
        voxels survive — this mode removes that loss class entirely).

        ``time_measurements``: E2/E4 (hyper analysis/synthesis) run fused
        inside the E1 device graph; the measured device wall is attributed
        across E1/E2/E4 by the modeled MAC split (``_device_step_fractions``)
        so the stacked step bars are comparable in kind to the reference's
        CSVs. The three steps sum to exactly the measured device wall."""
        t_codec_start = time.time()
        t0 = time.time()
        dev = self.device_encode(frames, settings)
        t_device = time.time() - t0
        levels, times = self.host_encode(
            dev, settings, frames, geometry_mode, lossless_extra, lossless_color_step
        )
        # modeled split of the fused device graph across E1/E2/E4 (see
        # _device_step_fractions): the step sum stays exactly t_device
        f_a, f_ha, f_hs = dev.get("step_fracs", (1.0, 0.0, 0.0))
        times.update({
            "analysis": t_device * f_a,
            "hyper_analysis": t_device * f_ha,
            "hyper_synthesis": t_device * f_hs,
        })

        total_bytes = sum(lv.num_bytes() for lv in levels)
        sideinfo = {
            "num_points": dev["num_points"],
            "gop_info": {
                "bpp": total_bytes * 8 / max(dev["num_points"], 1) / max(len(settings), 1),
                "num_frames": dev["num_frames"],
            },
            "time_measurements": times,
            "timestamps": {"codec_start": t_codec_start, "codec_end": time.time()},
        }
        return levels, sideinfo

    def compress_bytes(self, frames, settings, geometry_mode: str = "latent"):
        levels, sideinfo = self.compress(frames, settings, geometry_mode)
        return pack_segment(levels), sideinfo


class SerialDecoder:
    """decompress(data) -> (frames, sideinfo) — the
    ``DecompressionPipeline.decompress`` surface (reference
    ``receiver/decoder/codec_single.py:44``)."""

    def __init__(
        self,
        model: ColorModel,
        params: Params,
        tables: dict | None = None,
        cap_mode: str = "tier",
    ):
        self.model = model
        self.params = params
        self.eb_tables = (tables or {}).get("eb") or model.entropy_bottleneck.update(
            params["entropy_bottleneck"]
        )
        self.gc_tables = (tables or {}).get("gc") or model.gaussian_conditional.update()
        # binary occupancy tables are checkpoint-independent (64 fixed
        # logit bins) — built locally, never shipped
        self.bc_tables = model.binary_conditional.update()
        # synthesis capacity policy (see _synth_caps): "tier" for a live
        # ladder (one graph family per encode tier), "counted" for offline /
        # large-scale decode (tight per-level buckets, bit-identical output)
        assert cap_mode in ("tier", "counted"), cap_mode
        self.cap_mode = cap_mode

    def __hash__(self):
        return hash((type(self).__name__, self.model.config))

    def __eq__(self, other):
        return type(other) is type(self) and other.model.config == self.model.config

    # ------------------------------------------------------------------
    # device phase 1: coords -> hyper params -> coding indexes
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "cap_z"))
    def _phase1(self, params, coords, mask, z_syms, q, cap_z=None):
        """``coords``/``z_syms`` must be padded to the ENCODER's static y/z
        capacities (see :meth:`encoder_caps`): running hyper-synthesis under
        the exact shapes the encoder used makes the derived (scale, mean,
        index) values bit-identical on the same backend — a different padding
        could tile the matmuls differently and flip a rounded value on a grid
        boundary, desynchronizing the rANS stream (ADVICE round-1)."""
        m = self.model
        cdim = m.config.latent_channels
        cap = coords.shape[0]
        y = canonicalize(coords, jnp.zeros((cap, cdim), jnp.float32), mask).with_stride(8)
        z = m.derive_z_coords(y)
        if cap_z is not None:
            z = _static_truncate(z, cap_z)
        med = m.entropy_bottleneck.medians(params["entropy_bottleneck"])
        zf = jnp.zeros((z.capacity, med.shape[0]), jnp.float32)
        zf = zf.at[: z_syms.shape[0]].set(z_syms.astype(jnp.float32))
        zf = jnp.where(z.mask[:, None], zf + med[None, :], 0.0)
        z = SparseBlock(coords=z.coords, feats=zf, mask=z.mask, stride=z.stride)

        scales, means = m.h_s(params, z, y.coords, y.mask)
        s_codes = m.gaussian_conditional.quantize_scales(scales)
        scales = s_codes.astype(jnp.float32) / PARAM_GRID  # grid scales (offsets path)
        means = jnp.round(means * PARAM_GRID) / PARAM_GRID
        gain = m.scale_nn(params, q)
        g_codes = m.gaussian_conditional.quantize_gain(gain)
        idx = m.gaussian_conditional.build_indexes_from_codes(
            s_codes, g_codes[None, :]
        ).astype(jnp.uint8)
        return y, scales, means, idx

    # ------------------------------------------------------------------
    # multi-rate batched decode: all quality representations in one pass
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "cap_z", "nq"))
    def _phase1_multi(self, params, coords, mask, z_syms, qs, cap_z, nq):
        """Like :meth:`_phase1` but derives coding indexes for ``nq``
        quality vectors in one graph — hyper synthesis (the expensive part)
        runs once, only the gain/index math repeats per q."""
        m = self.model
        cdim = m.config.latent_channels
        cap = coords.shape[0]
        y = canonicalize(coords, jnp.zeros((cap, cdim), jnp.float32), mask).with_stride(8)
        z = m.derive_z_coords(y)
        z = _static_truncate(z, cap_z)
        med = m.entropy_bottleneck.medians(params["entropy_bottleneck"])
        zf = jnp.zeros((z.capacity, med.shape[0]), jnp.float32)
        zf = zf.at[: z_syms.shape[0]].set(z_syms.astype(jnp.float32))
        zf = jnp.where(z.mask[:, None], zf + med[None, :], 0.0)
        z = SparseBlock(coords=z.coords, feats=zf, mask=z.mask, stride=z.stride)
        scales, means = m.h_s(params, z, y.coords, y.mask)
        s_codes = m.gaussian_conditional.quantize_scales(scales)
        scales = s_codes.astype(jnp.float32) / PARAM_GRID
        means = jnp.round(means * PARAM_GRID) / PARAM_GRID
        idxs = []
        for i in range(nq):
            gain = m.scale_nn(params, qs[i])
            g_codes = m.gaussian_conditional.quantize_gain(gain)
            idxs.append(
                m.gaussian_conditional.build_indexes_from_codes(
                    s_codes, g_codes[None, :]
                ).astype(jnp.uint8)
            )
        return y, scales, means, jnp.stack(idxs)

    @functools.partial(jax.jit, static_argnames=("self", "level_capacities"))
    def _phase2_multi(self, params, y_block, scales, means, y_syms_q, qs, ks, level_capacities):
        """vmap of the dequant+synthesis over the quality axis — one device
        dispatch decodes every representation (multi-rate decode batching,
        the decoder analog of the encoder's per-q fused loop)."""

        def one(y_syms, q):
            return self._phase2_body(params, y_block, scales, means, y_syms, q, ks, level_capacities)

        return jax.vmap(one)(y_syms_q, qs)

    def _phase2_body(self, params, y_block, scales, means, y_syms, q, ks, level_capacities):
        m = self.model
        y_hat = self._dequant_y(params, y_block.mask, scales, means, y_syms, q)
        rgb = m.g_s(params, y_block.with_feats(y_hat), ks, level_capacities)
        coords16 = rgb.coords.astype(jnp.int16)
        colors8 = jnp.clip(jnp.round(rgb.feats * 255.0), 0, 255).astype(jnp.uint8)
        return jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(coords16.reshape(-1), jnp.uint8).reshape(-1),
                colors8.reshape(-1),
                rgb.mask.astype(jnp.uint8),
            ]
        )

    # Max representations fused into one batched decode graph; larger
    # batches decode in chunks of this. History: a 5-way vmapped synthesis
    # graph crashed the v5e worker in round 3 ("TPU worker process
    # crashed"), so this was capped at 3. The round-5 subprocess-isolated
    # bisect (scripts/repro_fused5.py, evaluation/r5/fused5_sweep.jsonl) ran
    # nq = 3..6 at 15k and 76k points on the v5e and every cell passed —
    # the trigger died with the round-3 per-level sum-bucket capacity
    # scheme (replaced by the tier scheme + fixed fractional caps in round
    # 4, which shrank the vmapped graph family the crash lived in). Set to
    # the highest swept count; the chunking stays as the safety valve for
    # wider ladders.
    MAX_FUSED_LEVELS = 6

    def decompress_levels(self, levels: Sequence[SegmentBitstream | bytes]):
        """Decode EVERY quality representation of one segment in one batched
        device pass. All levels must share geometry (same GOP: same
        gpcc_strings/ks/y_shape/z_shape — true for the encoder's per-q
        levels). Returns ``(frames_per_level, sideinfo)``."""
        t_codec_start = time.time()
        levels = [
            SegmentBitstream.unpack(bytes(lv)) if isinstance(lv, (bytes, bytearray)) else lv
            for lv in levels
        ]
        lv0 = levels[0]
        assert all(
            lv.y_shape == lv0.y_shape and lv.z_shape == lv0.z_shape and lv.ks == lv0.ks
            for lv in levels
        ), "decompress_levels requires a shared-geometry GOP"
        # Lossless-geometry rungs carry full-resolution voxel sets in their
        # gpcc strings — they must NEVER be decoded against lv0's stride-8
        # latent skeleton (they share ks/y_shape with their sibling latent
        # rungs, so the assert above cannot catch them). Route each through
        # the dedicated lossless decode and batch only the latent rungs.
        ll_idx = [i for i, lv in enumerate(levels) if lv.geometry_mode != "latent"]
        if ll_idx:
            outs: list = [None] * len(levels)
            for i in ll_idx:
                outs[i] = self.decompress(levels[i])[0]
            lat_idx = [i for i in range(len(levels)) if i not in ll_idx]
            if lat_idx:
                lat_outs, _ = self.decompress_levels([levels[i] for i in lat_idx])
                for j, i in enumerate(lat_idx):
                    outs[i] = lat_outs[j]
            return outs, {"num_levels": len(levels)}
        if len(levels) > self.MAX_FUSED_LEVELS:
            outs = []
            for i in range(0, len(levels), self.MAX_FUSED_LEVELS):
                chunk, _ = self.decompress_levels(levels[i : i + self.MAX_FUSED_LEVELS])
                outs.extend(chunk)
            return outs, {"num_levels": len(levels)}
        num_frames = lv0.num_frames
        coords = []
        for b, g in enumerate(lv0.gpcc_strings):
            pts = decode_points(g) * 8
            coords.append(
                np.concatenate([np.full((pts.shape[0], 1), b, np.int32), pts], axis=1)
            )
        coords = np.concatenate(coords, axis=0)
        ny = lv0.y_shape
        ny_cap, nz_cap = self.encoder_caps(lv0)
        mask = np.concatenate([np.ones(ny, bool), np.zeros(ny_cap - ny, bool)])
        coords = np.concatenate([coords, np.zeros((ny_cap - ny, 4), np.int32)], axis=0)
        nz = lv0.z_shape
        z_syms = self.model.entropy_bottleneck.decompress_symbols(
            self.eb_tables, lv0.z_string, nz
        ).T.astype(np.int16)
        z_syms = np.concatenate(
            [z_syms, np.zeros((nz_cap - nz, z_syms.shape[1]), np.int16)], axis=0
        )

        qs = jnp.asarray([[lv.q_g, lv.q_a] for lv in levels], jnp.float32)
        y_block, scales, means, idxs = _loud_compile(
            "decode.phase1_multi",
            (ny_cap, nz_cap, len(levels)),
            lambda: self._phase1_multi(
                self.params,
                jnp.asarray(coords),
                jnp.asarray(mask),
                jnp.asarray(z_syms),
                qs,
                nz_cap,
                len(levels),
            ),
        )
        idxs_np = np.asarray(idxs)
        y_syms_q = np.zeros((len(levels), ny_cap, idxs_np.shape[-1]), np.int16)
        for qi, lv in enumerate(levels):
            y_syms_q[qi, :ny] = self.model.gaussian_conditional.decompress(
                self.gc_tables, lv.y_string, idxs_np[qi, :ny].astype(np.int32)
            ).astype(np.int16)

        ks = np.asarray(lv0.ks, np.int32).T
        caps = _synth_caps(self.model, ks, self.cap_mode)
        bufs = np.asarray(
            jax.device_get(
                _loud_compile(
                    "decode.phase2_multi",
                    (ny_cap, caps, len(levels)),
                    lambda: self._phase2_multi(
                        self.params,
                        y_block,
                        scales,
                        means,
                        self._device_syms(y_syms_q),
                        qs,
                        jnp.asarray(ks),
                        caps,
                    ),
                )
            )
        )
        cap_out = caps[-1]
        out = []
        for qi in range(len(levels)):
            buf = bufs[qi]
            coords16 = buf[: cap_out * 8].view(np.int16).reshape(cap_out, 4)
            colors8 = buf[cap_out * 8 : cap_out * 11].reshape(cap_out, 3)
            out_mask = buf[cap_out * 11 :].astype(bool)
            out.append(
                _split_frames(
                    coords16.astype(np.int32),
                    colors8.astype(np.float32) / 255.0,
                    out_mask,
                    num_frames,
                )
            )
        sideinfo = {
            "timestamps": {"codec_start": t_codec_start, "codec_end": time.time()},
            "num_levels": len(levels),
        }
        return out, sideinfo

    @functools.partial(jax.jit, static_argnames=("self", "level_capacities"))
    def _phase2(self, params, y_block, scales, means, y_syms, q, ks, level_capacities):
        # one uint8 buffer -> one device->host round trip
        return self._phase2_body(
            params, y_block, scales, means, y_syms, q, ks, level_capacities
        )

    @functools.partial(jax.jit, static_argnames=("self",))
    def _expand_syms(self, y8, exc_idx, exc_val):
        """int8 symbol plane + sparse int16 exceptions -> int16 device plane.

        The decoded Gaussian symbol plane is the largest host->device upload
        of a latent decode (ny x C x int16 ~= 19 MB at vox10 scale) and the
        relay-attached bench rig moves host<->device bytes at ~30 MB/s, so
        the transfer — not compute — was the decode wall's second term
        (PERF.md round 5). Symbols are overwhelmingly in [-127, 127]
        (entropy ~2-3 bits); upload the int8 plane plus a short exception
        list and expand on device. Bit-exact: the plane carries a sentinel
        at exception positions only for debuggability — the scatter
        overwrites them with the true int16 values."""
        plane = y8.astype(jnp.int16).reshape(-1)
        flat = jnp.where(exc_idx >= 0, exc_idx, plane.shape[0])
        plane = plane.at[flat].set(exc_val, mode="drop")
        return plane.reshape(y8.shape)

    def _device_syms(self, y_syms: np.ndarray):
        """Host int16 symbol plane -> device int16 plane via the int8+
        exceptions upload (see :meth:`_expand_syms`)."""
        small = (y_syms >= -127) & (y_syms <= 127)
        n_exc = int((~small).sum())
        exc_cap = int(bucket_size(max(n_exc, 1), minimum=64))
        flat_idx = np.full((exc_cap,), -1, np.int32)
        vals = np.zeros((exc_cap,), np.int16)
        if n_exc:
            pos = np.nonzero(~small.reshape(-1))[0].astype(np.int32)
            flat_idx[:n_exc] = pos
            vals[:n_exc] = y_syms.reshape(-1)[pos]
        plane8 = np.where(small, y_syms, -128).astype(np.int8)
        return self._expand_syms(
            jnp.asarray(plane8), jnp.asarray(flat_idx), jnp.asarray(vals)
        )

    @staticmethod
    def encoder_caps(level: SegmentBitstream) -> tuple[int, int]:
        """Reconstruct the ENCODER's static (y, z) capacities from the
        bitstream alone: ``sum(ks[stride-1])`` is the input point count, so
        the input bucket, the fractional level caps, and the overflow
        predicate (``SerialEncoder.device_encode``) can all be mirrored
        exactly — decoder hyper-synthesis then runs the same static shapes
        the encoder used."""
        ks = np.asarray(level.ks, np.int32)  # [B, L] coarse->fine
        num_points = int(ks[:, -1].sum())
        cap = bucket_size(num_points)
        level_caps, cap_z = _caps_for(cap)
        overflow = (
            int(ks[:, 1].sum()) >= level_caps[0]
            or int(ks[:, 0].sum()) >= level_caps[1]
            or level.y_shape >= level_caps[2]
            or level.z_shape >= cap_z
        )
        if overflow:
            return cap, cap
        return level_caps[-1], cap_z

    # ------------------------------------------------------------------
    # guided-occupancy mode: explicit child-occupancy coding
    # ------------------------------------------------------------------
    #
    # Instead of top-k pruning to the transmitted k counts (lossy in WHICH
    # voxels survive — strict-decode hit rate is the product of per-level
    # top-k recalls), every candidate child's true occupancy bit is entropy-
    # coded under sigmoid(occupancy-head logit) (pct/entropy/binary.py).
    # Because the stride-8 skeleton is transmitted exactly, induction makes
    # the decoded set equal the true set at EVERY level: hit rate 1.0, at a
    # rate equal to the heads' BCE (what training minimizes). Same-backend
    # parity is structural: the encoder produces the streams by driving
    # these same jitted stage functions with ground-truth membership as the
    # bit source (SerialEncoder._attach_guided), so both sides compute
    # bit-identical logits; cross-backend, logits round onto a 1/256 grid
    # before int32 binning (the gaussian.py two-mechanism scheme).

    def _dequant_y(self, params, y_mask, scales, means, y_syms, q):
        return _dequant_y_core(self.model, params, y_mask, scales, means, y_syms, q)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _guided_head(self, params, y_block, scales, means, y_syms, q):
        """y-hat dequantization + level-0 candidate logits (stride 8 -> 4).
        The guided path pins float32: logits are parity-critical inputs to
        the occupancy bitstream."""
        return _guided_head_core(
            self.model, params, y_block, scales, means, y_syms, q
        )

    @functools.partial(
        jax.jit, static_argnames=("self", "cap_next", "level", "stride")
    )
    def _guided_step(
        self, params, p_coords, p_feats, p_mask, p_kidx, p_kfound, cand_coords,
        cand_mask, bits, cap_next, level, stride,
    ):
        """Select level-``level`` children by their decoded occupancy bits,
        materialize their features (parent premultiply gather + 27-tap conv),
        and emit the next level's candidate logits — or, at the last level,
        the packed [int16 coords ⧺ uint8 colors ⧺ mask] output buffer.

        ``(p_kidx, p_kfound)`` is the parent grid's kernel map: with
        ``derived_maps`` the child map comes from octree derivation
        (no merge-join sort) and each survivor's features gather directly at
        its pre-sort (parent row, slot) index — both bit-identical to the
        searched path (the logits are parity-critical coding inputs)."""
        return _guided_step_core(
            self.model, params, p_coords, p_feats, p_mask, p_kidx, p_kfound,
            cand_coords, cand_mask, bits, cap_next, level, stride,
        )

    @functools.partial(
        jax.jit, static_argnames=("self", "cap_next", "level", "stride")
    )
    def _guided_step_fam(
        self, params, x_coords, x_feats, x_mask, xk_idx, xk_found, cand_coords,
        cand_mask, bits, cap_next, level, stride,
    ):
        """OC3 family-form guided step — see ``_guided_step_fam_core``."""
        return _guided_step_fam_core(
            self.model, params, x_coords, x_feats, x_mask, xk_idx, xk_found,
            cand_coords, cand_mask, bits, cap_next, level, stride,
        )

    def _guided_pyramid(
        self, level, y_block, scales, means, y_syms, q, bit_source,
        family: bool = False,
    ):
        """Drive the guided synthesis pyramid. ``bit_source(lvl, n_parent,
        cand_coords, cand_mask, bins) -> bool [8 * parent_cap]`` supplies
        each level's occupancy bits — rANS decode on the decoder, ground
        -truth membership on the encoder (which also captures the streams).
        ``family`` selects the OC3 wire contract (candidate-index
        enumeration + family-form convs); False is the legacy OC1/OC2
        contract (parent-grid canonical enumeration, classic convs) — old
        published media keeps decoding bit-exactly. Returns the packed
        last-level buffer and its static capacity."""
        m = self.model
        ks = np.asarray(level.ks, np.int32).T  # [L, B]
        caps = _synth_caps(m, ks, self.cap_mode)
        ny_cap = y_block.capacity
        y_hat, cand_c, cand_m, bins, pk_idx, pk_found = _loud_compile(
            "decode.guided_head",
            (ny_cap,),
            lambda: self._guided_head(self.params, y_block, scales, means, y_syms, q),
        )
        p_coords, p_feats, p_mask = y_block.coords, y_hat, y_block.mask
        n_parent = int(level.y_shape)
        stride = 8
        counts = [int(ks[l].sum()) for l in range(ks.shape[0])]
        for lvl in range(m.config.num_levels):
            bits = bit_source(lvl, n_parent, cand_c, cand_m, bins)
            if family:
                out = _loud_compile(
                    "decode.guided_step_fam",
                    (lvl, cand_c.shape[0], caps[lvl]),
                    lambda: self._guided_step_fam(
                        self.params, p_coords, p_feats, p_mask, pk_idx, pk_found,
                        cand_c, cand_m, jnp.asarray(bits), caps[lvl], lvl, stride,
                    ),
                )
            else:
                out = _loud_compile(
                    "decode.guided_step",
                    (lvl, cand_c.shape[0], caps[lvl]),
                    lambda: self._guided_step(
                        self.params, p_coords, p_feats, p_mask, pk_idx, pk_found,
                        cand_c, cand_m, jnp.asarray(bits), caps[lvl], lvl, stride,
                    ),
                )
            if lvl == m.config.num_levels - 1:
                return out, caps[lvl]
            p_coords, p_feats, p_mask, pk_idx, pk_found, cand_c, cand_m, bins = (
                out if family
                else (out[0], out[1], out[2], out[6], out[7], out[3], out[4], out[5])
            )
            n_parent = counts[lvl]
            stride //= 2

    def _decompress_guided(self, level: SegmentBitstream, t_codec_start, t_read):
        m = self.model
        assert len(level.occ_strings) == m.config.num_levels, "missing occupancy streams"
        y_block, scales, means, y_syms, q, times = self._latent_phase1_host(level)

        t0 = time.time()
        bc_tables = self.bc_tables

        def source(lvl, n_parent, cand_c, cand_m, bins):
            n_sym = n_parent * 8
            idx = np.asarray(bins)[:n_sym]
            if level.occ_calibrated:
                syms = m.binary_conditional.decompress_calibrated(
                    level.occ_strings[lvl], idx
                )
            else:  # OC1: static bin-center tables (pre-round-4 media)
                syms = m.binary_conditional.decompress(
                    bc_tables, level.occ_strings[lvl], idx
                )
            bits = np.zeros(int(cand_m.shape[0]), bool)
            bits[:n_sym] = syms.astype(bool)
            return bits

        buf, cap_out = self._guided_pyramid(
            level, y_block, scales, means, y_syms, q, source,
            family=level.occ_family,
        )
        coords, colors, out_mask = _unpack_synth_buf(
            np.asarray(jax.device_get(buf)), cap_out
        )
        if level.color_step > 0:
            colors = self._apply_color_residuals(level, colors)
        frames = _split_frames(
            coords, colors / 255.0, np.ones(coords.shape[0], bool), level.num_frames
        )
        t_synth = time.time() - t0
        sideinfo = {
            "time_measurements": {
                "bitstream_reading": t_read,
                **times,
                "synthesis_transform": t_synth,
            },
            "timestamps": {"codec_start": t_codec_start, "codec_end": time.time()},
        }
        return frames, sideinfo

    @functools.partial(jax.jit, static_argnames=("self",))
    def _phase2_lossless(
        self, params, y_block, scales, means, y_syms, q, c4, m4, c2, m2, c1, m1
    ):
        """Dequant + synthesis at the exact (transmitted) coordinate pyramid;
        returns only the uint8 colors — geometry is already on the host."""
        m = self.model
        y_hat = self._dequant_y(params, y_block.mask, scales, means, y_syms, q)
        rgb = m.g_s_at(
            params,
            y_block.with_feats(y_hat),
            [(c4, m4), (c2, m2), (c1, m1)],
        )
        return jnp.clip(jnp.round(rgb.feats * 255.0), 0, 255).astype(jnp.uint8)

    def _decompress_lossless(self, level: SegmentBitstream, t_codec_start, t_read):
        """Lossless-geometry decode: the gpcc strings carry the full
        stride-1 voxel sets; the whole coordinate pyramid (and the y/z
        anchors) derives from them exactly, so reconstruction geometry is
        bit-exact and only colors are synthesized."""
        num_frames = level.num_frames
        t0 = time.time()
        sets1 = []
        for b, g in enumerate(level.gpcc_strings):
            pts = decode_points(g)
            sets1.append(
                np.concatenate([np.full((pts.shape[0], 1), b, np.int32), pts], axis=1)
            )
        s1 = np.concatenate(sets1, axis=0)
        order = np.lexsort((s1[:, 3], s1[:, 2], s1[:, 1], s1[:, 0]))
        s1 = s1[order]

        def down(c, f):
            d = c.copy()
            d[:, 1:] = (d[:, 1:] // f) * f
            return np.unique(d, axis=0)  # unique is lexsorted = canonical

        s2, s4, s8 = down(s1, 2), down(s1, 4), down(s1, 8)
        t_geometry = time.time() - t0

        ks = np.asarray(level.ks, np.int32)  # [B, 3] coarse->fine
        assert s1.shape[0] == int(ks[:, 2].sum()) and s8.shape[0] == level.y_shape, (
            "geometry/bitstream mismatch"
        )

        # z decode + phase 1 at the encoder's static shapes
        t0 = time.time()
        ny = level.y_shape
        ny_cap, nz_cap = self.encoder_caps(level)
        mask = np.zeros(ny_cap, bool)
        mask[:ny] = True
        y_coords = np.concatenate([s8, np.zeros((ny_cap - ny, 4), np.int32)], axis=0)
        nz = level.z_shape
        z_syms = self.model.entropy_bottleneck.decompress_symbols(
            self.eb_tables, level.z_string, nz
        ).T.astype(np.int16)
        z_syms = np.concatenate(
            [z_syms, np.zeros((nz_cap - nz, z_syms.shape[1]), np.int16)], axis=0
        )
        t_factorized = time.time() - t0
        t0 = time.time()
        q = jnp.asarray([level.q_g, level.q_a], jnp.float32)
        y_block, scales, means, idx_dev = self._phase1(
            self.params,
            jnp.asarray(y_coords),
            jnp.asarray(mask),
            jnp.asarray(z_syms),
            q,
            cap_z=nz_cap,
        )
        idx = np.asarray(idx_dev)
        t_hyper = time.time() - t0

        t0 = time.time()
        symbols = self.model.gaussian_conditional.decompress(
            self.gc_tables, level.y_string, idx[:ny].astype(np.int32)
        ).astype(np.int16)
        y_syms = np.concatenate(
            [symbols, np.zeros((ny_cap - ny, symbols.shape[1]), np.int16)], axis=0
        )
        t_gaussian = time.time() - t0

        # synthesis at the exact pyramid
        t0 = time.time()

        def padded(c):
            cap = bucket_size(c.shape[0])
            m = np.zeros(cap, bool)
            m[: c.shape[0]] = True
            cpad = np.full((cap, 4), -1, np.int32)
            from pct.sparse.block import PAD_COORD

            cpad[:] = np.asarray(PAD_COORD, np.int32)[None, :]
            cpad[: c.shape[0]] = c
            return jnp.asarray(cpad), jnp.asarray(m)

        c4, m4 = padded(s4)
        c2, m2 = padded(s2)
        c1, m1 = padded(s1)
        colors8 = np.asarray(
            jax.device_get(
                self._phase2_lossless(
                    self.params, y_block, scales, means, self._device_syms(y_syms), q,
                    c4, m4, c2, m2, c1, m1,
                )
            )
        )
        n1 = s1.shape[0]
        colors = colors8[:n1].astype(np.float32)
        if level.color_step > 0:
            # color-residual stream: quantized (true - predicted) colors in
            # the same canonical voxel order (SerialEncoder._attach_color_residuals)
            colors = self._apply_color_residuals(level, colors)
        frames = _split_frames(
            s1,
            colors / 255.0,
            np.ones(n1, bool),
            num_frames,
        )
        t_synth = time.time() - t0
        sideinfo = {
            "time_measurements": {
                "bitstream_reading": t_read,
                "geometry_decompression": t_geometry,
                "factorized_model": t_factorized,
                "hyper_synthesis": t_hyper,
                "guassian_model": t_gaussian,  # (sic) reference CSV schema
                "synthesis_transform": t_synth,
            },
            "timestamps": {"codec_start": t_codec_start, "codec_end": time.time()},
        }
        return frames, sideinfo

    def _latent_phase1_host(self, level: SegmentBitstream):
        """Shared D2-D5 front half of a latent-layout decode: geometry ->
        z decode -> hyper synthesis/indexes -> Gaussian symbol decode.
        Returns ``(y_block, scales, means, y_syms [padded], q, times)``."""
        # D2 geometry decode -> batched y coords (canonical sort on device)
        t0 = time.time()
        coords = []
        for b, g in enumerate(level.gpcc_strings):
            pts = decode_points(g) * 8
            coords.append(
                np.concatenate([np.full((pts.shape[0], 1), b, np.int32), pts], axis=1)
            )
        coords = np.concatenate(coords, axis=0)
        assert coords.shape[0] == level.y_shape, "geometry/bitstream mismatch"
        ny = level.y_shape
        ny_cap, nz_cap = self.encoder_caps(level)
        pad = ny_cap - ny
        mask = np.concatenate([np.ones(ny, bool), np.zeros(pad, bool)])
        coords = np.concatenate([coords, np.zeros((pad, 4), np.int32)], axis=0)
        t_geometry = time.time() - t0

        # D3 factorized decode (host rANS -> device)
        t0 = time.time()
        nz = level.z_shape
        z_syms = self.model.entropy_bottleneck.decompress_symbols(
            self.eb_tables, level.z_string, nz
        ).T.astype(np.int16)  # [nz, Cz]
        z_syms = np.concatenate(
            [z_syms, np.zeros((nz_cap - nz, z_syms.shape[1]), np.int16)], axis=0
        )
        t_factorized = time.time() - t0

        # D4 hyper synthesis + indexes (device phase 1)
        t0 = time.time()
        q = jnp.asarray([level.q_g, level.q_a], jnp.float32)
        y_block, scales, means, idx_dev = _loud_compile(
            "decode.phase1",
            (ny_cap, nz_cap),
            lambda: self._phase1(
                self.params,
                jnp.asarray(coords),
                jnp.asarray(mask),
                jnp.asarray(z_syms),
                q,
                cap_z=nz_cap,
            ),
        )
        idx = np.asarray(idx_dev)
        t_hyper = time.time() - t0

        # D5 Gaussian decode (host rANS) -> device symbols
        t0 = time.time()
        symbols = self.model.gaussian_conditional.decompress(
            self.gc_tables, level.y_string, idx[:ny].astype(np.int32)
        ).astype(np.int16)
        y_syms = np.concatenate(
            [symbols, np.zeros((ny_cap - ny, symbols.shape[1]), np.int16)], axis=0
        )
        # int8 + exceptions upload: halves the largest host->device transfer
        y_syms = self._device_syms(y_syms)
        t_gaussian = time.time() - t0
        times = {
            "geometry_decompression": t_geometry,
            "factorized_model": t_factorized,
            "hyper_synthesis": t_hyper,
            "guassian_model": t_gaussian,  # (sic) reference CSV schema
        }
        return y_block, scales, means, y_syms, q, times

    def _apply_color_residuals(self, level: SegmentBitstream, colors_255: np.ndarray):
        """Decode and add the CR tail's residuals to ``colors_255`` (float
        0-255, valid decoded voxels in canonical order — the exact order the
        encoder's simulated decode produced). CR2 residuals are rotated back
        from the opponent basis; CR1 (round-3 media) are raw RGB."""
        from pct.entropy import colorres

        res = colorres.decode_residuals(
            self.model.gaussian_conditional,
            self.gc_tables,
            level.color_string,
            level.color_scale_idx,
            colors_255.shape[0],
            level.color_step,
            level.color_transform,
        )
        return np.clip(np.round(colors_255 + res), 0, 255)

    def decompress(self, level: SegmentBitstream | bytes):
        t_codec_start = time.time()
        t0 = time.time()
        if isinstance(level, (bytes, bytearray)):
            # one representation blob, as stored per ID{q} segment file
            level = SegmentBitstream.unpack(bytes(level))
        t_read = time.time() - t0
        if level.geometry_mode == "lossless":
            return self._decompress_lossless(level, t_codec_start, t_read)
        if level.geometry_mode == "guided":
            return self._decompress_guided(level, t_codec_start, t_read)
        front = self._latent_phase1_host(level)
        return self._latent_phase2_host(level, front, t_read, t_codec_start)

    def _latent_phase2_host(
        self,
        level: SegmentBitstream,
        front,
        t_read: float,
        t_codec_start: float | None = None,
    ):
        """D6 back half of a latent decode: synthesis with per-frame top-k.
        Split from :meth:`_latent_phase1_host` so the pipelined decoder can
        overlap segment n's device synthesis with segment n+1's host entropy
        decode (reference codec_parallel.py's 4-thread overlap)."""
        if t_codec_start is None:
            t_codec_start = time.time()
        num_frames = level.num_frames
        y_block, scales, means, y_syms, q, times = front

        # D6 synthesis with per-frame top-k pruning
        t0 = time.time()
        ks = np.asarray(level.ks, np.int32).T  # [L, B]
        caps = _synth_caps(self.model, ks, self.cap_mode)
        buf = np.asarray(
            jax.device_get(
                _loud_compile(
                    "decode.phase2",
                    (y_block.capacity, caps),
                    lambda: self._phase2(
                        self.params,
                        y_block,
                        scales,
                        means,
                        y_syms,  # device plane (see _device_syms)
                        q,
                        jnp.asarray(ks),
                        caps,
                    ),
                )
            )
        )
        cap_out = caps[-1]
        coords16 = buf[: cap_out * 8].view(np.int16).reshape(cap_out, 4)
        colors8 = buf[cap_out * 8 : cap_out * 11].reshape(cap_out, 3)
        out_mask = buf[cap_out * 11 :].astype(bool)
        colors_f = colors8.astype(np.float32)
        if level.color_step > 0:
            # latent-rung residual correction: valid rows of the canonical
            # buffer, in order — identical to the encoder's simulated decode
            colors_f[out_mask] = self._apply_color_residuals(
                level, colors_f[out_mask]
            )
        frames = _split_frames(
            coords16.astype(np.int32), colors_f / 255.0, out_mask, num_frames
        )
        t_synth = time.time() - t0

        sideinfo = {
            "time_measurements": {
                "bitstream_reading": t_read,
                **times,
                "synthesis_transform": t_synth,
            },
            "timestamps": {"codec_start": t_codec_start, "codec_end": time.time()},
        }
        return frames, sideinfo
