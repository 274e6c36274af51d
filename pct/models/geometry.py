"""Geometry-only factorized-prior codec — the second model family.

Covers the BASELINE.json testbed configs 1-2 ("single-frame geometry
encode/decode", "factorized-prior entropy model, geometry-only"): a
sparse-conv analysis transform over occupancy-only features, a *factorized*
entropy bottleneck directly on the latents (no hyperprior / no Gaussian
conditional), octree-coded latent coordinates, and the same
occupancy-pruned generative synthesis driven by transmitted per-frame k
counts. Variable rate comes from a scalar gain applied to the latents before
rounding (4 canonical rate points).

Reuses the unified model's transforms with a 1-channel input and no RGB
head; encode/decode are fused single-dispatch graphs like the unified serial
codec.
"""

from __future__ import annotations

import dataclasses
import functools
import struct
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pct.entropy.bottleneck import EntropyBottleneck
from pct.gpcc import decode_points, encode_points
from pct.ops import counts_per_batch, sparse_conv, sparse_conv_down
from pct.ops.conv import build_kmap
from pct.sparse import coords as coords_lib
from pct.sparse.block import PAD_COORD, SparseBlock, bucket_size, canonicalize

RATE_POINTS = (0.25, 0.5, 1.0, 2.0)  # latent gain per rate point


@dataclasses.dataclass(frozen=True)
class GeometryConfig:
    channels: tuple[int, ...] = (16, 32, 64)
    latent_channels: int = 32
    num_levels: int = 3

    @classmethod
    def from_dict(cls, d):
        d = dict(d)
        if "channels" in d:
            d["channels"] = tuple(d["channels"])
        return cls(**d)

    def to_dict(self):
        d = dataclasses.asdict(self)
        d["channels"] = list(d["channels"])
        return d


class GeometryModel:
    def __init__(self, config: GeometryConfig | None = None):
        self.config = config or GeometryConfig()
        self.entropy_bottleneck = EntropyBottleneck(self.config.latent_channels)

    def __hash__(self):
        return hash((type(self).__name__, self.config))

    def __eq__(self, other):
        return type(other) is type(self) and other.config == self.config

    def init_params(self, key: jax.Array):
        from pct.models.unified import _conv_init, _dense_init

        cfg = self.config
        keys = iter(jax.random.split(key, 32))
        p = {"g_a": {}, "g_s": {}}
        cin = 1
        for i, c in enumerate(cfg.channels):
            p["g_a"][f"conv{i}"] = {"w": _conv_init(next(keys), 27, cin, c), "b": jnp.zeros((c,))}
            p["g_a"][f"down{i}"] = {"w": _conv_init(next(keys), 8, c, c), "b": jnp.zeros((c,))}
            cin = c
        p["g_a"]["out"] = {
            "w": _conv_init(next(keys), 27, cin, cfg.latent_channels),
            "b": jnp.zeros((cfg.latent_channels,)),
        }
        cin = cfg.latent_channels
        for i, c in enumerate(reversed(cfg.channels)):
            p["g_s"][f"up{i}"] = {"w": _conv_init(next(keys), 8, cin, c), "b": jnp.zeros((c,))}
            p["g_s"][f"conv{i}"] = {"w": _conv_init(next(keys), 27, c, c), "b": jnp.zeros((c,))}
            p["g_s"][f"occ{i}"] = {"w": _dense_init(next(keys), cin, 8), "b": jnp.zeros((8,))}
            cin = c
        p["entropy_bottleneck"] = self.entropy_bottleneck.init_params(next(keys))
        return p

    # ------------------------------------------------------------------

    def g_a(self, params, block: SparseBlock, num_frames: int, level_caps=None):
        from pct.sparse.block import truncate_capacity

        p = params["g_a"]
        x = block
        counts = []
        for i in range(self.config.num_levels):
            counts.append(counts_per_batch(x.coords[:, 0], x.mask, num_frames))
            h = sparse_conv(x, p[f"conv{i}"]["w"], p[f"conv{i}"]["b"])
            h = h.with_feats(jax.nn.relu(h.feats))
            x = sparse_conv_down(h, p[f"down{i}"]["w"], p[f"down{i}"]["b"])
            x = x.with_feats(jax.nn.relu(x.feats))
            if level_caps is not None:
                x = truncate_capacity(x, level_caps[i])
        y = sparse_conv(x, p["out"]["w"], p["out"]["b"])
        return y, jnp.stack(list(reversed(counts)), axis=0)

    def g_s(self, params, y_hat: SparseBlock, ks, level_capacities=None):
        from pct.ops.kernel_maps import derive_child_self_kmap

        p = params["g_s"]
        x = y_hat
        kmap = None  # parent self map: each level derives its child map from it
        for i in range(self.config.num_levels):
            n = x.capacity
            child_stride = x.stride // 2
            logits = x.feats @ p[f"occ{i}"]["w"] + p[f"occ{i}"]["b"]
            offs = jnp.asarray(
                np.array(
                    [[a, b, c] for a in (0, 1) for b in (0, 1) for c in (0, 1)], np.int32
                ),
                jnp.int32,
            ) * jnp.int32(child_stride)
            child_xyz = x.coords[:, None, 1:] + offs[None, :, :]
            child_b = jnp.broadcast_to(x.coords[:, None, :1], (n, 8, 1))
            cand = jnp.concatenate([child_b, child_xyz], axis=2).reshape(n * 8, 4)
            cmask = jnp.broadcast_to(x.mask[:, None], (n, 8)).reshape(n * 8)
            cand = jnp.where(cmask[:, None], cand, jnp.array(PAD_COORD, jnp.int32)[None, :])
            # one-sort select+compact (see ColorModel.g_s): internal levels
            # stay in (batch, rank) order; the final level canonicalizes
            from pct.ops.topk import topk_compact

            cap_i = (
                level_capacities[i] if level_capacities is not None else n * 8
            )
            perm, km = topk_compact(cand[:, 0], logits.reshape(-1), cmask, ks[i], cap_i)
            kc = jnp.where(
                km[:, None], cand[perm], jnp.array(PAD_COORD, jnp.int32)[None, :]
            )
            if i == self.config.num_levels - 1:
                order = coords_lib.lex_argsort(kc, km)
                kc, km, perm = kc[order], km[order], perm[order]
            # survivors' features gather at their pre-sort (parent, slot)
            # flat index (shared parity-critical definition); the child
            # kernel map derives from the parent map (octree arithmetic) —
            # both replace merge-join searches, bit-identically
            # (tests/test_derived_kmap.py)
            from pct.ops.conv import up_features_compact

            feats = up_features_compact(
                x.feats, p[f"up{i}"]["w"], p[f"up{i}"]["b"], perm, km
            )
            if kmap is None:
                kmap = build_kmap(x, 3)  # y grid only — 1/64 of the rows
            kmap = derive_child_self_kmap(
                kmap, perm // 8, perm % 8, kc, km, child_stride
            )
            x = SparseBlock(coords=kc, feats=feats, mask=km, stride=child_stride)
            x = sparse_conv(x, p[f"conv{i}"]["w"], p[f"conv{i}"]["b"], kmap=kmap)
            x = x.with_feats(jax.nn.relu(x.feats))
        return x


class GeometryCodec:
    """encode(frames) -> per-rate bitstreams; decode -> point sets."""

    def __init__(self, model: GeometryModel, params):
        self.model = model
        self.params = params
        self.eb_tables = model.entropy_bottleneck.update(params["entropy_bottleneck"])

    def __hash__(self):
        return hash((type(self).__name__, self.model.config))

    def __eq__(self, other):
        return type(other) is type(self) and other.model.config == self.model.config

    @functools.partial(jax.jit, static_argnames=("self", "num_frames", "level_caps"))
    def _encode(self, params, coords, mask, num_frames, level_caps):
        m = self.model
        cap = coords.shape[0]
        block = canonicalize(coords, jnp.ones((cap, 1), jnp.float32), mask, dedup=True)
        y, ks = m.g_a(params, block, num_frames, level_caps)
        ny = y.count()
        med = m.entropy_bottleneck.medians(params["entropy_bottleneck"])
        syms = []
        for g in RATE_POINTS:  # static rate sweep
            s = jnp.round(y.feats * g - med[None, :])
            syms.append(jnp.where(y.mask[:, None], s, 0).astype(jnp.int16))
        meta = jnp.concatenate([ks.reshape(-1), ny[None]]).astype(jnp.int32)
        return meta, y.coords, jnp.stack(syms)

    @functools.partial(jax.jit, static_argnames=("self", "level_caps"))
    def _decode(self, params, coords, mask, y_syms, gain, ks, level_caps):
        m = self.model
        cap = coords.shape[0]
        cdim = m.config.latent_channels
        y = canonicalize(coords, jnp.zeros((cap, cdim), jnp.float32), mask).with_stride(8)
        med = m.entropy_bottleneck.medians(params["entropy_bottleneck"])
        y_hat = (y_syms.astype(jnp.float32) + med[None, :]) / gain
        y = y.with_feats(jnp.where(y.mask[:, None], y_hat, 0))
        out = m.g_s(params, y, ks, level_caps)
        return out.coords.astype(jnp.int16), out.mask

    def encode(self, frames: Sequence[dict]) -> list[bytes]:
        """Returns one self-contained bitstream per rate point."""
        num_frames = len(frames)
        rows = []
        for b, fr in enumerate(frames):
            pts = np.asarray(fr["points"], np.int32)
            rows.append(np.concatenate([np.full((len(pts), 1), b, np.int32), pts], 1))
        coords = np.concatenate(rows)
        cap = bucket_size(coords.shape[0])
        mask = np.concatenate([np.ones(coords.shape[0], bool), np.zeros(cap - coords.shape[0], bool)])
        coords = np.concatenate([coords, np.zeros((cap - coords.shape[0], 4), np.int32)])
        lcaps = (cap, cap, cap) if cap <= 4096 else (cap // 2, cap // 8, cap // 16)
        meta, y_coords, y_syms = self._encode(
            self.params, jnp.asarray(coords), jnp.asarray(mask), num_frames, lcaps
        )
        meta = np.asarray(meta)
        ks, ny = meta[:-1].reshape(self.model.config.num_levels, num_frames), int(meta[-1])
        yc = np.asarray(y_coords[:ny])
        syms = np.asarray(y_syms[:, :ny])

        gpcc = []
        for b in range(num_frames):
            gpcc.append(encode_points(yc[yc[:, 0] == b][:, 1:] // 8))

        streams = []
        for qi, g in enumerate(RATE_POINTS):
            y_string = self.model.entropy_bottleneck.compress_symbols(
                self.eb_tables, syms[qi].T
            )
            head = struct.pack("<ifi", num_frames, g, ny)
            body = bytearray(head)
            body += struct.pack("<i", len(y_string)) + y_string
            for b in range(num_frames):
                body += struct.pack(
                    "<iiii", len(gpcc[b]), int(ks[0, b]), int(ks[1, b]), int(ks[2, b])
                )
                body += gpcc[b]
            streams.append(bytes(body))
        return streams

    def decode(self, stream: bytes) -> list[np.ndarray]:
        """Returns per-frame int point arrays."""
        off = 0
        num_frames, gain, ny = struct.unpack_from("<ifi", stream, off)
        off += 12
        (ylen,) = struct.unpack_from("<i", stream, off)
        off += 4
        y_string = stream[off : off + ylen]
        off += ylen
        gpcc, ks = [], []
        for _ in range(num_frames):
            glen, k1, k2, k3 = struct.unpack_from("<iiii", stream, off)
            off += 16
            gpcc.append(stream[off : off + glen])
            off += glen
            ks.append((k1, k2, k3))
        ks = np.asarray(ks, np.int32).T

        rows = []
        for b, g in enumerate(gpcc):
            pts = decode_points(g) * 8
            rows.append(np.concatenate([np.full((len(pts), 1), b, np.int32), pts], 1))
        coords = np.concatenate(rows)
        assert coords.shape[0] == ny
        cap = bucket_size(ny)
        mask = np.concatenate([np.ones(ny, bool), np.zeros(cap - ny, bool)])
        coords = np.concatenate([coords, np.zeros((cap - ny, 4), np.int32)])

        syms = self.model.entropy_bottleneck.decompress_symbols(
            self.eb_tables, y_string, ny
        ).T.astype(np.int16)
        syms = np.concatenate(
            [syms, np.zeros((cap - ny, syms.shape[1]), np.int16)], axis=0
        )
        caps = tuple(int(bucket_size(int(ks[l].sum()))) for l in range(ks.shape[0]))
        out_coords, out_mask = self._decode(
            self.params,
            jnp.asarray(coords),
            jnp.asarray(mask),
            jnp.asarray(syms),
            jnp.float32(gain),
            jnp.asarray(ks),
            caps,
        )
        oc, om = np.asarray(out_coords).astype(np.int32), np.asarray(out_mask)
        return [oc[om & (oc[:, 0] == b)][:, 1:] for b in range(num_frames)]
