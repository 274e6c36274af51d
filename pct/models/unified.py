"""The unified variable-rate joint geometry+attribute codec model.

TPU-native re-design of the external ``unified.model.model.ColorModel`` whose
inference surface the reference demo pins (SURVEY.md §2.3; usage at reference
``sender/encoder/codec_pipeline.py:56-72,270-437`` and
``receiver/decoder/codec_parallel.py:47-63,291-472``):

- ``g_a``  — sparse-conv analysis transform, 3 stride-2 downsamplings
  (voxel grid -> latent at tensor stride 8), returning the per-frame
  ground-truth occupied-voxel counts ``k`` at each decoder upsampling level,
- ``h_a`` / ``h_s`` — hyper analysis (stride 8 -> 32) and synthesis
  (predicting per-latent Gaussian (scale, mean), joined onto the latent
  coordinates),
- factorized bottleneck over z, Gaussian conditional over y,
- ``scale_nn`` — quality vector ``q=[q_g, q_a]`` -> per-channel latent gain
  (variable-rate "gain units"), with dead-zone dequantization offsets on
  decode (reference ``codec_parallel.py:405-409``),
- ``g_s``  — generative transposed-conv synthesis with occupancy
  classification and exact per-frame top-k pruning at each of 3 levels.

Differences from the reference implementation (by design, not omission):
- z-coordinates are re-derived from y-coordinates by *pure coordinate*
  downsampling (``derive_z_coords``) instead of running a strided conv on a
  ones-tensor (reference ``codec_parallel.py:296-303``) — the coordinate set
  is identical and no GEMM is spent on it.
- All shapes are padded/bucketed for XLA; per-level decode capacities are
  derived host-side from the transmitted ``k`` values.

Everything here is pure-functional: ``params`` is a pytree dict, model
objects hold only static configuration.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pct.entropy.bottleneck import EntropyBottleneck
from pct.entropy.gaussian import GaussianConditional
from pct.ops import (
    counts_per_batch,
    downsample_coords,
    generative_conv_up,
    kernel_offsets,
    sparse_conv,
    sparse_conv_down,
)
from pct.ops.conv import set_compute_dtype as _set_dtype
from pct.sparse.block import SparseBlock, truncate_capacity

@functools.lru_cache(maxsize=None)
def kernel_offsets_cached(k: int):
    return kernel_offsets(k)


def expand_children(x: SparseBlock) -> tuple[jax.Array, jax.Array]:
    """All 8 child-slot candidates of every cell of ``x``, flat in
    parent-major x tap order (the tap order of ``up_features_at``); masked
    parents expand to PAD_COORD rows. Returns ``(coords [N*8, 4], mask)``.

    This flat order is a wire contract for the guided-occupancy mode: the
    occupancy bitstream codes candidates in exactly this enumeration."""
    from pct.sparse.block import PAD_COORD

    n = x.capacity
    child_stride = x.stride // 2
    offs = jnp.asarray(kernel_offsets_cached(2), jnp.int32) * jnp.int32(child_stride)
    child_xyz = x.coords[:, None, 1:] + offs[None, :, :]
    child_b = jnp.broadcast_to(x.coords[:, None, :1], (n, 8, 1))
    cand_coords = jnp.concatenate([child_b, child_xyz], axis=2).reshape(n * 8, 4)
    cand_mask = jnp.broadcast_to(x.mask[:, None], (n, 8)).reshape(n * 8)
    cand_coords = jnp.where(
        cand_mask[:, None], cand_coords, jnp.array(PAD_COORD, jnp.int32)[None, :]
    )
    return cand_coords, cand_mask

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UnifiedConfig:
    """Static model hyperparameters (the checkpoint's ``config.yaml`` analog)."""

    in_channels: int = 4  # [1, R, G, B] — constant-1 channel prepended as in
    # reference codec_pipeline.py:258
    channels: tuple[int, ...] = (32, 64, 128)  # after each analysis down-conv
    latent_channels: int = 128  # y
    hyper_channels: int = 64  # z
    scale_nn_hidden: int = 64
    eps: float = 1e-6  # gain floor (reference `entropy_model.eps`)
    num_levels: int = 3  # stride-2 stages between voxels and latents
    # Feature-path gather/GEMM dtype ("float32" | "bfloat16"): bfloat16
    # halves conv tap-gather bytes and doubles MXU rate (f32 accumulation).
    # Carried in the checkpoint so encoder and decoder hosts always agree
    # (the hyperprior-derived coding indexes must match bit-wise).
    compute_dtype: str = "float32"
    # Apply the MMSE dead-zone dequantization offsets at decode. The offsets
    # assume reconstruction statistics the noise-trained synthesis never saw
    # — measured on the round-2 checkpoint they cost hit-rate 0.37 -> 0.25
    # and joint color PSNR 16.7 -> 10.8 dB — so the pipelines only apply
    # them when the checkpoint says its training accounted for them.
    use_offsets: bool = False
    # "v1": conv+down per analysis level, 27-tap conv at every synthesis level.
    # "v2": TPU-first redesign — the stride-1 grid (the largest level) never
    # sees a searched 27-tap kernel map on either side: analysis starts with
    # the search-free patchify down-conv, and the final synthesis level mixes
    # the 8 siblings of each parent cell with one dense GEMM (the family MLP)
    # instead of a stride-1 conv. Kernel maps then only exist on grids 3.5x+
    # smaller. Same wire contract (k pyramid, bitstream) as v1.
    arch: str = "v1"
    family_channels: int = 32  # v2 synthesis family-mix width
    # Occupancy-head depth: 1 = single 27-tap conv parent-grid scorer
    # (round-2), 2 = conv -> relu -> conv (same kernel map reused, hidden
    # width ``occ_hidden``) — the deeper head is what lifts strict-decode
    # hit rate; a linear scorer tops out near 0.55 (round-2/3 measurement).
    occ_layers: int = 1
    occ_hidden: int = 32
    # RGB-head depth (v1 synthesis): 1 = single 27-tap conv (rounds 1-3,
    # measured color-prediction ceiling ~22.7 dB on exact hits), 2 =
    # conv27 -> relu -> dense (hidden width ``rgb_hidden``; the dense mix
    # costs no extra tap gathers) — the deeper/wider color tail is the
    # direct capacity lever on hit-color fidelity (VERDICT r3 item 2).
    rgb_layers: int = 1
    rgb_hidden: int = 64
    # Intermediate-level keep factors (coarse -> fine): prune to
    # ``factor * k`` at the non-final synthesis levels instead of exactly k.
    # The k contract only binds the FINAL voxel count (the bitstream is
    # unchanged); exact intermediate pruning makes fine-level recall the
    # PRODUCT of per-level recalls (~0.85^3 ~= 0.61 measured ceiling), while
    # over-provisioning lets nearly every true cell survive to the final
    # clean top-k. The last entry must be 1.0. Carried in the checkpoint so
    # training and decode prune identically.
    keep_factors: tuple[float, ...] = (1.0, 1.0, 1.0)
    # Build same-grid kernel maps through the GOP-union coordinate set
    # (pct.ops.kernel_maps.build_self_kernel_map_gop): frames of a GOP share
    # xyz coordinates, so the dominant merge-rank join runs once on the
    # deduplicated union instead of per frame. Bit-identical maps (pure perf;
    # in-graph fallback on union overflow), so encoder/decoder may disagree
    # on this flag without breaking parity. Union capacities follow the
    # measured per-stride GOP ratios of the recorded demo data
    # (stride 1/2/4+: 0.70/0.54/0.45 of rows, 5-frame GOPs) plus margin.
    gop_union_maps: bool = False
    # Derive each synthesis level's 27-tap self kernel map from the PARENT
    # level's map (``pct.ops.kernel_maps.derive_child_self_kmap``) — octree
    # arithmetic + gathers instead of the merge-join sort, bit-identical
    # output (equivalence pinned in tests/test_derived_kmap.py). Deletes the
    # dominant decode-side sort for every synthesis level except the
    # coarsest. Off reproduces the SEARCHED MAP BUILD — it does not restore
    # pre-round-3 candidate enumeration order (the one-sort select+compact
    # is unconditional), so exact-float-tie top-k picks may differ from
    # builds before commit b9cc5ae; within one build, encoder and decoder
    # are always consistent.
    #
    # None (default) = AUTO by backend, resolved lazily at first use
    # (``ColorModel.use_derived_maps``): measured round 4 on-chip
    # (scripts/ab_maps.py), the derivation's duplicate-heavy row gathers hit
    # the TPU gather-serialization cliff and LOSE to the sort-based merge
    # joins (decode 0.41 vs 0.28 s at 76k x 5), while on CPU the sorts
    # dominate and derivation wins (-44% encode / -24% decode, PERF.md) —
    # so TPU/axon resolves to searched, CPU to derived. Never stored in
    # checkpoints (pure perf, both variants bit-identical).
    derived_maps: "bool | None" = None
    # Two-stage fine-level selection (the round-5 architectural hit-rate
    # lever — VERDICT r4 item 2): at each level listed here, g_s first keeps
    # a PROVISIONAL ``refine_factor * k`` survivor set under the parent-grid
    # head's scores, builds the survivors' up-features, re-scores them with a
    # small 27-tap conv over the provisional CHILD grid (context the
    # parent-grid head cannot see: which of the jitter-adjacent candidates
    # its own neighborhood actually supports), and only then prunes to
    # exactly ``k`` under ``base_logit + refine_residual``. The wire format
    # is untouched (same y, same k counts — rate multiplier is exactly 1.0
    # by construction); only WHICH voxels survive changes, and the
    # downstream feature semantics are exactly the baseline's (features are
    # rebuilt from the final survivor set). The residual head's output
    # layer is zero-initialized, so a grafted untrained head reproduces the
    # base selection bit-for-bit. Carried in the checkpoint (decode must
    # prune identically). Levels index coarse->fine (0..num_levels-1).
    refine_levels: tuple[int, ...] = ()
    refine_factor: float = 2.0
    refine_hidden: int = 16
    # FAMILY-form synthesis convs (pct/ops/family.py): every g_s conv/occ/rgb
    # 27-tap conv runs as 27 wide gathers over the PARENT grid instead of
    # 27 gathers over the (8x larger, more padded) child grid — the round-5
    # answer to the descriptor-bound decode wall (TPU row gathers cost
    # ~40 ns/row regardless of width). Same tap sums in a different
    # accumulation order: NOT bit-identical to the classic path (the
    # cross-backend XLA-codegen tolerance class), so within one process all
    # g_s consumers share one resolution, and the guided-occupancy wire
    # format pins the profile per stream (OC3 = family, OC1/OC2 = classic).
    # None = AUTO by backend (True on tpu/axon, False on cpu — the CPU
    # microbench shows the FLOP overhead dominating there). Never persisted.
    family_synth: "bool | None" = None

    def __post_init__(self):
        # keep_factors is indexed kf[lvl] by the synthesis/guided paths and
        # its last entry gates the final exact top-k — validate here instead
        # of failing deep inside a traced graph (ADVICE r3).
        if len(self.keep_factors) != self.num_levels:
            raise ValueError(
                f"keep_factors has {len(self.keep_factors)} entries; "
                f"num_levels={self.num_levels} required"
            )
        if self.keep_factors[-1] != 1.0:
            raise ValueError("keep_factors[-1] must be 1.0 (final top-k is exact)")
        if len(self.channels) != self.num_levels:
            raise ValueError(
                f"channels has {len(self.channels)} entries; "
                f"num_levels={self.num_levels} required"
            )
        if self.refine_levels:
            if self.arch != "v1":
                raise ValueError("refine_levels is implemented for arch v1")
            if any(l < 0 or l >= self.num_levels for l in self.refine_levels):
                raise ValueError(f"refine_levels out of range: {self.refine_levels}")
            if self.refine_factor <= 1.0:
                raise ValueError("refine_factor must exceed 1.0")

    @classmethod
    def from_dict(cls, d: dict) -> "UnifiedConfig":
        d = dict(d)
        for k in ("channels", "keep_factors", "refine_levels"):
            if k in d:
                d[k] = tuple(d[k])
        # pure-perf, bit-identical either way: always resolve by backend
        # (older checkpoints stored the round-3 CPU-tuned True)
        d.pop("derived_maps", None)
        d.pop("family_synth", None)
        return cls(**d)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["channels"] = list(d["channels"])
        d["keep_factors"] = list(d["keep_factors"])
        d["refine_levels"] = list(d["refine_levels"])
        d.pop("derived_maps", None)  # backend-resolved, never persisted
        d.pop("family_synth", None)
        return d


def _conv_init(key, k, cin, cout):
    scale = 1.0 / np.sqrt(k * cin)
    return jax.random.uniform(key, (k, cin, cout), jnp.float32, -scale, scale)


def _dense_init(key, cin, cout):
    scale = 1.0 / np.sqrt(cin)
    return jax.random.uniform(key, (cin, cout), jnp.float32, -scale, scale)


class ColorModel:
    """Variable-rate joint geometry+attribute sparse codec (API parity with
    the reference's ``ColorModel``, re-architected for TPU)."""

    def __init__(self, config: UnifiedConfig | None = None):
        self.config = config or UnifiedConfig()
        self.entropy_bottleneck = EntropyBottleneck(self.config.hyper_channels)
        self.gaussian_conditional = GaussianConditional()
        from pct.entropy.binary import BinaryConditional

        self.binary_conditional = BinaryConditional()
        self._derived_auto = None  # lazy backend-resolved derived_maps
        self._family_auto = None  # lazy backend-resolved family_synth
        self.eps = self.config.eps
        from pct.ops.conv import set_compute_dtype

        set_compute_dtype(self.config.compute_dtype)

    @property
    def use_derived_maps(self) -> bool:
        """Resolve ``config.derived_maps`` (None = auto by backend). Lazy —
        ``jax.default_backend()`` initializes the backend, which must not
        happen at config/model construction (the axon relay handshake costs
        minutes); by the time any consumer traces a graph the backend is
        up anyway. Deterministic per process, so shared jit traces stay
        consistent."""
        cfg = self.config.derived_maps
        if cfg is not None:
            return cfg
        if self._derived_auto is None:
            # sorts beat duplicate-address gathers on TPU; reversed on CPU
            self._derived_auto = jax.default_backend() not in ("tpu", "axon")
        return self._derived_auto

    @property
    def use_family_synth(self) -> bool:
        """Resolve ``config.family_synth`` (None = auto by backend, lazily —
        same rationale as ``use_derived_maps``). Family-form g_s wins on TPU
        (8x fewer gather descriptors); on CPU the extra block-GEMM FLOPs
        dominate (measured 2.4x slower in scripts/bench_family.py --cpu)."""
        cfg = self.config.family_synth
        if cfg is not None:
            return cfg
        if self._family_auto is None:
            self._family_auto = jax.default_backend() in ("tpu", "axon")
        return self._family_auto

    # Hash/eq by static config: model objects ride through jit as static
    # arguments, and id-based hashing would retrace per instance (every
    # pipeline object would recompile the whole codec).
    def __hash__(self):
        return hash((type(self).__name__, self.config))

    def __eq__(self, other):
        return type(other) is type(self) and other.config == self.config

    def _union_frac(self, stride: int) -> float:
        """GOP-union capacity fraction for a same-grid kernel map at
        ``stride``: the measured per-stride union/rows ratios of 5-frame
        recorded-demo GOPs (0.70 / 0.54 / 0.45 at stride 1 / 2 / 4+) plus
        overflow margin. 0 disables (see ``UnifiedConfig.gop_union_maps``)."""
        if not self.config.gop_union_maps:
            return 0.0
        return {1: 0.80, 2: 0.65}.get(stride, 0.55)

    # ------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------

    def init_params(self, key: jax.Array) -> Params:
        cfg = self.config
        keys = iter(jax.random.split(key, 64))
        p: Params = {"g_a": {}, "h_a": {}, "h_s": {}, "g_s": {}, "scale_nn": {}}

        # g_a v1: per level: conv3 + relu, down2; final conv3 to latent.
        # g_a v2: down2 first (search-free patchify), then conv3 on the
        # 3.5x-smaller grid — the stride-1 level never builds a kernel map.
        cin = cfg.in_channels
        for i, c in enumerate(cfg.channels):
            if cfg.arch == "v2":
                p["g_a"][f"down{i}"] = {
                    "w": _conv_init(next(keys), 8, cin, c),
                    "b": jnp.zeros((c,), jnp.float32),
                }
                p["g_a"][f"conv{i}"] = {
                    "w": _conv_init(next(keys), 27, c, c),
                    "b": jnp.zeros((c,), jnp.float32),
                }
            else:
                p["g_a"][f"conv{i}"] = {
                    "w": _conv_init(next(keys), 27, cin, c),
                    "b": jnp.zeros((c,), jnp.float32),
                }
                p["g_a"][f"down{i}"] = {
                    "w": _conv_init(next(keys), 8, c, c),
                    "b": jnp.zeros((c,), jnp.float32),
                }
            cin = c
        p["g_a"]["out"] = {
            "w": _conv_init(next(keys), 27, cin, cfg.latent_channels),
            "b": jnp.zeros((cfg.latent_channels,), jnp.float32),
        }

        # h_a: conv3 + 2x down2 onto hyper channels
        hc = cfg.hyper_channels
        p["h_a"]["conv0"] = {
            "w": _conv_init(next(keys), 27, cfg.latent_channels, hc),
            "b": jnp.zeros((hc,), jnp.float32),
        }
        p["h_a"]["down0"] = {"w": _conv_init(next(keys), 8, hc, hc), "b": jnp.zeros((hc,), jnp.float32)}
        p["h_a"]["down1"] = {"w": _conv_init(next(keys), 8, hc, hc), "b": jnp.zeros((hc,), jnp.float32)}

        # h_s: 2x generative up + convs, output 2*latent (scales, means)
        p["h_s"]["up0"] = {"w": _conv_init(next(keys), 8, hc, hc), "b": jnp.zeros((hc,), jnp.float32)}
        p["h_s"]["conv0"] = {"w": _conv_init(next(keys), 27, hc, hc), "b": jnp.zeros((hc,), jnp.float32)}
        p["h_s"]["up1"] = {"w": _conv_init(next(keys), 8, hc, hc), "b": jnp.zeros((hc,), jnp.float32)}
        p["h_s"]["conv1"] = {
            "w": _conv_init(next(keys), 27, hc, 2 * cfg.latent_channels),
            "b": jnp.zeros((2 * cfg.latent_channels,), jnp.float32),
        }

        # g_s: 3 levels of generative up + conv + occupancy head; final rgb.
        # v2: the last level replaces the stride-1 27-tap conv with a family
        # MLP (dense mix of the 8 sibling slots of each parent cell) and a
        # dense rgb head — no kernel map on the largest grid.
        cin = cfg.latent_channels
        up_channels = tuple(reversed(cfg.channels))  # e.g. (128, 64, 32)
        last = len(up_channels) - 1
        for i, c in enumerate(up_channels):
            p["g_s"][f"up{i}"] = {
                "w": _conv_init(next(keys), 8, cin, c),
                "b": jnp.zeros((c,), jnp.float32),
            }
            # occupancy head scores all 8 child slots from the PARENT GRID
            # with a 27-tap conv: pruning still happens before child features
            # exist (compute scales with k, not the 8x candidate set), but
            # each cell's children are scored from the parent neighborhood —
            # a lone-parent dense head topped out at ~26% exact-voxel hits
            # (round-2 measurement); neighborhood context is what the
            # reference's classify-after-expand conv provides.
            if cfg.occ_layers == 2:
                oh = cfg.occ_hidden
                p["g_s"][f"occ{i}"] = {
                    "w1": _conv_init(next(keys), 27, cin, oh),
                    "b1": jnp.zeros((oh,), jnp.float32),
                    "w2": _conv_init(next(keys), 27, oh, 8),
                    "b2": jnp.zeros((8,), jnp.float32),
                }
            else:
                p["g_s"][f"occ{i}"] = {
                    "w": _conv_init(next(keys), 27, cin, 8),
                    "b": jnp.zeros((8,), jnp.float32),
                }
            if i in cfg.refine_levels:
                # two-stage selection residual scorer over the provisional
                # child grid: conv27(c -> rh) -> relu -> dense(rh -> 1).
                # w2/b2 ZERO so a fresh head is selection-neutral (grafts
                # onto trained checkpoints without disturbing them).
                # input channels: the survivor's up-features PLUS its own
                # base logit — the score FIELD over the provisional child
                # grid is what lets the head learn ranking corrections
                # (surface-thickness / mutual-suppression effects live in
                # neighbors' scores, not in raw features)
                rh = cfg.refine_hidden
                p["g_s"][f"refine{i}"] = {
                    "w1": _conv_init(next(keys), 27, c + 1, rh),
                    "b1": jnp.zeros((rh,), jnp.float32),
                    "w2": jnp.zeros((rh, 1), jnp.float32),
                    "b2": jnp.zeros((1,), jnp.float32),
                }
            if cfg.arch == "v2" and i == last:
                fc = cfg.family_channels
                p["g_s"]["fam"] = {
                    "w": _dense_init(next(keys), 8 * c, 8 * fc),
                    "b": jnp.zeros((8 * fc,), jnp.float32),
                }
                p["g_s"]["rgb"] = {
                    "w": _dense_init(next(keys), fc, 3),
                    "b": jnp.zeros((3,), jnp.float32),
                }
            else:
                p["g_s"][f"conv{i}"] = {
                    "w": _conv_init(next(keys), 27, c, c),
                    "b": jnp.zeros((c,), jnp.float32),
                }
            cin = c
        if cfg.arch != "v2":
            if cfg.rgb_layers == 2:
                rh = cfg.rgb_hidden
                p["g_s"]["rgb"] = {
                    "w1": _conv_init(next(keys), 27, cin, rh),
                    "b1": jnp.zeros((rh,), jnp.float32),
                    "w2": _dense_init(next(keys), rh, 3),
                    "b2": jnp.zeros((3,), jnp.float32),
                }
            else:
                p["g_s"]["rgb"] = {
                    "w": _conv_init(next(keys), 27, cin, 3),
                    "b": jnp.zeros((3,), jnp.float32),
                }

        # scale_nn: q[2] -> gain[latent]
        p["scale_nn"]["w0"] = _dense_init(next(keys), 2, cfg.scale_nn_hidden)
        p["scale_nn"]["b0"] = jnp.zeros((cfg.scale_nn_hidden,), jnp.float32)
        p["scale_nn"]["w1"] = _dense_init(next(keys), cfg.scale_nn_hidden, cfg.latent_channels)
        p["scale_nn"]["b1"] = jnp.zeros((cfg.latent_channels,), jnp.float32)

        p["entropy_bottleneck"] = self.entropy_bottleneck.init_params(next(keys))
        return p

    # ------------------------------------------------------------------
    # Transforms
    # ------------------------------------------------------------------

    def g_a(
        self,
        params: Params,
        block: SparseBlock,
        num_frames: int,
        level_caps: Sequence[int] | None = None,
    ):
        """Analysis transform. Returns ``(y_block, ks)`` where ``ks`` is an
        int32 ``[num_levels, num_frames]`` array of ground-truth occupied
        counts at the decoder's upsampling output levels, ordered coarse ->
        fine (stride 4, 2, 1) to match the bitstream's (k1, k2, k3).

        ``level_caps``: optional static row capacities applied after each
        downsample (surface clouds shrink ~3-4x per stride level; blocks are
        canonical valid-first so a static slice only drops padding). Callers
        must verify the returned counts fit the caps (the serial encoder
        falls back to uncapped on overflow)."""
        from pct.ops.conv import build_kmap, down_plan
        from pct.sparse.block import truncate_capacity

        _set_dtype(self.config.compute_dtype)
        p = params["g_a"]
        x = block
        counts = []  # counts at stride 1, 2, 4 (before each downsample)
        L = self.config.num_levels
        v2 = self.config.arch == "v2"

        kmaps = [None] * (L + 1)  # self map per grid (stride 2^i), [L] = y grid
        plans = [None] * L
        if self.use_derived_maps:
            # The downsample pyramid depends only on coordinates: compute the
            # whole chain of DownPlans up front, build ONE searched self map
            # at the tiny y grid (1/64 of the rows), and derive every finer
            # grid's map from its parent's (octree arithmetic, no sorts) —
            # each plan's (prow, tap) is exactly the child->(parent row,
            # slot) mapping the derivation needs. This deletes the encode
            # side's dominant merge joins (PERF.md), bit-identically.
            from pct.ops.kernel_maps import derive_child_self_kmap
            from pct.sparse.block import PAD_COORD

            grids = []  # (coords, mask, stride) per level, 0 = input
            c, mk, s = block.coords, block.mask, block.stride
            for i in range(L):
                grids.append((c, mk, s))
                plans[i] = down_plan(
                    SparseBlock(coords=c, feats=c[:, :1].astype(jnp.float32), mask=mk, stride=s)
                )
                c, mk = plans[i].out_coords, plans[i].out_mask
                if level_caps is not None:
                    c, mk = c[: level_caps[i]], mk[: level_caps[i]]
                s *= 2
            ygrid = SparseBlock(
                coords=c, feats=jnp.zeros((c.shape[0], 1), jnp.float32), mask=mk, stride=s
            )
            kmaps[L] = build_kmap(ygrid, 3, num_frames, self._union_frac(s))
            m = kmaps[L]
            for i in reversed(range(L)):
                gc, gm, gs = grids[i]
                # prow indexes the uncapped parent array; valid rows are
                # always < the cap (the caller's overflow contract — only
                # padding is dropped by the slice) and masked rows are
                # clamped/dropped inside the derivation
                m = derive_child_self_kmap(m, plans[i].prow, plans[i].tap, gc, gm, gs)
                kmaps[i] = m

        last = self.config.num_levels - 1
        for i in range(self.config.num_levels):
            counts.append(counts_per_batch(x.coords[:, 0], x.mask, num_frames))
            if v2:
                # patchify first (search-free segment-sum down), conv on the
                # 3.5x-smaller grid — no kernel map at the input stride
                x = sparse_conv_down(x, p[f"down{i}"]["w"], p[f"down{i}"]["b"], plan=plans[i])
                x = x.with_feats(jax.nn.relu(x.feats))
                if level_caps is not None:
                    x = truncate_capacity(x, level_caps[i])
                kmap = kmaps[i + 1] if kmaps[i + 1] is not None else build_kmap(
                    x, 3, num_frames, self._union_frac(x.stride)
                )
                x = sparse_conv(x, p[f"conv{i}"]["w"], p[f"conv{i}"]["b"], kmap=kmap)
                x = x.with_feats(jax.nn.relu(x.feats))
            else:
                kmap = kmaps[i] if kmaps[i] is not None else build_kmap(
                    x, 3, num_frames, self._union_frac(x.stride)
                )
                h = sparse_conv(x, p[f"conv{i}"]["w"], p[f"conv{i}"]["b"], kmap=kmap)
                h = h.with_feats(jax.nn.relu(h.feats))
                x = sparse_conv_down(h, p[f"down{i}"]["w"], p[f"down{i}"]["b"], plan=plans[i])
                x = x.with_feats(jax.nn.relu(x.feats))
                if level_caps is not None:
                    x = truncate_capacity(x, level_caps[i])
        if v2:
            # conv{last} and the latent projection share the stride-8 grid
            y = sparse_conv(x, p["out"]["w"], p["out"]["b"], kmap=kmap)
        elif kmaps[L] is not None:
            y = sparse_conv(x, p["out"]["w"], p["out"]["b"], kmap=kmaps[L])
        else:
            y = sparse_conv(x, p["out"]["w"], p["out"]["b"])
        ks = jnp.stack(list(reversed(counts)), axis=0)  # [L, B]: stride 4, 2, 1
        return y, ks

    def h_a(self, params: Params, y: SparseBlock) -> SparseBlock:
        _set_dtype(self.config.compute_dtype)
        p = params["h_a"]
        h = sparse_conv(y, p["conv0"]["w"], p["conv0"]["b"])
        h = h.with_feats(jax.nn.relu(h.feats))
        h = sparse_conv_down(h, p["down0"]["w"], p["down0"]["b"])
        h = h.with_feats(jax.nn.relu(h.feats))
        z = sparse_conv_down(h, p["down1"]["w"], p["down1"]["b"])
        return z

    @staticmethod
    def derive_z_coords(y: SparseBlock) -> SparseBlock:
        """Deterministically re-derive z coordinates (stride 8 -> 32) from
        decoded y coordinates — pure coordinate math, shared by encoder and
        decoder so the factorized decode is anchored without transmitting
        z geometry (role of the reference's ones-tensor ``g_s.down_conv`` x2,
        ``codec_parallel.py:296-303``)."""
        c1, m1 = downsample_coords(y, 2)
        mid = SparseBlock(coords=c1, feats=jnp.zeros((c1.shape[0], 1)), mask=m1, stride=y.stride * 2)
        c2, m2 = downsample_coords(mid, 2)
        return SparseBlock(
            coords=c2, feats=jnp.ones((c2.shape[0], 1)), mask=m2, stride=mid.stride * 2
        )

    def h_s(self, params: Params, z: SparseBlock, y_coords: jax.Array, y_mask: jax.Array):
        """Hyper synthesis: upsample z twice and produce Gaussian params at
        the y coordinates. Returns ``(scales, means)`` with shape [Ny, C].

        The stride-16 level is materialized (8x the tiny z set); the final
        up+conv level is evaluated lazily at the y coordinates only
        (:func:`pct.ops.conv.generative_up_conv_at`) instead of materializing
        the 64x stride-8 candidate set and joining (the reference's
        ``features_at_coordinates`` pattern, ``codec_parallel.py:387``) —
        identical math, O(ny) instead of O(64 nz) compute/memory."""
        from pct.ops.conv import generative_up_conv_at

        # Parity-critical: the (scale, mean) -> coding-index derivation must
        # be bit-identical between encoder and decoder hosts, and the 1/256
        # parity-rounding grid (pct/pipeline/serial.py PARAM_GRID) is finer
        # than bfloat16's ~2^-8 relative resolution — pin the whole hyper
        # synthesis to float32 regardless of the feature-path compute dtype.
        _set_dtype(jnp.float32)
        p = params["h_s"]
        if self.use_derived_maps:
            # conv0's self map derives from the tiny z-grid map instead of a
            # merge join over the 8x-larger stride-16 expansion
            from pct.ops.conv import build_kmap
            from pct.ops.kernel_maps import derive_child_self_kmap

            h, prow, slot = generative_conv_up(
                z, p["up0"]["w"], p["up0"]["b"], return_rows=True
            )
            kmap0 = derive_child_self_kmap(
                build_kmap(z, 3), prow, slot, h.coords, h.mask, h.stride
            )
            h = sparse_conv(h, p["conv0"]["w"], p["conv0"]["b"], kmap=kmap0)
        else:
            h = generative_conv_up(z, p["up0"]["w"], p["up0"]["b"])
            h = sparse_conv(h, p["conv0"]["w"], p["conv0"]["b"])
        h = h.with_feats(jax.nn.relu(h.feats))
        gp = generative_up_conv_at(
            h,
            p["up1"]["w"],
            p["up1"]["b"],
            p["conv1"]["w"],
            p["conv1"]["b"],
            y_coords,
            y_mask,
        )
        scales_raw, means = jnp.split(gp, 2, axis=-1)
        scales = jax.nn.softplus(scales_raw) + 1e-4
        return scales, means

    def g_s_at(
        self,
        params: Params,
        y_hat: SparseBlock,
        level_blocks: Sequence[tuple[jax.Array, jax.Array]],
    ) -> SparseBlock:
        """Synthesis evaluated at KNOWN per-level coordinate sets (coarse ->
        fine ``(coords, mask)`` pairs, canonical): the lossless-geometry
        representation transmits the full-resolution voxel set (octree
        coded), so the decoder needs no occupancy prediction — each level's
        features come from the parent premultiply gather
        (:func:`pct.ops.conv.up_features_at`) at the exact child set,
        followed by the same convs/heads as :meth:`g_s`. The occupancy heads
        are unused on this path."""
        from pct.ops.conv import build_kmap, up_features_at

        if self.config.arch != "v1":
            raise NotImplementedError(
                "lossless-geometry synthesis is implemented for arch='v1'"
            )
        p = params["g_s"]
        _set_dtype(self.config.compute_dtype)
        x = y_hat
        kmap = None  # parent self map for the derived-map chain
        for i in range(self.config.num_levels):
            coords_l, mask_l = level_blocks[i]
            if self.use_derived_maps:
                # one parent-find join per level (up_features_at needs it
                # anyway); the 13-offset self join is derived from it
                from pct.ops.kernel_maps import derive_child_self_kmap

                if kmap is None:
                    kmap = build_kmap(x, 3)  # y grid: 1/64 of the rows
                feats, prow, pfound, tap = up_features_at(
                    x, p[f"up{i}"]["w"], p[f"up{i}"]["b"], coords_l, mask_l,
                    return_rows=True,
                )
                kmap = derive_child_self_kmap(
                    kmap, prow, tap, coords_l, mask_l, x.stride // 2, pfound
                )
                x = SparseBlock(
                    coords=coords_l, feats=feats, mask=mask_l, stride=x.stride // 2
                )
            else:
                feats = up_features_at(
                    x, p[f"up{i}"]["w"], p[f"up{i}"]["b"], coords_l, mask_l
                )
                x = SparseBlock(
                    coords=coords_l, feats=feats, mask=mask_l, stride=x.stride // 2
                )
                kmap = build_kmap(x, 3)
            x = sparse_conv(x, p[f"conv{i}"]["w"], p[f"conv{i}"]["b"], kmap=kmap)
            x = x.with_feats(jax.nn.relu(x.feats))
        return self._rgb_head(params, x, kmap)

    def scale_nn(self, params: Params, q: jax.Array) -> jax.Array:
        """Quality vector [2] -> positive per-channel gain [latent] (+eps)."""
        p = params["scale_nn"]
        h = jax.nn.relu(q @ p["w0"] + p["b0"])
        return jax.nn.softplus(h @ p["w1"] + p["b1"]) + self.eps

    def get_offsets(self, y_q_stdev: jax.Array, magnitudes: jax.Array | None = None) -> jax.Array:
        """Dead-zone dequantization offset per latent (reference
        ``entropy_model.get_offsets`` — ``codec_parallel.py:405-409``).

        Closed-form conditional-mean correction for a centered Gaussian with
        stdev ``s`` (in quantization-grid units): for a symbol of magnitude
        ``a``, the MMSE reconstruction of |residual| is
        ``E[t | t in (a-0.5, a+0.5), t ~ N(0, s^2)]``; the offset is that
        mean minus ``a``. Negative (pulls toward zero), vanishing for large
        ``s`` or large ``a``. ``magnitudes`` defaults to the first bin
        (a = 1) — pass the |symbol| array for per-bin correction (a bin-1
        offset applied to all bins over-shrinks large coefficients).
        """
        s = jnp.maximum(y_q_stdev, 1e-4)
        a_mag = jnp.ones_like(s) if magnitudes is None else jnp.maximum(magnitudes, 1.0)
        sqrt2 = np.sqrt(2.0)

        def phi(x):
            return jnp.exp(-0.5 * x * x) / np.sqrt(2 * np.pi)

        def Phi(x):
            return 0.5 * (1 + jax.lax.erf(x / sqrt2))

        a, b = (a_mag - 0.5) / s, (a_mag + 0.5) / s
        denom = jnp.maximum(Phi(b) - Phi(a), 1e-12)
        mean = s * (phi(a) - phi(b)) / denom
        return mean - a_mag

    def _rgb_head(self, params: Params, x: SparseBlock, kmap) -> SparseBlock:
        """v1 color head at the final synthesis level (reuses its kernel
        map). ``rgb_layers == 2``: conv27 -> relu -> dense — one extra conv's
        worth of tap gathers, the channel mix itself is gather-free."""
        pr = params["g_s"]["rgb"]
        if self.config.rgb_layers == 2:
            h = sparse_conv(x, pr["w1"], pr["b1"], kmap=kmap)
            f = jax.nn.relu(h.feats) @ pr["w2"] + pr["b2"]
            f = jnp.where(h.mask[:, None], f, 0)
            return h.with_feats(f)
        return sparse_conv(x, pr["w"], pr["b"], kmap=kmap)

    def occ_logits(self, params: Params, x: SparseBlock, kmap, level: int) -> jax.Array:
        """Occupancy head at synthesis level ``level``: scores the 8 child
        slots of every cell of ``x`` (parent grid) -> logits [N, 8]. Shared
        by :meth:`g_s` (top-k pruning) and the guided-occupancy coding mode
        (``pct/entropy/binary.py``), where ``sigmoid(logits)`` are the
        coding probabilities."""
        po = params["g_s"][f"occ{level}"]
        if self.config.occ_layers == 2:
            h = sparse_conv(x, po["w1"], po["b1"], kmap=kmap)
            h = h.with_feats(jax.nn.relu(h.feats))
            return sparse_conv(h, po["w2"], po["b2"], kmap=kmap).feats
        return sparse_conv(x, po["w"], po["b"], kmap=kmap).feats

    def _refine_scores_classic(
        self,
        params: Params,
        x: SparseBlock,
        flat_logits: jax.Array,
        cand_coords: jax.Array,
        cand_mask: jax.Array,
        k_eff: jax.Array,
        cap_i: int,
        level: int,
    ) -> tuple[jax.Array, jax.Array]:
        """Two-stage selection, classic (compact-block) form: keep a
        provisional ``refine_factor * k`` set under the parent-grid scores,
        build its up-features, re-score with the refine head (27-tap conv
        over the provisional child grid -> relu -> zero-init dense), and
        return ``(base + residual scores, provisional keep mask)`` over the
        flat 8n candidate array. Same math as the family form's
        ``family_conv`` over provisionally-masked premultiplies (the usual
        accumulation-order tolerance class)."""
        from pct.ops.conv import build_kmap_unsorted, up_features_compact
        from pct.ops.topk import topk_compact
        from pct.sparse.block import PAD_COORD

        n = x.capacity
        factor = float(self.config.refine_factor)
        k_prov = jnp.round(k_eff.astype(jnp.float32) * factor).astype(jnp.int32)
        # static provisional capacity: per-frame k_prov <= factor*k + 0.5,
        # so factor*cap_i plus one row per frame covers every survivor
        cap_p = min(n * 8, int(cap_i * factor) + int(k_eff.shape[0]))
        perm_p, km_p = topk_compact(
            cand_coords[:, 0], flat_logits, cand_mask, k_prov, cap_p
        )
        kc_p = jnp.where(
            km_p[:, None], cand_coords[perm_p], jnp.array(PAD_COORD, jnp.int32)[None, :]
        )
        p = params["g_s"]
        feats_p = up_features_compact(
            x.feats, p[f"up{level}"]["w"], p[f"up{level}"]["b"], perm_p, km_p
        )
        # append the candidate's own base logit: the refine conv then sees
        # the score FIELD of the provisional neighborhood (same channel in
        # the family form)
        logit_p = jnp.where(km_p, flat_logits[perm_p], 0).astype(feats_p.dtype)
        feats_p = jnp.concatenate([feats_p, logit_p[:, None]], axis=1)
        xp = SparseBlock(coords=kc_p, feats=feats_p, mask=km_p, stride=x.stride // 2)
        pr = p[f"refine{level}"]
        h = sparse_conv(xp, pr["w1"], pr["b1"], kmap=build_kmap_unsorted(xp, 3))
        r = (jax.nn.relu(h.feats) @ pr["w2"].astype(h.feats.dtype))[:, 0] + pr[
            "b2"
        ].astype(h.feats.dtype)
        # scatter the residual back onto flat candidate indices (perm_p
        # entries are unique among valid rows — collision-free)
        flat_idx = jnp.where(km_p, perm_p, n * 8)
        resid = (
            jnp.zeros((n * 8 + 1,), flat_logits.dtype)
            .at[flat_idx]
            .set(jnp.where(km_p, r.astype(flat_logits.dtype), 0), mode="drop")[: n * 8]
        )
        prov_keep = (
            jnp.zeros((n * 8 + 1,), bool).at[flat_idx].set(km_p, mode="drop")[: n * 8]
        )
        return flat_logits + resid, prov_keep

    def g_s(
        self,
        params: Params,
        y_hat: SparseBlock,
        ks: jax.Array,
        level_capacities: Sequence[int] | None = None,
        return_logits: bool = False,
    ):
        """Synthesis: 3x (generative up, conv, occupancy classify, top-k prune
        to exactly ``ks[level]`` voxels per frame), then RGB head.

        ``ks``: int32 [num_levels, B], coarse->fine. ``level_capacities``:
        static per-level row capacities (decode-side, derived from the
        transmitted k values); defaults to the full 8x expansions.

        Predict-then-expand: each level scores all 8 child slots from the
        *parent* features with a dense head, prunes to exactly ``ks[level]``
        per frame, and only then materializes features for the survivors
        (fused parent-gather up-conv) followed by a 27-tap conv. The
        reference materializes/convolves the full 8x candidate set before
        classifying (``codec_parallel.py:465-472``); scoring on parents keeps
        all compute proportional to the transmitted k counts — same k
        contract, TPU-native ordering.

        Returns the reconstructed stride-1 block (RGB features), plus
        per-level ``(cand_coords, cand_mask, logits)`` for the 8x candidate
        grids when ``return_logits`` (training)."""
        from pct.ops.conv import build_kmap
        from pct.sparse import coords as coords_lib
        from pct.sparse.block import PAD_COORD

        if self.use_family_synth and self.config.arch == "v1":
            return self._g_s_family(
                params, y_hat, ks, level_capacities, return_logits
            )
        _set_dtype(self.config.compute_dtype)
        p = params["g_s"]
        x = y_hat
        aux = []
        last = self.config.num_levels - 1
        v2 = self.config.arch == "v2"
        kmap = None  # parent-grid kernel map; levels > 0 reuse the previous
        # level's conv map (same coordinate set), level 0 builds the y-grid one
        for i in range(self.config.num_levels):
            n = x.capacity
            child_stride = x.stride // 2
            # score all 8 children of every parent from the parent NEIGHBORHOOD
            if kmap is None:
                kmap = build_kmap(x, 3, ks.shape[1], self._union_frac(x.stride))
            logits = self.occ_logits(params, x, kmap, i)  # [N, 8]
            cand_coords, cand_mask = expand_children(x)
            flat_logits = logits.reshape(n * 8)
            if return_logits:
                aux.append((i, cand_coords, cand_mask, flat_logits))
            kf = float(self.config.keep_factors[i]) if i < last else 1.0
            k_eff = (
                ks[i]
                if kf == 1.0
                else jnp.round(ks[i].astype(jnp.float32) * kf).astype(jnp.int32)
            )
            # select + compact in ONE sort (the top-k's own): survivors land
            # in (batch, score-rank) order. Internal levels never need
            # canonical order (derived kmaps and convs are order-free); only
            # the final level's order is observable (packed output,
            # color-residual addressing) and re-sorts over cap rows instead
            # of the 8x candidate set — deletes 2 of 3 full-size per-level
            # sorts and shrinks the third 8x.
            from pct.ops.topk import topk_compact

            cap_i = level_capacities[i] if level_capacities is not None else n * 8
            if i in self.config.refine_levels:
                # two-stage selection (see UnifiedConfig.refine_levels): the
                # residual scorer sees the provisional CHILD grid; the final
                # top-k runs over provisional survivors only
                flat_logits, cand_mask = self._refine_scores_classic(
                    params, x, flat_logits, cand_coords, cand_mask,
                    k_eff, cap_i, i,
                )
                if return_logits:
                    aux.append((i, cand_coords, cand_mask, flat_logits))
            perm, km = topk_compact(
                cand_coords[:, 0], flat_logits, cand_mask, k_eff, cap_i
            )
            kc = jnp.where(
                km[:, None], cand_coords[perm], jnp.array(PAD_COORD, jnp.int32)[None, :]
            )
            if i == last:
                # the final level's order is observable (packed output,
                # color-residual addressing): canonicalize once, over cap
                # rows instead of the 8x candidate set. Intermediate levels
                # stay in candidate-index order in BOTH map variants — the
                # enumeration order is tie-break-relevant for top-k, so the
                # variants must share it to stay bit-identical
                # (test_derived_kmap.py::test_dense_cloud_parity_on_off).
                order = coords_lib.lex_argsort(kc, km)
                kc, km, perm = kc[order], km[order], perm[order]

            if v2 and i == last:
                premul = jnp.einsum(
                    "nc,tcd->ntd", x.feats, p[f"up{i}"]["w"],
                    preferred_element_type=x.feats.dtype,
                ) + p[f"up{i}"]["b"]
                # family MLP: mix the 8 sibling slots of each parent cell with
                # one dense GEMM in parent-major order (masked to survivors),
                # then gather each survivor's slot — the stride-1 grid never
                # builds a kernel map. Cross-cell context comes from the
                # coarser levels' 27-tap convs.
                c_up = premul.shape[-1]
                # full keep mask over the 8x candidates (collision-free: perm
                # entries are unique among valid rows)
                kept_mask = (
                    jnp.zeros((n * 8 + 1,), bool)
                    .at[jnp.where(km, perm, n * 8)]
                    .set(True)[: n * 8]
                )
                fam_in = jnp.where(
                    kept_mask.reshape(n, 8)[..., None], premul, 0
                ).reshape(n, 8 * c_up)
                fc = self.config.family_channels
                fam = jax.nn.relu(fam_in @ p["fam"]["w"] + p["fam"]["b"]).reshape(n * 8, fc)
                feats = fam[perm]
                rgbf = feats @ p["rgb"]["w"] + p["rgb"]["b"]
                rgbf = jnp.where(km[:, None], rgbf, 0)
                rgb = SparseBlock(coords=kc, feats=rgbf, mask=km, stride=child_stride)
            else:
                # survivor features: ONE shared parity-critical definition
                # (pct.ops.conv.up_features_compact) — also used by the
                # guided pyramid and the geometry model
                from pct.ops.conv import up_features_compact

                feats = up_features_compact(
                    x.feats, p[f"up{i}"]["w"], p[f"up{i}"]["b"], perm, km
                )
                x = SparseBlock(coords=kc, feats=feats, mask=km, stride=child_stride)
                if self.use_derived_maps:
                    # each survivor's (parent row, slot) is its pre-sort flat
                    # candidate index — derive the child map from the parent
                    # map (kmap still holds it) instead of a merge-join sort
                    from pct.ops.kernel_maps import derive_child_self_kmap

                    kmap = derive_child_self_kmap(
                        kmap, perm // 8, perm % 8, kc, km, child_stride
                    )
                else:
                    # searched A/B fallback: rows are in candidate-index
                    # order (not sorted) at intermediate levels — build on a
                    # sorted view and remap (dense clouds interleave, so a
                    # direct sorted-search here would silently miss)
                    from pct.ops.conv import build_kmap_unsorted

                    kmap = (
                        build_kmap(x, 3, ks.shape[1], self._union_frac(x.stride))
                        if i == last
                        else build_kmap_unsorted(x, 3)
                    )
                x = sparse_conv(x, p[f"conv{i}"]["w"], p[f"conv{i}"]["b"], kmap=kmap)
                x = x.with_feats(jax.nn.relu(x.feats))
        if not v2:
            # rgb head shares the last level's coordinates -> reuse its kernel map
            rgb = self._rgb_head(params, x, kmap)
        if return_logits:
            return rgb, aux
        return rgb

    def _g_s_family(
        self,
        params: Params,
        y_hat: SparseBlock,
        ks: jax.Array,
        level_capacities: Sequence[int] | None = None,
        return_logits: bool = False,
    ):
        """FAMILY-form synthesis (same k contract / candidate enumeration /
        top-k semantics as :meth:`g_s`, different conv accumulation order —
        see pct/ops/family.py). Every 27-tap conv runs as 27 wide gathers
        over its PARENT grid, so:

        - the survivor up-features need NO gather (the parent premultiply
          IS the family layout),
        - the stride-1 grid (the largest) never builds a kernel map — the
          14 x N merge-join sort of the classic searched path is gone,
        - per-conv gather descriptors drop 8x (the measured decode wall,
          PERF.md round 5).

        The occupancy heads of levels >= 1 also run family-form over the
        grandparent grid; level 0's head runs classic on the (tiny) y grid.
        """
        from pct.ops.conv import build_kmap, build_kmap_unsorted
        from pct.ops.family import (
            family_conv,
            family_keep_mask,
            gather_family,
        )
        from pct.ops.topk import topk_compact
        from pct.sparse.block import PAD_COORD

        _set_dtype(self.config.compute_dtype)
        p = params["g_s"]
        x = y_hat
        aux = []
        last = self.config.num_levels - 1
        kmap_x = build_kmap(x, 3, ks.shape[1], self._union_frac(x.stride))
        # family representation of x (levels >= 1): feats over x's parents
        fam_x = kept_x = perm_x = km_x = None
        kmap_pp = pp_mask = None  # x's parent grid map/mask (occ family form)
        rgb = None
        for i in range(self.config.num_levels):
            n = x.capacity
            child_stride = x.stride // 2
            if fam_x is None:
                logits = self.occ_logits(params, x, kmap_x, i)  # [N, 8]
            else:
                po = p[f"occ{i}"]
                if self.config.occ_layers == 2:
                    h = family_conv(fam_x, kmap_pp, po["w1"], po["b1"], pp_mask)
                    h = jax.nn.relu(h) * kept_x[:, :, None]
                    lf = family_conv(h, kmap_pp, po["w2"], po["b2"], pp_mask)
                else:
                    lf = family_conv(fam_x, kmap_pp, po["w"], po["b"], pp_mask)
                logits = gather_family(lf, perm_x, km_x)  # [N, 8]
            cand_coords, cand_mask = expand_children(x)
            flat_logits = logits.reshape(n * 8)
            if return_logits:
                aux.append((i, cand_coords, cand_mask, flat_logits))
            kf = float(self.config.keep_factors[i]) if i < last else 1.0
            k_eff = (
                ks[i]
                if kf == 1.0
                else jnp.round(ks[i].astype(jnp.float32) * kf).astype(jnp.int32)
            )
            cap_i = level_capacities[i] if level_capacities is not None else n * 8
            # survivor features in family layout: the parent premultiply IS
            # the [N, 8, C] family tensor — no gather (computed before
            # selection: the refine scorer consumes it too)
            premul = jnp.einsum(
                "nc,tcd->ntd", x.feats, p[f"up{i}"]["w"],
                preferred_element_type=x.feats.dtype,
            ) + p[f"up{i}"]["b"]
            if i in self.config.refine_levels:
                # two-stage selection, family form (same math as
                # _refine_scores_classic): provisional keep mask, refine
                # conv over provisionally-masked premultiplies, final top-k
                # over provisional survivors under base + residual
                from pct.ops.topk import topk_per_batch_mask

                factor = float(self.config.refine_factor)
                k_prov = jnp.round(
                    k_eff.astype(jnp.float32) * factor
                ).astype(jnp.int32)
                keep_p = cand_mask & topk_per_batch_mask(
                    cand_coords[:, 0], flat_logits, cand_mask, k_prov
                )
                kept_p = keep_p.reshape(n, 8)
                pr = p[f"refine{i}"]
                fam_in = jnp.concatenate(
                    [premul, logits.astype(premul.dtype)[:, :, None]], axis=2
                ) * kept_p[:, :, None]
                h = family_conv(fam_in, kmap_x, pr["w1"], pr["b1"], x.mask)
                h = jax.nn.relu(h) * kept_p[:, :, None]
                r = (h @ pr["w2"].astype(h.dtype))[..., 0] + pr["b2"].astype(h.dtype)
                flat_logits = flat_logits + r.reshape(n * 8).astype(flat_logits.dtype)
                cand_mask = keep_p
                if return_logits:
                    aux.append((i, cand_coords, cand_mask, flat_logits))
            perm, km = topk_compact(
                cand_coords[:, 0], flat_logits, cand_mask, k_eff, cap_i
            )
            kc = jnp.where(
                km[:, None], cand_coords[perm], jnp.array(PAD_COORD, jnp.int32)[None, :]
            )
            if i == last:
                # only the final level's order is observable (same contract
                # and tie-break semantics as g_s)
                from pct.sparse import coords as coords_lib

                order = coords_lib.lex_argsort(kc, km)
                kc, km, perm = kc[order], km[order], perm[order]

            kept = family_keep_mask(perm, km, n)
            fam = family_conv(
                premul * kept[:, :, None], kmap_x, p[f"conv{i}"]["w"],
                p[f"conv{i}"]["b"], x.mask,
            )
            fam = jax.nn.relu(fam) * kept[:, :, None]
            if i == last:
                pr = params["g_s"]["rgb"]
                if self.config.rgb_layers == 2:
                    h = family_conv(fam, kmap_x, pr["w1"], pr["b1"], x.mask)
                    h = jax.nn.relu(h) * kept[:, :, None]
                    rgbf = gather_family(h, perm, km) @ pr["w2"] + pr["b2"]
                    rgbf = jnp.where(km[:, None], rgbf, 0)
                else:
                    rf = family_conv(fam, kmap_x, pr["w"], pr["b"], x.mask)
                    rgbf = gather_family(rf, perm, km)
                rgb = SparseBlock(coords=kc, feats=rgbf, mask=km, stride=child_stride)
            else:
                kmap_pp, pp_mask = kmap_x, x.mask
                fam_x, kept_x, perm_x, km_x = fam, kept, perm, km
                x = SparseBlock(
                    coords=kc, feats=gather_family(fam, perm, km), mask=km,
                    stride=child_stride,
                )
                kmap_x = build_kmap_unsorted(x, 3)
        if return_logits:
            return rgb, aux
        return rgb
