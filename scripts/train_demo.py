"""Train the unified codec on the recorded demo sequences.

The reference demo ships pretrained weights from the external
Unified-Point-Cloud-Compression trainer; this script provides the equivalent
in-framework capability: variable-rate RD training of ``pct.models.ColorModel``
on recorded frames, producing a msgpack checkpoint the pipelines load via
``checkpoint_path``.

Round-2 defaults: train on the ``test_sequence`` + ``title_fig`` recordings and
hold out ``test`` (the bench/eval data) entirely; exponential distortion-weight
schedules over the quality vector (g_ratio/a_ratio) so the demo's
``encoding_settings`` ([1,0], [0,1], [1,1]) land on separated rate points; a
pre-canonicalized frame cache (pct.train.data) instead of per-step host
canonicalization.

Usage:
  python scripts/train_demo.py [--steps N] [--minutes M] [--batch B]
      [--capacity C] [--out PATH] [--resume CKPT] [--cpu] ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_DIRS = [
    "/root/reference/evaluation/data/test_sequence",
    "/root/reference/evaluation/data/title_fig",
]
VAL_DIR = "/root/reference/evaluation/data/test"  # held out: bench/eval data
DEMO_SETTINGS = np.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], np.float32)


def upgrade_occ_heads(model, params):
    """Warm-start migration: dense per-parent occupancy heads [C,8] from
    pre-round-2 checkpoints become 27-tap conv heads [27,C,8] with the old
    weights in the center tap (kernel_offsets(3) index 13) and zeros
    elsewhere — identical function at load, trainable context thereafter."""
    import jax.numpy as jnp

    g_s = params.get("g_s", {})
    changed = False
    for k, v in list(g_s.items()):
        if k.startswith("occ") and "w" in v and v["w"].ndim == 2:
            c, eight = v["w"].shape
            w = jnp.zeros((27, c, eight), jnp.float32).at[13].set(v["w"])
            g_s[k] = {"w": w, "b": v["b"]}
            changed = True
    if changed:
        print("upgraded dense occupancy heads to 27-tap conv heads", flush=True)
    return params, changed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--minutes", type=float, default=0.0, help="stop after M minutes (0 = by steps)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=16384)
    ap.add_argument("--data-dirs", nargs="*", default=TRAIN_DIRS)
    ap.add_argument("--val-dir", default=VAL_DIR)
    ap.add_argument("--out", default="checkpoints/demo.msgpack")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--channels", default="32,64,128")
    ap.add_argument("--latent", type=int, default=128)
    ap.add_argument("--hyper", type=int, default=64)
    ap.add_argument("--occ-layers", type=int, default=2)
    ap.add_argument("--occ-hidden", type=int, default=32)
    ap.add_argument("--rgb-layers", type=int, default=1,
                    help="v1 color-head depth (2 = conv27-relu-dense; upgrade an "
                    "existing checkpoint function-preservingly via --expand-from)")
    ap.add_argument("--rgb-hidden", type=int, default=64)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--val-every", type=int, default=500)
    ap.add_argument("--save-every", type=int, default=1000)
    ap.add_argument("--resume", default="", help="checkpoint to continue from")
    ap.add_argument("--expand-from", default="",
                    help="warm-start by width-expanding this (smaller) checkpoint "
                         "into the configured architecture (pct.models.expand)")
    ap.add_argument("--lambda-a", type=float, default=3000.0)
    ap.add_argument("--lambda-g", type=float, default=60.0)
    ap.add_argument("--g-ratio", type=float, default=20.0)
    ap.add_argument("--a-ratio", type=float, default=50.0)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--ste", action="store_true", default=True,
                    help="decode-matched hard quantization for the distortion path")
    ap.add_argument("--no-ste", dest="ste", action="store_false")
    ap.add_argument("--tf-color", type=float, default=1.0,
                    help="teacher-forced color loss weight (x lambda_a); 0 disables")
    ap.add_argument("--occ-level-weights", default="1,1,1",
                    help="per-level occupancy-BCE weights coarse->fine; the "
                    "strict-decode hit-rate lever is the finest level "
                    "(measured recalls 0.989/0.789/0.635 — PERF.md)")
    ap.add_argument("--corner-prob", type=float, default=0.5,
                    help="probability a frame's q is one of the demo corner settings")
    ap.add_argument("--arch", default="v1", help="model architecture: v1 | v2 (pct.models.UnifiedConfig)")
    ap.add_argument("--family", type=int, default=32, help="v2 family-mix channels")
    ap.add_argument("--refine-levels", default="",
                    help="enable two-stage fine-level selection at these "
                    "synthesis levels (e.g. '1,2'): graft zero-init refine "
                    "heads onto the resumed checkpoint and carry the config "
                    "into the saved one (pct.models.expand.graft_refine)")
    ap.add_argument("--refine-factor", type=float, default=2.0)
    ap.add_argument("--refine-hidden", type=int, default=16)
    ap.add_argument("--train-only", default="",
                    help="regex over slash-joined param paths; parameters NOT "
                    "matching are frozen (optax.masked). 'refine' trains only "
                    "the refine heads — the coded rate then cannot move")
    ap.add_argument("--keep-factors", default="",
                    help="override config.keep_factors (e.g. '2,2,1'): train the "
                    "occupancy scorer against over-provisioned intermediate "
                    "survivor sets so it learns to reject children of false "
                    "survivors (zero-shot kf HURT — PERF.md round 3); carried "
                    "into the saved checkpoint so decode prunes identically")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pct.utils.jaxcache import setup_compile_cache
    setup_compile_cache(cpu=args.cpu)
    import jax.numpy as jnp
    from flax import serialization

    from pct.models import ColorModel, UnifiedConfig, checkpoint
    from pct.train import (
        TrainConfig,
        arrays_to_training_batch,
        make_optimizer,
        make_train_step,
    )
    from pct.train.data import FrameDataset, build_cache

    print("devices:", jax.devices(), flush=True)
    cache = build_cache(args.data_dirs, args.capacity)
    ds = FrameDataset(cache)
    val_ds = FrameDataset(build_cache([args.val_dir], args.capacity))
    print(f"train {len(ds)} frames (cache {cache}), val {len(val_ds)} frames", flush=True)

    migrated = False
    if args.resume:
        model, params = checkpoint.load(args.resume)
        params, migrated = upgrade_occ_heads(model, params)
        print(f"resumed from {args.resume}", flush=True)
    elif args.expand_from:
        from pct.models.expand import expand_width

        small_model, small_params = checkpoint.load(args.expand_from)
        small_params, _ = upgrade_occ_heads(small_model, small_params)
        wide_cfg = UnifiedConfig(
            channels=tuple(int(c) for c in args.channels.split(",")),
            latent_channels=args.latent,
            hyper_channels=args.hyper,
            arch=args.arch,
            family_channels=args.family,
            occ_layers=args.occ_layers,
            occ_hidden=args.occ_hidden,
            rgb_layers=args.rgb_layers,
            rgb_hidden=args.rgb_hidden,
        )
        model, params = expand_width(small_model, small_params, wide_cfg)
        migrated = True  # never restore optimizer state across the expansion
        print(f"width-expanded from {args.expand_from} to {wide_cfg.channels}/"
              f"{wide_cfg.latent_channels}", flush=True)
    else:
        cfg = UnifiedConfig(
            channels=tuple(int(c) for c in args.channels.split(",")),
            latent_channels=args.latent,
            hyper_channels=args.hyper,
            arch=args.arch,
            family_channels=args.family,
            occ_layers=args.occ_layers,
            occ_hidden=args.occ_hidden,
            rgb_layers=args.rgb_layers,
            rgb_hidden=args.rgb_hidden,
        )
        model = ColorModel(cfg)
        params = model.init_params(jax.random.key(0))
    if args.keep_factors:
        import dataclasses

        kf = tuple(float(x) for x in args.keep_factors.split(","))
        # kf changes no parameter shapes — params/opt state carry over; the
        # survivor capacities in the loss and the decode pruning both read it
        # from the config, so train and decode stay matched
        model = ColorModel(dataclasses.replace(model.config, keep_factors=kf))
        print(f"keep_factors overridden to {kf}", flush=True)
    if args.refine_levels:
        from pct.models.expand import graft_refine

        rl = tuple(int(x) for x in args.refine_levels.split(","))
        if any(f"refine{l}" not in params.get("g_s", {}) for l in rl):
            model, params = graft_refine(
                model, params, rl, args.refine_factor, args.refine_hidden
            )
            migrated = True  # new param shapes: never restore optimizer state
            print(f"grafted zero-init refine heads at levels {rl}", flush=True)
        else:
            import dataclasses

            model = ColorModel(dataclasses.replace(
                model.config, refine_levels=rl,
                refine_factor=args.refine_factor,
                refine_hidden=args.refine_hidden,
            ))
    tcfg = TrainConfig(
        learning_rate=args.lr,
        lambda_a=args.lambda_a,
        lambda_g=args.lambda_g,
        g_ratio=args.g_ratio,
        a_ratio=args.a_ratio,
        grad_clip=args.grad_clip,
        ste=args.ste,
        tf_color=args.tf_color if args.arch == "v1" else 0.0,
        occ_level_weights=tuple(float(w) for w in args.occ_level_weights.split(",")),
    )
    opt = make_optimizer(tcfg, params=params, trainable_re=args.train_only)
    if args.train_only:
        print(f"training only params matching /{args.train_only}/", flush=True)
    opt_state = opt.init(params)
    if args.resume and not migrated and os.path.exists(args.resume + ".train"):
        # NOTE: never restore across a shape migration — flax from_bytes
        # accepts broadcast-compatible old moments, which silently mis-scale
        # Adam updates on the new parameters (observed divergence)
        try:
            with open(args.resume + ".train", "rb") as f:
                opt_state = serialization.from_bytes(opt_state, f.read())
            print("restored optimizer state", flush=True)
        except Exception as e:
            print(f"optimizer state not restored ({type(e).__name__}); fresh opt", flush=True)
    # donate params/opt_state buffers: halves peak optimizer-state HBM
    step = jax.jit(make_train_step(model, tcfg, opt), donate_argnums=(0, 1))

    # validation: per-setting bpp / color-mse / occ on fixed held-out frames —
    # the live monitor for rate-ladder separation
    from pct.train.losses import frame_rd_loss

    @jax.jit
    def val_metrics(params, coords, feats, mask, q, key):
        batch = arrays_to_training_batch(coords, feats, mask)
        keys = jax.random.split(key, coords.shape[0])
        _, m = jax.vmap(
            lambda blk, k: frame_rd_loss(
                model, params, blk, q, k, 1.0, 1.0, 1.0, 1.0, tcfg.ste, tcfg.tf_color
            )
        )(batch, keys)
        return jax.tree.map(jnp.mean, m)

    val_rng = np.random.default_rng(7)
    val_idx = val_rng.integers(0, len(val_ds), 4)
    val_arrays = val_ds.get(val_idx)

    def run_validation(params, key):
        out = []
        for q in DEMO_SETTINGS:
            m = val_metrics(params, *[jnp.asarray(a) for a in val_arrays], jnp.asarray(q), key)
            out.append(
                f"q={q.tolist()}: bpp {float(m['bpp']):.3f} "
                f"mse {float(m['color_mse']):.5f} tf {float(m['tf_color_mse']):.5f} "
                f"occ {float(m['occ_bce']):.4f} hit {float(m['hit_rate']):.3f}"
            )
        print("  VAL " + " | ".join(out), flush=True)

    def save(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        checkpoint.save(path, model, params)
        with open(path + ".train", "wb") as f:
            f.write(serialization.to_bytes(opt_state))
        print("saved", path, flush=True)

    rng = np.random.default_rng(0)
    key = jax.random.key(1)
    t0 = time.time()
    i = 0
    while True:
        if args.minutes > 0 and (time.time() - t0) / 60 >= args.minutes:
            break
        if args.minutes <= 0 and i >= args.steps:
            break
        coords, feats, mask = ds.sample(rng, args.batch)
        # variable-rate training: corners of the demo ladder + uniform fill
        qs = rng.random((args.batch, 2)).astype(np.float32)
        corner = rng.random(args.batch) < args.corner_prob
        corner_q = DEMO_SETTINGS[rng.integers(0, len(DEMO_SETTINGS), args.batch)]
        qs = np.where(corner[:, None], corner_q, qs)
        key, sub = jax.random.split(key)
        batch = arrays_to_training_batch(coords, feats, mask)
        params, opt_state, loss, metrics = step(
            params, opt_state, batch, jnp.asarray(qs), sub
        )
        if i % args.log_every == 0:
            print(
                f"step {i:6d} loss {float(loss):9.4f} bpp {float(metrics['bpp']):6.3f} "
                f"occ {float(metrics['occ_bce']):6.4f} mse {float(metrics['color_mse']):8.6f} "
                f"tf {float(metrics['tf_color_mse']):8.6f} "
                f"hit {float(metrics['hit_rate']):.3f} ({time.time()-t0:.0f}s)",
                flush=True,
            )
            if not np.isfinite(float(loss)):
                raise SystemExit("diverged")
        if i and args.val_every and i % args.val_every == 0:
            run_validation(params, jax.random.key(123))
        if i and args.save_every and i % args.save_every == 0:
            save(args.out)
        i += 1

    run_validation(params, jax.random.key(123))
    save(args.out)


if __name__ == "__main__":
    main()
