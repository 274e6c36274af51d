"""Train the unified codec on the recorded demo sequence.

The reference demo ships pretrained weights from the external
Unified-Point-Cloud-Compression trainer; this script provides the equivalent
in-framework capability: variable-rate RD training of ``pct.models.ColorModel``
on recorded frames, producing a msgpack checkpoint the pipelines load via
``checkpoint_path``.

Usage:
  python scripts/train_demo.py [--steps N] [--batch B] [--capacity C]
      [--data DIR] [--out PATH] [--lr LR] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--capacity", type=int, default=16384)
    ap.add_argument("--data", default="/root/reference/evaluation/data/test")
    ap.add_argument("--out", default="checkpoints/demo.msgpack")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--channels", default="16,32,64")
    ap.add_argument("--latent", type=int, default=64)
    ap.add_argument("--hyper", type=int, default=32)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--resume", default="", help="checkpoint to continue from")
    ap.add_argument("--lambda-a", type=float, default=6.5)
    ap.add_argument("--lambda-g", type=float, default=1.0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    import jax.numpy as jnp

    from pct.models import ColorModel, UnifiedConfig, checkpoint
    from pct.streaming.capturer import load_recorded_frames
    from pct.train import (
        TrainConfig,
        frames_to_training_batch,
        make_optimizer,
        make_train_step,
    )

    print("devices:", jax.devices(), flush=True)
    recs = load_recorded_frames(args.data)
    frames = [
        {"points": f["points"].astype(np.int32), "colors": f["colors"].astype(np.float32)}
        for f in recs
    ]
    print(f"{len(frames)} frames, mean points "
          f"{np.mean([len(f['points']) for f in frames]):.0f}", flush=True)

    if args.resume:
        model, params = checkpoint.load(args.resume)
        print(f"resumed from {args.resume}", flush=True)
    else:
        cfg = UnifiedConfig(
            channels=tuple(int(c) for c in args.channels.split(",")),
            latent_channels=args.latent,
            hyper_channels=args.hyper,
        )
        model = ColorModel(cfg)
        params = model.init_params(jax.random.key(0))
    tcfg = TrainConfig(learning_rate=args.lr, lambda_a=args.lambda_a, lambda_g=args.lambda_g)
    opt = make_optimizer(tcfg)
    opt_state = opt.init(params)
    # donate params/opt_state buffers: halves peak optimizer-state HBM
    step = jax.jit(make_train_step(model, tcfg, opt), donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    key = jax.random.key(1)
    t0 = time.time()
    for i in range(args.steps):
        idx = rng.integers(0, len(frames), args.batch)
        batch = frames_to_training_batch([frames[j] for j in idx], args.capacity)
        # variable-rate training: sample q per frame incl. the demo's settings
        qs = jnp.asarray(rng.random((args.batch, 2)) ** 0.5, jnp.float32)
        key, sub = jax.random.split(key)
        params, opt_state, loss, metrics = step(params, opt_state, batch, qs, sub)
        if i % args.log_every == 0 or i == args.steps - 1:
            print(
                f"step {i:5d} loss {float(loss):8.4f} bpp {float(metrics['bpp']):6.3f} "
                f"occ {float(metrics['occ_bce']):6.4f} mse {float(metrics['color_mse']):8.6f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
            if not np.isfinite(float(loss)):
                raise SystemExit("diverged")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    checkpoint.save(args.out, model, params)
    print("saved", args.out, flush=True)


if __name__ == "__main__":
    main()
