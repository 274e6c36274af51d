"""Measure the two-stage-selection CEILING of a checkpoint: per synthesis
level, the top-k recall (what exact pruning achieves today) vs the
top-(r*k) PROVISIONAL recall for r in {1.5, 2, 3, 4} — an oracle refine
head can never beat the provisional set's recall, so these numbers bound
what ``UnifiedConfig.refine_levels`` training can deliver and pick
``refine_factor`` before spending TPU-hours (VERDICT r4 item 2).

Decode-matched: y_hat is the hard-rounded, gain-scaled reconstruction the
decoder sees (the ste path of pct/train/losses.py), evaluated on held-out
recorded frames.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/demo.msgpack")
    ap.add_argument("--data", default="/root/reference/evaluation/data/test")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--q", default="1,1")
    ap.add_argument("--factors", default="1.0,1.5,2.0,3.0,4.0")
    ap.add_argument("--capacity", type=int, default=16384)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pct.models import checkpoint
    from pct.ops.topk import topk_per_batch_mask
    from pct.sparse import coords as coords_lib
    from pct.streaming.capturer import load_recorded_frames
    from pct.train.losses import _coord_set_at_stride, frame_rd_loss  # noqa: F401
    from pct.train.step import frames_to_training_batch

    model, params, _ = checkpoint.load_with_tables(args.ckpt)
    frames = load_recorded_frames(args.data)
    idx = np.linspace(0, len(frames) - 1, args.frames).astype(int)
    frames = [frames[i] for i in idx]
    q = jnp.asarray([float(x) for x in args.q.split(",")], jnp.float32)
    factors = [float(x) for x in args.factors.split(",")]

    batch = frames_to_training_batch(frames, args.capacity)
    cap = args.capacity
    caps_a = (cap // 2, cap // 4, cap // 8)
    caps_s = (cap // 4, cap // 2, cap)

    def per_frame(block):
        y, ks = model.g_a(params, block, 1, level_caps=caps_a)
        z = model.h_a(params, y)
        med = model.entropy_bottleneck.medians(params["entropy_bottleneck"])
        z_hat = z.with_feats(jnp.round(z.feats - med[None, :]) + med[None, :])
        scales, means = model.h_s(params, z_hat, y.coords, y.mask)
        means = jnp.round(means * 256.0) / 256.0
        gain = model.scale_nn(params, q)
        y_hat_f = jnp.round((y.feats - means) * gain) / gain + means
        y_hat = y.with_feats(jnp.where(y.mask[:, None], y_hat_f, 0.0))
        _, aux = model.g_s(
            params, y_hat, ks, level_capacities=caps_s, return_logits=True
        )
        out = {}
        for lvl, cand_coords, cand_mask, logits in aux:
            factor = 2 ** (model.config.num_levels - 1 - lvl)
            true_c, true_m = _coord_set_at_stride(block, factor)
            _, found = coords_lib.find_coords(
                true_c, cand_coords, true_m, cand_mask
            )
            n_true = jnp.sum(true_m)
            # candidate coverage: true cells reachable at all at this level
            _, covered = coords_lib.find_coords(
                cand_coords, true_c, cand_mask, true_m
            )
            out[f"l{lvl}_cover"] = jnp.sum(covered & true_m) / n_true
            target = found & cand_mask
            for r in factors:
                kk = jnp.round(ks[lvl].astype(jnp.float32) * r).astype(jnp.int32)
                keep = cand_mask & topk_per_batch_mask(
                    cand_coords[:, 0], logits, cand_mask, kk
                )
                out[f"l{lvl}_r{r}"] = jnp.sum(keep & target) / n_true
        return out

    res = jax.vmap(per_frame)(batch)
    res = {k: float(np.mean(np.asarray(v))) for k, v in res.items()}
    print(json.dumps({"q": args.q, **{k: round(v, 4) for k, v in sorted(res.items())}}, indent=1))
    prod = 1.0
    for lvl in range(model.config.num_levels):
        prod *= res[f"l{lvl}_r1.0"]
    print(f"top-k recall product (~= strict hit ceiling today): {prod:.3f}")
    for r in factors[1:]:
        p = res.get("l0_r1.0", 1.0)
        prod_r = res["l0_r1.0"]
        for lvl in (1, 2):
            prod_r *= res[f"l{lvl}_r{r}"]
        print(f"oracle refine ceiling at factor {r} (levels 1,2): {prod_r:.3f}")


if __name__ == "__main__":
    main()
