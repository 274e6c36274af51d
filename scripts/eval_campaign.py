"""Evaluation campaign: playback streaming runs at an fps sweep, CSV logs,
figures, and a per-step summary table vs the reference baseline.

The reference's acceptance harness (SURVEY.md §4): run the system in
playback mode at fps 1..10, collect sender/receiver CSVs keyed by segment
ID, merge, and plot (reference ``evaluation/plot.py``). This drives the same
campaign with pct's own services in one process per run, then produces the
four figure families and a summary row per fps.

Usage:
  python scripts/eval_campaign.py [--fps 1,3,5,8,10] [--segments 12]
      [--ckpt checkpoints/demo.msgpack] [--out evaluation/r2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE_PORT = 18600


def run_one(
    fps: int, segments: int, ckpt: str, out_dir: str, base_port: int,
    quality: int = 3, ladder: str = "shipped",
) -> dict:
    import jax

    from pct.config import Config
    from pct.models import ColorModel, UnifiedConfig, checkpoint
    from pct.pipeline import CompressionPipeline, DecompressionPipeline
    from pct.streaming.launch import SystemLauncher
    from pct.streaming.transport import PullSocket

    tag = f"{fps}fps" if quality == 3 else f"{fps}fps_q{quality}"
    if ladder != "shipped":
        tag = f"{tag}_{ladder}"
    log_dir = os.path.join(out_dir, f"logs_{tag}")
    media_dir = os.path.join(out_dir, f"media_{tag}")
    for d in (log_dir, media_dir):
        shutil.rmtree(d, ignore_errors=True)

    cfg = Config.load()
    cfg.update(
        {
            "mode": "playback",
            "recording_path": "/root/reference/evaluation/data/test",
            "target_fps": fps,
            "segment_duration": 1.0,
            "publish_offset": 3.0,
            "playout_offset": 4.0,
            "request_offset": 0.3,
            # the SHIPPED ladder (configs/sender.yaml): latent, guided
            # (exact geometry), guided+cr12 (near-lossless color) — plus the
            # raw rep 0 the media server always publishes (VERDICT r4 item 4)
            # shipped = the real DASH ladder (configs/sender.yaml); latent =
            # the round-3 / reference-comparable all-latent ladder (the
            # reference encodes its 3 settings through one latent codec —
            # config.yaml:12-15)
            "encoding_settings": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
            "geometry_mode": (
                ["latent", "guided", "guided"] if ladder == "shipped"
                else ["latent", "latent", "latent"]
            ),
            "lossless_color_step": [0, 0, 12] if ladder == "shipped" else [0, 0, 0],
            "encoder_address": f"tcp://127.0.0.1:{base_port + 2}",
            "media_server_address": f"tcp://127.0.0.1:{base_port + 3}",
            "decoder_address": f"tcp://127.0.0.1:{base_port + 4}",
            "client_address": f"tcp://127.0.0.1:{base_port + 5}",
            "visualizer_address": f"tcp://127.0.0.1:{base_port + 6}",
            "media_server_port": base_port + 10,
            "mpd_url": f"http://127.0.0.1:{base_port + 10}/manifest.mpd",
            "media_dir": media_dir,
            "log_dir": log_dir,
            "init_quality": quality,
            "fixed_quality_mode": True,
        }
    )

    if os.path.exists(ckpt):
        model, params, tables = checkpoint.load_with_tables(ckpt)
    else:
        model = ColorModel(
            UnifiedConfig(channels=(8, 16, 16), latent_channels=16, hyper_channels=8)
        )
        params, tables = model.init_params(jax.random.key(0)), None
    enc_pipe = CompressionPipeline(model, params, tables)
    dec_pipe = DecompressionPipeline(model, params, tables)

    # pre-warm the FULL bucket ladder on both codec sides: live point-count
    # variation must never hit a cold compile mid-stream (round-2's 10 fps
    # campaign lost 40% of segments to exactly that)
    from pct.pipeline.warmup import prewarm_codec
    from pct.streaming.capturer import load_recorded_frames

    # recorded frames are 5.9k-20.6k points POST-DEDUP (median 13.7k), so a
    # GOP of `fps` frames can land anywhere in [fps*5.9k, fps*20.6k] — warm
    # that whole band (round-3 lesson: a narrow 13k-17k/frame band left the
    # 49152 tier cold at 5 fps and one mid-stream compile cost 131 s)
    prewarm_codec(
        enc_pipe,
        dec_pipe,
        num_frames=max(fps, 1),
        min_points=int(fps * 5_500),
        max_points=int(fps * 21_000),
        settings=cfg["encoding_settings"],
        lossless=bool(cfg.get("lossless_rep", False)),
        geometry_mode=cfg.get("geometry_mode", "latent"),
        lossless_color_step=cfg.get("lossless_color_step", 0),
        # the decoder service decodes ONE selected representation per
        # segment; the fused multi-rate graphs are RD-tooling-only and can
        # crash the v5e TPU worker at big tiers
        multi_level=False,
        example_frames=load_recorded_frames(cfg["recording_path"])[:8],
    )

    view_pull = PullSocket(cfg["visualizer_address"])
    launcher = SystemLauncher(cfg, enc_pipeline=enc_pipe, dec_pipeline=dec_pipe)
    # ~15 recorded fps -> frames per segment of capture time
    launcher.start(max_frames=int(segments * 15 + 30))

    rx_csv = os.path.join(log_dir, "receiver", "log.csv")
    deadline = time.time() + segments * 1.0 + 60
    rows = 0
    while time.time() < deadline:
        try:
            view_pull.recv(timeout=5)
        except TimeoutError:
            pass
        if os.path.exists(rx_csv):
            with open(rx_csv) as f:
                rows = max(0, sum(1 for _ in f) - 1)
            if rows >= segments:
                break
    launcher.stop()
    view_pull.close()
    time.sleep(1.0)

    tx_csv = os.path.join(log_dir, "sender", "log.csv")
    summary = {"fps": fps, "quality": quality, "ladder": ladder, "segments_rx": rows}
    if os.path.exists(tx_csv) and os.path.exists(rx_csv):
        from pct.eval.plot import load_data, plot

        figs = plot(tx_csv, rx_csv, os.path.join(out_dir, "figures"), name=tag)
        df = load_data(tx_csv, rx_csv)
        import pandas as pd

        def col_mean(name):
            # merged columns may carry _tx/_rx suffixes
            cols = [c for c in df.columns if name in c]
            if not cols:
                return None
            v = pd.to_numeric(df[cols[0]], errors="coerce")
            return round(float(v.mean()), 4)

        def col_diff_mean(end, start):
            ce = [c for c in df.columns if end in c]
            cs = [c for c in df.columns if start in c]
            if not ce or not cs:
                return None
            v = pd.to_numeric(df[ce[0]], errors="coerce") - pd.to_numeric(
                df[cs[0]], errors="coerce"
            )
            return round(float(v.mean()), 4)

        # loss post-mortem (VERDICT r4: the 1 fps run's "unexplained 5.6%"):
        # ROOT CAUSE was end-of-run truncation — the sender keeps publishing
        # after the client is stopped at `segments` received rows, so the
        # trailing published-but-never-requested segments counted as "lost"
        # (evaluation/r3/logs_1fps: the 2 lost IDs are the final 2 IDs).
        # Loss is therefore measured over the client's ACTIVE WINDOW (ids up
        # to the last received one); `lost_segment_ids` names any true
        # in-window losses for the post-mortem.
        recv = df["packet_received"].astype(bool)
        if "ID" in df.columns and recv.any():
            win = df[df["ID"].astype(int) <= int(df.loc[recv, "ID"].astype(int).max())]
        else:
            win = df
        lost_ids = sorted(
            int(i) for i in win.loc[~win["packet_received"].astype(bool), "ID"]
        ) if "ID" in win.columns else []
        summary.update(
            {
                "segments_tx": len(df),
                "loss_rate": round(1.0 - float(win["packet_received"].mean()), 3),
                "lost_segment_ids": lost_ids[:20],
                # codec wall (codec_end - codec_start) — the reference's
                # encode-time metric (BASELINE.md rows). The analysis step
                # alone understated it ~2-3x (VERDICT r3 "weak" #1).
                "encode_wall_s": col_diff_mean(
                    "timestamps_codec_end", "timestamps_codec_start"
                ),
                "encode_analysis_s": col_mean("time_measurements_analysis"),
                "decode_synth_s": col_mean("time_measurements_synthesis_transform"),
                "num_points": col_mean("num_points"),
                "bpp": col_mean("gop_info_bpp"),
                "figures": len(figs),
            }
        )
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fps", default="1,3,5,8,10")
    ap.add_argument("--segments", type=int, default=30)
    ap.add_argument("--ckpt", default="checkpoints/demo.msgpack")
    ap.add_argument("--out", default="evaluation/r5")
    ap.add_argument("--quality", type=int, default=3,
                    help="fixed client representation: 0=raw, 1=latent, "
                    "2=guided, 3=guided+cr12 (the shipped ladder)")
    ap.add_argument("--ladder", default="shipped", choices=("shipped", "latent"),
                    help="shipped = latent/guided/guided+cr12 (the DASH "
                    "ladder); latent = all-latent rungs (round-3/reference "
                    "comparable)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pct.utils.jaxcache import setup_compile_cache
    setup_compile_cache(cpu=args.cpu)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "summary.json")
    summaries = []
    if os.path.exists(path):  # merge with prior sweeps into one summary
        with open(path) as f:
            summaries = json.load(f)
    for i, fps in enumerate(int(x) for x in args.fps.split(",")):
        s = run_one(
            fps, args.segments, args.ckpt, args.out, BASE_PORT + 20 * i,
            quality=args.quality, ladder=args.ladder,
        )
        summaries = [
            r for r in summaries
            if (r.get("fps"), r.get("quality", 3), r.get("ladder", "shipped"))
            != (fps, args.quality, args.ladder)
        ] + [s]
        print(json.dumps(s), flush=True)
    summaries.sort(key=lambda r: (r.get("fps", 0), r.get("quality", 3)))
    with open(path, "w") as f:
        json.dump(summaries, f, indent=2)
    print("wrote", os.path.join(args.out, "summary.json"), flush=True)


if __name__ == "__main__":
    main()
