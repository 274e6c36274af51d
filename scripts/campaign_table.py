"""Reproducible warm-median campaign table (the STATUS.md campaign rows).

Reads each `logs_*fps/{sender,receiver}/log.csv` under the given evaluation
directory and prints one row per run: warm medians (first `--skip` segments
excluded) of the serialized per-segment encode step sum (the honest codec
cost — raw codec_end-codec_start walls are inflated ~2.7x by the 3
concurrent workers sharing one chip + the GIL), the publish gap, the
receiver decode step sum, and bpp, plus tx/rx counts and in-window loss.

Usage: python scripts/campaign_table.py [--dir evaluation/r5m] [--skip 5]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

import numpy as np
import pandas as pd

ENC_STEPS = [
    "time_measurements_analysis",
    "time_measurements_hyper_analysis",
    "time_measurements_hyper_synthesis",
    "time_measurements_factorized_model",
    "time_measurements_gaussian_model",
    "time_measurements_geometry_compression",
    "time_measurements_occupancy_coding",
    "time_measurements_bitstream_writing",
]
DEC_STEPS = [
    "time_measurements_bitstream_reading",
    "time_measurements_geometry_decompression",
    "time_measurements_factorized_model",
    "time_measurements_hyper_synthesis",
    "time_measurements_guassian_model",  # (sic) reference schema
    "time_measurements_synthesis_transform",
]


def run_row(log_dir: str, skip: int) -> dict | None:
    tx_csv = os.path.join(log_dir, "sender", "log.csv")
    rx_csv = os.path.join(log_dir, "receiver", "log.csv")
    if not (os.path.exists(tx_csv) and os.path.exists(rx_csv)):
        return None
    tx = pd.read_csv(tx_csv)
    rx = pd.read_csv(rx_csv)
    m = re.search(r"logs_(\d+)fps", log_dir)
    fps = int(m.group(1)) if m else -1

    tx_w = tx.iloc[skip:]
    rx_w = rx.iloc[skip:]

    def med_sum(df, cols):
        cols = [c for c in cols if c in df.columns]
        return float(df[cols].sum(axis=1).median()) if len(df) else float("nan")

    # publish cadence: median gap between consecutive published segments
    # (1/fps = real-time; larger means the encoder pool is the throttle)
    pub_gap = float(
        tx_w["timestamps_server_published"].diff().median()
    ) if len(tx_w) > 1 else float("nan")
    # in-window loss: published IDs up to the last received one
    last_rx = int(rx["ID"].max()) if len(rx) else -1
    win = tx[tx["ID"] <= last_rx]
    lost = sorted(set(win["ID"].astype(int)) - set(rx["ID"].astype(int)))
    return {
        "fps": fps,
        "segs_tx": int(len(tx)),
        "segs_rx": int(len(rx)),
        "enc_step_sum_s": round(med_sum(tx_w, ENC_STEPS), 3),
        "publish_gap_s": round(pub_gap, 3),
        "dec_step_sum_s": round(med_sum(rx_w, DEC_STEPS), 3),
        "bpp": round(float(rx_w["gop_info_bpp"].median()), 3) if len(rx_w) else None,
        "in_window_lost": lost[:10],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="evaluation/r5m")
    ap.add_argument("--skip", type=int, default=5)
    args = ap.parse_args()
    rows = []
    for d in sorted(glob.glob(os.path.join(args.dir, "logs_*fps"))):
        r = run_row(d, args.skip)
        if r:
            rows.append(r)
            print(json.dumps(r), flush=True)
    if rows:
        print("\n| fps | segs tx/rx | encode cost/seg | publish gap | decode wall/seg | bpp |")
        print("|---|---|---|---|---|---|")
        for r in sorted(rows, key=lambda x: x["fps"]):
            print(
                f"| {r['fps']} | {r['segs_tx']}/{r['segs_rx']} | {r['enc_step_sum_s']} s "
                f"| {r['publish_gap_s']} s | {r['dec_step_sum_s']} s | {r['bpp']} |"
            )


if __name__ == "__main__":
    main()
