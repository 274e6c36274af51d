"""Offline evaluation: merge sender/receiver CSV logs, plot latencies/loss.

Re-implements the reference's evaluation pipeline (``evaluation/plot.py``):
joins the sender and receiver CSVs on segment ID, flags lost segments,
and produces (a) stacked per-step E*/D* latency bars, (b) coding-time vs
point-count scatters, (c) end-to-end latency stackplots
(capture -> encode -> publish -> transmit -> decode -> buffer), and
(d) measured-vs-sum-of-steps overhead. Figures are written as PDFs.
"""

from __future__ import annotations

import ast
import os


import numpy as np
import pandas as pd

ENC_STEPS = [
    "analysis",
    "hyper_analysis",
    "factorized_model",
    "hyper_synthesis",
    "gaussian_model",
    "geometry_compression",
    "bitstream_writing",
]
DEC_STEPS = [
    "bitstream_reading",
    "geometry_decompression",
    "factorized_model",
    "hyper_synthesis",
    "guassian_model",  # (sic) reference schema
    "synthesis_transform",
]


def _numeric(col: pd.Series) -> pd.Series:
    """Parse columns that may contain repr'd lists (sum them)."""

    def conv(v):
        if isinstance(v, str) and v.startswith("["):
            try:
                return float(np.sum(ast.literal_eval(v)))
            except (ValueError, SyntaxError):
                return np.nan
        try:
            return float(v)
        except (TypeError, ValueError):
            return np.nan

    return col.map(conv)


def load_data(sender_csv: str, receiver_csv: str) -> pd.DataFrame:
    """Outer-join on segment ID; ``packet_received`` False marks loss."""
    s = pd.read_csv(sender_csv)
    r = pd.read_csv(receiver_csv)
    r["packet_received"] = True  # explicit merge flag (reference plot.py:70)
    df = s.merge(r, on="ID", how="left", suffixes=("_tx", "_rx"))
    df["packet_received"] = df["packet_received"].fillna(False).astype(bool)
    return df


def _stacked_bars(ax, df, steps, prefix, title):
    xs = np.arange(len(df))
    bottom = np.zeros(len(df))
    for step in steps:
        col = f"{prefix}{step}"
        if col not in df:
            continue
        vals = _numeric(df[col]).fillna(0).to_numpy()
        ax.bar(xs, vals, bottom=bottom, label=step, width=1.0)
        bottom += vals
    ax.set_title(title)
    ax.set_xlabel("segment")
    ax.set_ylabel("seconds")
    ax.legend(fontsize=6)


def plot(
    sender_csv: str,
    receiver_csv: str,
    out_dir: str = "figures",
    name: str = "run",
) -> list[str]:
    """Produce the figure set; returns written paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    df = load_data(sender_csv, receiver_csv)
    written = []

    # (a) per-step stacked latency bars
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    _stacked_bars(axes[0], df, ENC_STEPS, "time_measurements_", "encoder steps")
    _stacked_bars(axes[1], df, DEC_STEPS, "time_measurements_", "decoder steps")
    p = os.path.join(out_dir, f"coding_times_{name}.pdf")
    fig.tight_layout(); fig.savefig(p); plt.close(fig)
    written.append(p)

    # (b) coding time vs num points
    if "num_points" in df or "num_points_tx" in df:
        npts = _numeric(df.get("num_points", df.get("num_points_tx")))
        enc_total = sum(
            (_numeric(df[f"time_measurements_{s}"]).fillna(0) for s in ENC_STEPS if f"time_measurements_{s}" in df),
            start=pd.Series(np.zeros(len(df))),
        )
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.scatter(npts, enc_total, s=8)
        ax.set_xlabel("points/segment"); ax.set_ylabel("encode seconds")
        p = os.path.join(out_dir, f"coding_time_vs_points_{name}.pdf")
        fig.tight_layout(); fig.savefig(p); plt.close(fig)
        written.append(p)

    # (c) end-to-end latency stackplot from traveling timestamps
    stages = [
        ("capturing", "sampling", "Capturer"),
        ("sampling", "codec_end", "Encoder"),
        ("codec_end", "server_published", "Publishing"),
        ("server_published", "client_received", "Transmission"),
        ("client_received", "decoder_finished", "Decoder"),
        ("decoder_finished", "client_playout_scheduled", "Buffer"),
    ]
    cols = {}
    for a, b, label in stages:
        ca = [c for c in df.columns if c.endswith(f"timestamps_{a}")]
        cb = [c for c in df.columns if c.endswith(f"timestamps_{b}")]
        if ca and cb:
            cols[label] = (_numeric(df[cb[0]]) - _numeric(df[ca[0]])).clip(lower=0).fillna(0)
    if cols:
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.stackplot(np.arange(len(df)), *cols.values(), labels=list(cols.keys()))
        ax.legend(fontsize=7); ax.set_xlabel("segment"); ax.set_ylabel("seconds")
        p = os.path.join(out_dir, f"end-to-end-latency_{name}.pdf")
        fig.tight_layout(); fig.savefig(p); plt.close(fig)
        written.append(p)

    # (d) measured wall time vs sum of instrumented steps (overhead check,
    # reference plot.py:335-398)
    enc_sum = sum(
        (_numeric(df[f"time_measurements_{s}"]).fillna(0) for s in ENC_STEPS if f"time_measurements_{s}" in df),
        start=pd.Series(np.zeros(len(df))),
    )
    t_start = [c for c in df.columns if "timestamps_codec_start" in c]
    t_end = [c for c in df.columns if "timestamps_codec_end" in c]
    if t_start and t_end:
        measured = _numeric(df[t_end[0]]) - _numeric(df[t_start[0]])
        fig, ax = plt.subplots(figsize=(8, 4))
        xs = np.arange(len(df))
        ax.plot(xs, measured, label="measured wall", lw=1)
        ax.plot(xs, enc_sum, label="sum of steps", lw=1)
        ax.fill_between(xs, enc_sum, measured, alpha=0.3, label="overhead")
        ax.legend(fontsize=7); ax.set_xlabel("segment"); ax.set_ylabel("seconds")
        p = os.path.join(out_dir, f"time-comp-vs-actual_{name}.pdf")
        fig.tight_layout(); fig.savefig(p); plt.close(fig)
        written.append(p)

    return written


if __name__ == "__main__":
    import sys

    print(plot(*sys.argv[1:]))
