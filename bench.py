"""Benchmark: end-to-end encode+decode throughput of the unified codec.

Measures frames/sec through the full serial codec (neural transforms on the
TPU chip, entropy + octree coding on host) on a 5-frame / 1-second GOP of the
demo's own recorded data — the reference's 5 fps configuration, whose
measured baseline on the sender/receiver Jetson AGX Orin pair is
0.869 s encode + 0.756 s decode per segment => 5 / 1.625 = 3.08 fps
(BASELINE.md rows 3/7).

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import glob
import json
import pickle
import sys
import time

import numpy as np

BASELINE_FPS = 5.0 / (0.869 + 0.756)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_frames(n=5):
    files = sorted(glob.glob("/root/reference/evaluation/data/test/*.pkl"))[:n]
    frames = []
    for f in files:
        d = pickle.load(open(f, "rb"))
        frames.append(
            {
                "points": d["points"].astype(np.int32),
                "colors": d["colors"].astype(np.float32),
            }
        )
    if not frames:  # fall back to synthetic frames of the same scale
        rng = np.random.default_rng(0)
        for _ in range(n):
            pts = np.unique(rng.integers(-200, 200, (15000, 3)).astype(np.int32), axis=0)
            frames.append(
                {"points": pts, "colors": rng.random((pts.shape[0], 3)).astype(np.float32)}
            )
    return frames


def _tunnel_alive() -> bool:
    """The axon TPU relay tunnel listens on localhost ports; a dead tunnel
    makes jax backend init hang FOREVER (observed round 3: the tunnel
    process died after a long campaign and `jax.devices()` blocked 20+ min).
    Fail fast with a diagnosis instead."""
    import os
    import socket

    if os.environ.get("PALLAS_AXON_POOL_IPS") is None:
        return True  # not the relay rig (real chip or cpu) — let jax decide
    for port in (8082, 8083, 8087):
        s = socket.socket()
        s.settimeout(2)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def main():
    if not _tunnel_alive():
        log(
            "FATAL: TPU relay tunnel is down (no listener on the axon relay "
            "ports); jax init would hang. Not falling back to CPU — a CPU "
            "number would misrepresent chip throughput. Restore the relay "
            "and re-run."
        )
        sys.exit(3)

    import jax

    # Persistent compile cache: the TPU relay serializes remote compiles at
    # ~20-90 s per graph; cached runs skip all of it.
    from pct.utils.jaxcache import setup_compile_cache
    setup_compile_cache(cpu=False)
    log("devices:", jax.devices())
    from pct.models import ColorModel, UnifiedConfig
    from pct.pipeline import SerialDecoder, SerialEncoder

    frames = load_frames()
    num_frames = len(frames)
    num_points = sum(f["points"].shape[0] for f in frames)
    log(f"segment: {num_frames} frames, {num_points} points")

    import os

    tables = None
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "checkpoints", "demo.msgpack")
    if os.path.exists(ckpt):
        from pct.models import checkpoint as ckpt_mod

        model, params, tables = ckpt_mod.load_with_tables(ckpt)
        log(f"loaded trained checkpoint {ckpt}")
    else:
        cfg = UnifiedConfig(channels=(16, 32, 64), latent_channels=64, hyper_channels=32)
        model = ColorModel(cfg)
        params = model.init_params(jax.random.key(0))
    enc = SerialEncoder(model, params, tables)
    dec = SerialDecoder(model, params, tables)
    settings = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]  # reference config.yaml:12-15

    # warm-up (compile)
    t0 = time.time()
    levels, _ = enc.compress(frames, settings)
    out, _ = dec.decompress(levels[-1])
    log(f"warmup {time.time()-t0:.1f}s")

    reps = 3
    t_enc = t_dec = 0.0
    for _ in range(reps):
        t0 = time.time()
        levels, einfo = enc.compress(frames, settings)
        t_enc += time.time() - t0
        t0 = time.time()
        out, dinfo = dec.decompress(levels[-1])
        t_dec += time.time() - t0
    t_enc /= reps
    t_dec /= reps
    ok = all(
        o["points"].shape[0] == f["points"].shape[0] for o, f in zip(out, frames)
    )
    log(f"encode {t_enc:.3f}s decode {t_dec:.3f}s parity={ok}")
    log("enc steps:", {k: round(v, 4) for k, v in einfo["time_measurements"].items()})
    log("dec steps:", {k: round(v, 4) for k, v in dinfo["time_measurements"].items()})

    # device-graph execution vs host<->device transfer split (the bench rig's
    # chip sits behind a network relay; PCIe rigs see the graph time only)
    try:
        import jax.numpy as jnp

        from pct.pipeline.serial import _caps_for, _frames_to_arrays

        coords, feats, mask = _frames_to_arrays(frames)
        level_caps, cap_z = _caps_for(coords.shape[0])
        qs = jnp.asarray(np.asarray(settings, np.float32))
        dev_args = (jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(mask))
        jax.block_until_ready(dev_args)
        t0 = time.time()
        for _ in range(reps):
            out_dev = enc._stage1(
                enc.params, *dev_args, qs, len(frames), level_caps, cap_z
            )
            jax.block_until_ready(out_dev)
        t_graph = (time.time() - t0) / reps
        log(
            f"encode split: device graph {t_graph:.3f}s, "
            f"host+transfer {max(einfo['time_measurements']['analysis'] - t_graph, 0):.3f}s"
        )
    except Exception as e:  # noqa: BLE001 - diagnostic only
        log("device/transfer split failed:", repr(e))

    # secondary: pipelined throughput over 3 concurrent segments (the
    # system's real operating mode — both the reference and pct run 3-worker
    # segment pools); logged to stderr, not the headline metric
    try:
        from concurrent.futures import ThreadPoolExecutor

        from pct.pipeline import CompressionPipeline, DecompressionPipeline

        enc_p = CompressionPipeline(model, params, tables)
        dec_p = DecompressionPipeline(model, params, tables)
        # warm both pipeline objects (jit traces are shared by codec hash,
        # but the decode pipeline's head/neural split has its own first-call
        # costs)
        lv_w, _ = enc_p.compress(frames, settings)
        dec_p.decompress(lv_w[-1].pack())

        def one(_):
            lv, _i = enc_p.compress(frames, settings)
            return dec_p.decompress(lv[-1].pack())

        t0 = time.time()
        with ThreadPoolExecutor(max_workers=3) as ex:
            list(ex.map(one, range(3)))
        thr = 3 * num_frames / (time.time() - t0)
        log(f"pipelined throughput (3 segments in flight): {thr:.2f} frames/sec "
            f"({thr / BASELINE_FPS:.2f}x baseline)")
    except Exception as e:  # noqa: BLE001 - secondary metric must not break bench
        log("pipelined throughput measurement failed:", repr(e))

    fps = num_frames / (t_enc + t_dec)
    print(
        json.dumps(
            {
                "metric": "e2e_encode_decode_fps_5fps_segment",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
