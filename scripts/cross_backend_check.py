"""Cross-backend decode parity: encode on one backend, decode on another.

The decoder re-derives the Gaussian coding indexes from the transmitted
z symbols through h_s; a single index flip desynchronizes the sequential
rANS stream (pct/pipeline/serial.py docstring). Encoder and decoder round
(scale, mean) onto a 1/256 grid to absorb float drift — this script
*measures* whether that holds across backends instead of asserting it:

  1. encode N held-out frames on the current default backend (TPU when run
     under the harness env, else CPU),
  2. serialize the levels + the encoder's per-quality index planes,
  3. in a fresh ``JAX_PLATFORMS=cpu`` subprocess, decode and compare the
     decoder's derived indexes and recovered symbols bit-for-bit.

Exit code 0 iff every index and symbol matches on every frame/quality.

Usage: python scripts/cross_backend_check.py [--frames N] [--ckpt PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHILD = """
import os, pickle, sys
import numpy as np
sys.path.insert(0, "@REPO@")
import jax
jax.config.update("jax_platforms", "cpu")
from pct.models import checkpoint as ck
from pct.pipeline import SerialDecoder
from pct.pipeline.serial import _frames_to_arrays
from pct.entropy.bitstream import SegmentBitstream

blob = pickle.load(open("@PATH@", "rb"))
model, params, tables = ck.load_with_tables(blob["ckpt"])
dec = SerialDecoder(model, params, tables)
fails = []
for qi, lv_bytes in enumerate(blob["levels"]):
    lv = SegmentBitstream.unpack(lv_bytes)
    frames, _ = dec.decompress(lv)
    # decoder-side indexes: recompute through the decode phase1 path
    import jax.numpy as jnp
    coords = []
    from pct.gpcc import decode_points
    for b, g in enumerate(lv.gpcc_strings):
        pts = decode_points(g) * 8
        coords.append(np.concatenate([np.full((pts.shape[0], 1), b, np.int32), pts], 1))
    coords = np.concatenate(coords, 0)
    from pct.sparse.block import bucket_size
    ny = lv.y_shape
    cap = bucket_size(ny)
    mask = np.zeros(cap, bool); mask[:ny] = True
    coords = np.concatenate([coords, np.zeros((cap - ny, 4), np.int32)], 0)
    nz = lv.z_shape
    z_syms = model.entropy_bottleneck.decompress_symbols(dec.eb_tables, lv.z_string, nz).T.astype(np.int16)
    z_cap = bucket_size(nz)
    z_syms = np.concatenate([z_syms, np.zeros((z_cap - nz, z_syms.shape[1]), np.int16)], 0)
    q = jnp.asarray([lv.q_g, lv.q_a], jnp.float32)
    _, _, _, idx = dec._phase1(dec.params, jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(z_syms), q)
    idx = np.asarray(idx)[:ny]
    enc_idx = blob["enc_idxs"][qi]
    n_idx_flips = int((idx.astype(np.int32) != enc_idx.astype(np.int32)).sum())
    # symbol recovery
    sym = model.gaussian_conditional.decompress(dec.gc_tables, lv.y_string, idx.astype(np.int32)).astype(np.int16)
    n_sym_flips = int((sym != blob["enc_syms"][qi]).sum())
    print(f"q{qi}: idx flips {n_idx_flips}/{enc_idx.size}, symbol flips {n_sym_flips}/{sym.size}", flush=True)
    if n_idx_flips or n_sym_flips:
        fails.append(qi)
sys.exit(1 if fails else 0)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--ckpt", default="checkpoints/demo.msgpack")
    ap.add_argument("--data", default="/root/reference/evaluation/data/test")
    args = ap.parse_args()

    import glob

    import jax

    from pct.utils.jaxcache import setup_compile_cache
    setup_compile_cache(cpu=args.cpu)
    print("encode backend devices:", jax.devices(), flush=True)

    from pct.models import checkpoint as ck
    from pct.pipeline import SerialEncoder

    files = sorted(glob.glob(os.path.join(args.data, "*.pkl")))[: args.frames]
    frames = []
    for f in files:
        d = pickle.load(open(f, "rb"))
        frames.append(
            {"points": d["points"].astype(np.int32), "colors": d["colors"].astype(np.float32)}
        )
    model, params, tables = ck.load_with_tables(args.ckpt)
    enc = SerialEncoder(model, params, tables)
    settings = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    dev = enc.device_encode(frames, settings)
    levels, _ = enc.host_encode(dev, settings)

    blob = {
        "ckpt": os.path.abspath(args.ckpt),
        "levels": [lv.pack() for lv in levels],
        "enc_idxs": [dev["y_idxs"][qi] for qi in range(len(settings))],
        "enc_syms": [dev["y_syms"][qi] for qi in range(len(settings))],
    }
    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        pickle.dump(blob, f)
        path = f.name

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = CHILD.replace("@REPO@", repo).replace("@PATH@", path)
    r = subprocess.run([sys.executable, "-c", code], env=env)
    os.unlink(path)
    print("CROSS-BACKEND PARITY:", "OK" if r.returncode == 0 else "MISMATCH", flush=True)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
