"""Persistent XLA compile-cache configuration (one definition for every
script / entry point).

Two hygiene rules, both learned the hard way (PERF.md decision #6, VERDICT
r4 weak #7):

1. **Never mix platforms in one cache directory.** The axon relay serializes
   remote TPU compiles at 20-90 s/graph, so the TPU cache must persist
   across runs (repo-local ``.jax_cache_tpu``); XLA:CPU artifacts written
   into the same directory would collide on key prefixes and bloat it.
2. **XLA:CPU AOT artifacts are machine-specific.** The CPU backend bakes the
   compile host's CPU feature set (AVX-512 variants etc.) into the cached
   executable; loading it on a host with different features logs
   "could lead to execution errors such as SIGILL" — and can. CPU cache
   directories therefore carry a per-machine key derived from the host's
   CPU feature flags, so a shared /tmp or a repo checkout moved between
   machines never replays foreign AOT code.
"""

from __future__ import annotations

import functools
import hashlib
import os

TPU_CACHE_DIR = "/root/repo/.jax_cache_tpu"


@functools.lru_cache(maxsize=None)
def machine_key() -> str:
    """Short stable key for this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def cpu_cache_dir(tag: str = "cpu") -> str:
    return f"/tmp/pct_jax_cache_{tag}_{machine_key()}"


def setup_compile_cache(cpu: bool = False, tag: str = "cpu") -> str:
    """Point JAX's persistent compile cache at the right directory.

    ``cpu=True`` (or JAX already pinned to the CPU platform) selects the
    per-machine CPU directory; otherwise the shared repo-local TPU cache.
    Returns the chosen directory."""
    import jax

    if not cpu:
        cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    path = cpu_cache_dir(tag) if cpu else TPU_CACHE_DIR
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return path
