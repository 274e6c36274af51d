"""Test configuration: run the suite on a local virtual 8-device CPU mesh.

Multi-chip sharding is validated on ``xla_force_host_platform_device_count=8``
(no multi-chip TPU hardware in CI); kernels are written for TPU and also pass
here in XLA:CPU / Pallas interpret mode.

Note: the harness sitecustomize registers a remote-TPU PJRT plugin and forces
``jax_platforms="axon,cpu"`` via jax.config (env vars cannot override it), and
initializing that backend costs minutes of tunnel handshake per process. Tests
must be local + fast, so we pin the config to cpu before any backend
initialization; ``bench.py`` / ``__graft_entry__.py`` use the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The harness sitecustomize can route XLA:CPU compiles through the remote
# axon compile service — whose host has different CPU features. Remotely
# compiled AOT results land in the persistent cache and SEGFAULT/SIGILL when
# loaded here (observed: suite crash in backend_compile_and_load /
# put_executable_and_time). Compile locally, always.
for _k in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS"):
    os.environ.pop(_k, None)
# XLA:CPU accumulates memory mappings per compiled executable (measured
# ~360 maps/s over a full-suite run, ~60k total); at the kernel default
# vm.max_map_count=65530 a late-suite compile's mmap fails and LLVM
# SEGFAULTS (reproduced at whatever test crosses the limit). Raise the
# limit when we can (root container); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 262144:
            _f.seek(0)
            _f.write("262144")
except (OSError, ValueError):
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is dominated by XLA:CPU compiles of the
# jitted codec graphs; cache them across runs. Disable with PCT_NO_CPU_CACHE=1
# (diagnostic for AOT-load crashes).
if os.environ.get("PCT_NO_CPU_CACHE") != "1":
    # per-machine dir: CPU AOT artifacts bake host CPU features (SIGILL on
    # foreign machines) — pct.utils.jaxcache keys the path by /proc/cpuinfo
    from pct.utils.jaxcache import cpu_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
