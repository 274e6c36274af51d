"""pct — a TPU-native (JAX/XLA/Pallas) learned point-cloud compression & streaming framework.

Re-designed from scratch with the capabilities of the MMSys'25 demo
`ikt-luh/Demo-Learned-Point-Cloud-Compression` (see SURVEY.md):

- ``pct.sparse``   — sparse voxel tensor core: padded coordinate/feature blocks,
  canonical lexicographic ordering, dedup, sorted-search joins
  (replaces MinkowskiEngine's hash-map coordinate manager, reference
  ``shared/utils.py:116-165``).
- ``pct.ops``      — sparse convolution engine: kernel maps via sorted neighbor
  search, gather-GEMM-scatter convs, strided down-convs, generative
  transposed convs with occupancy top-k pruning (replaces MinkowskiEngine
  CUDA kernels).
- ``pct.entropy``  — factorized bottleneck + Gaussian conditional entropy models
  with TPU-computed CDF tables and a C++ rANS coder (replaces CompressAI).
- ``pct.gpcc``     — lossless octree geometry coder for latent coordinates
  (replaces the MPEG tmc13 subprocess, reference ``shared/utils.py:169-240``).
- ``pct.models``   — the unified variable-rate joint geometry+attribute codec
  model (the ``ColorModel`` API surface of SURVEY.md §2.3).
- ``pct.pipeline`` — pipelined encoder/decoder runtimes (reference
  ``sender/encoder/codec_pipeline.py`` / ``receiver/decoder/codec_parallel.py``).
- ``pct.streaming``— capturer/encoder/media-server/client/decoder/visualizer
  services + DASH MPD + transport (reference L3-L5).
- ``pct.parallel`` — jax.sharding meshes and pjit'd multi-chip train/encode steps.
- ``pct.train``    — rate-distortion training loop for the codec model.
- ``pct.eval``     — metrics (PSNR D1/D2, bpp), CSV telemetry, plotting.
"""

__version__ = "0.1.0"
