"""pbrt_tpu — a TPU-native spectral physically-based renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
scienstanford/pbrt-v2-spectral (the Stanford vision-science fork of pbrt-v2):
full spectral light transport (32 bins, 395-715nm), lens-simulation cameras
(multi-element spherical lens stacks with wavelength-dependent refraction,
HURB diffraction, schematic human eye), multispectral film output for ISET,
and metadata (depth / mesh-mask / material-mask) rendering.

Architecture (TPU-first, NOT a port):
  - Wavefront path tracing: SoA path-state arrays (origin, direction,
    throughput[nbins], radiance[nbins], rng-key, depth, alive mask) advanced
    by a fixed per-bounce kernel sequence under ``lax.while_loop``.
  - Flattened SoA scene in HBM: triangle soup + quadric table + linear BVH
    node arrays; traversal is a batched short-stack walk (Pallas / lax).
  - Spectra are a trailing wavelength axis on tensors, not a class.
  - Parallelism: ``shard_map`` over a device mesh, film partials ``psum``-
    reduced — replacing the reference's pthreads tile pool
    (reference: src/core/parallel.{h,cpp}).
  - Deterministic counter-based RNG (threefry) split per
    (pixel, sample, bounce) — replacing per-task MT19937 seeding.
"""

__version__ = "0.1.0"

from pbrt_tpu.config import SpectralConfig, DEFAULT_SPECTRAL  # noqa: F401
