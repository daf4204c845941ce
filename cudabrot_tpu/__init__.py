"""cudabrot_tpu — a TPU-native Buddhabrot Monte-Carlo rendering engine.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the CUDA/HIP
reference renderer (yalue/cudabrot, /root/reference/cudabrot.cu): uniform
sampling of the complex plane, escape-time classification with a
min/max-iteration band, orbit replay scattered into a 2-D histogram, linear +
gamma tone mapping to 16-bit grayscale PGM, time-boxed render passes with
SIGINT-to-save, raw-buffer checkpoint/resume, and multi-band color
composition.

TPU-first design (none of this exists in the reference):
  * counter-based in-kernel PRNG (no cuRAND state arrays to allocate,
    initialize, or checkpoint) — cudabrot.cu:146-149 becomes a seed scalar,
  * a persistent-lane Pallas kernel that refills escaped/finished lanes with
    fresh samples every step, hiding escape-time divergence that would idle
    the VPU (the reference leans on SIMT divergence, cudabrot.cu:326-339),
  * Brent cycle detection to terminate interior orbits early instead of
    burning max_escape_iterations on them (cudabrot.cu:338-339 pays full
    price for every non-culled interior point),
  * deterministic histogram accumulation via pluggable TPU scatter backends
    (the reference races non-atomic `+=`, cudabrot.cu:302-314),
  * data-parallel scaling over a `jax.sharding.Mesh` with a single histogram
    reduction at save/checkpoint time (the reference is single-GPU,
    cudabrot.cu:155).
"""

from cudabrot_tpu.config import (
    Canvas,
    ConfigError,
    IterationBand,
    RenderConfig,
    SAMPLE_DOMAIN,
)
from cudabrot_tpu.models.fractals import FRACTALS, FractalMap

__version__ = "0.1.0"

__all__ = [
    "Canvas",
    "ConfigError",
    "IterationBand",
    "RenderConfig",
    "SAMPLE_DOMAIN",
    "FRACTALS",
    "FractalMap",
    "__version__",
]
