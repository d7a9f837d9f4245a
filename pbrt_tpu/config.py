"""Global configuration for the spectral representation and rendering.

The reference hard-codes the spectral range at compile time
(reference: src/core/spectrum.h:39-43 — sampledLambdaStart=395,
sampledLambdaEnd=715, nSpectralSamples=32). Here the bin count and range are
a runtime config constant; 32 bins over [395, 715) nm is the default so
reference scenes reproduce, and 30/[400,700) (upstream pbrt-v2's original
values, spectrum.h.original) is available as a preset.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SpectralConfig:
    """Static description of the wavelength discretization.

    Bin ``i`` covers [lambda_start + i*step, lambda_start + (i+1)*step) with
    step = (lambda_end - lambda_start) / n_bins.
    """

    lambda_start: float = 395.0
    lambda_end: float = 715.0
    n_bins: int = 32

    @property
    def step(self) -> float:
        return (self.lambda_end - self.lambda_start) / self.n_bins

    @property
    def bin_edges(self) -> np.ndarray:
        """(n_bins+1,) bin edge wavelengths in nm."""
        return np.linspace(self.lambda_start, self.lambda_end, self.n_bins + 1)

    @property
    def bin_centers(self) -> np.ndarray:
        """(n_bins,) bin center wavelengths in nm."""
        e = self.bin_edges
        return 0.5 * (e[:-1] + e[1:])


#: The reference fork's configuration: 32 bins on [395, 715) nm, band centers
#: on round multiples of 10 (400, 410, ..., 710).
DEFAULT_SPECTRAL = SpectralConfig()

#: Upstream pbrt-v2 original: 30 bins on [400, 700).
UPSTREAM_SPECTRAL = SpectralConfig(lambda_start=400.0, lambda_end=700.0, n_bins=30)
