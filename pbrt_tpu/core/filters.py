"""Reconstruction filters (reference: src/filters/ — box, triangle,
gaussian, mitchell, sinc; src/core/filter.h).

TPU-native design: filters are evaluated once on host into a
``FILTER_TABLE_SIZE²`` table (the reference film does exactly this,
film/spectralImage.cpp:55-66) and the film kernel gathers weights from the
table — a filter's functional form never appears in the hot loop.
"""

from __future__ import annotations

import dataclasses

import numpy as np

FILTER_TABLE_SIZE = 16


@dataclasses.dataclass(frozen=True)
class Filter:
    """Host-side filter description; kind ∈ {box, triangle, gaussian,
    mitchell, sinc}."""

    kind: str = "box"
    xwidth: float = 0.5
    ywidth: float = 0.5
    alpha: float = 2.0  # gaussian
    B: float = 1.0 / 3.0  # mitchell
    C: float = 1.0 / 3.0
    tau: float = 3.0  # sinc

    def evaluate(self, x, y) -> np.ndarray:
        """Filter value at offsets (x, y) from the sample. numpy, host."""
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        if self.kind == "box":
            return np.ones(np.broadcast(x, y).shape)
        if self.kind == "triangle":
            return np.maximum(0.0, self.xwidth - np.abs(x)) * np.maximum(
                0.0, self.ywidth - np.abs(y)
            )
        if self.kind == "gaussian":
            def g(d, w):
                expv = np.exp(-self.alpha * w * w)
                return np.maximum(0.0, np.exp(-self.alpha * d * d) - expv)

            return g(x, self.xwidth) * g(y, self.ywidth)
        if self.kind == "mitchell":
            return self._mitchell_1d(x / self.xwidth) * self._mitchell_1d(
                y / self.ywidth
            )
        if self.kind == "sinc":
            return self._sinc_1d(x / self.xwidth) * self._sinc_1d(y / self.ywidth)
        raise ValueError(f"unknown filter kind {self.kind!r}")

    def _mitchell_1d(self, x):
        """(reference: filters/mitchell.h:53-68)."""
        x = np.abs(2.0 * x)
        B, C = self.B, self.C
        big = (
            (-B - 6 * C) * x**3
            + (6 * B + 30 * C) * x**2
            + (-12 * B - 48 * C) * x
            + (8 * B + 24 * C)
        ) / 6.0
        small = (
            (12 - 9 * B - 6 * C) * x**3
            + (-18 + 12 * B + 6 * C) * x**2
            + (6 - 2 * B)
        ) / 6.0
        return np.where(x > 2.0, 0.0, np.where(x > 1.0, big, small))

    def _sinc_1d(self, x):
        """Lanczos windowed sinc (reference: filters/sinc.h:52-63)."""
        x = np.abs(x)
        safe = np.where(x < 1e-5, 1.0, x)
        sinc = np.where(x < 1e-5, 1.0, np.sin(np.pi * safe) / (np.pi * safe))
        lanczos = np.where(
            x < 1e-5, 1.0, np.sin(np.pi * safe / self.tau) / (np.pi * safe / self.tau)
        )
        return np.where(x > 1.0, 0.0, sinc * lanczos)

    def table(self, size: int = FILTER_TABLE_SIZE) -> np.ndarray:
        """(size, size) table over the positive quadrant, sampled at cell
        centers (reference: film/spectralImage.cpp:55-66)."""
        fx = (np.arange(size) + 0.5) * self.xwidth / size
        fy = (np.arange(size) + 0.5) * self.ywidth / size
        return self.evaluate(fx[None, :], fy[:, None]).astype(np.float32)


def make_filter(kind: str, params: dict | None = None) -> Filter:
    """Factory with the reference's per-filter defaults
    (reference: filters/*.cpp Create*Filter)."""
    p = dict(params or {})
    defaults = {
        "box": dict(xwidth=0.5, ywidth=0.5),
        "triangle": dict(xwidth=2.0, ywidth=2.0),
        "gaussian": dict(xwidth=2.0, ywidth=2.0, alpha=2.0),
        "mitchell": dict(xwidth=2.0, ywidth=2.0, B=1.0 / 3.0, C=1.0 / 3.0),
        "sinc": dict(xwidth=4.0, ywidth=4.0, tau=3.0),
    }
    if kind not in defaults:
        raise ValueError(f"unknown filter {kind!r}")
    kw = defaults[kind]
    for k in list(kw):
        if k in p:
            kw[k] = float(p[k])
    # pbrt allows a single "width" override too
    if "width" in p:
        kw["xwidth"] = kw["ywidth"] = float(p["width"])
    return Filter(kind=kind, **kw)
