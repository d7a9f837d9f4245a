"""Typed parameter sets parsed from scene files.

Reference: src/core/paramset.{h,cpp} — the typed name→value store every
plugin is configured from, including spectra declared as RGB / XYZ /
blackbody / inline (λ, value) pairs / ``.spd`` files with a static cache
(paramset.cpp:145-182), and unused-parameter warnings (ReportUnused).

Host-side. Spectra are resolved to binned numpy arrays at parse time so the
device only ever sees (n_bins,) constants.
"""

from __future__ import annotations

import os
import warnings

import numpy as np

from pbrt_tpu.config import DEFAULT_SPECTRAL, SpectralConfig
from pbrt_tpu.core import spectrum as spec

# value kinds stored in a ParamSet entry
_SCALAR_PER_ITEM = {
    "integer": 1,
    "float": 1,
    "bool": 1,
    "string": 1,
    "texture": 1,
    "point": 3,
    "vector": 3,
    "normal": 3,
    "rgb": 3,
    "color": 3,
    "xyz": 3,
}


def read_float_file(path: str) -> np.ndarray:
    """Whitespace/#-comment-tolerant float list
    (reference: core/floatfile.{h,cpp})."""
    vals = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0]
            for w in line.split():
                vals.append(float(w))
    return np.asarray(vals, dtype=np.float64)


_spd_cache: dict = {}


def load_spd(path: str, config: SpectralConfig = DEFAULT_SPECTRAL) -> np.ndarray:
    """Load a .spd file (alternating λ, value) and bin-average it.

    Cached by (abspath, config) — reference: paramset.cpp:145-182
    (AddSampledSpectrumFiles + cachedSpectra)."""
    key = (os.path.abspath(path), config)
    if key in _spd_cache:
        return _spd_cache[key]
    vals = read_float_file(path)
    if len(vals) % 2 != 0:
        vals = vals[: len(vals) - 1]
    lam, v = vals[0::2], vals[1::2]
    out = spec.from_sampled(lam, v, config)
    _spd_cache[key] = out
    return out


class ParamSet:
    """name → (type, value) mapping with FindOne*/Find* getters and
    use-tracking (reference: paramset.h:41-140)."""

    def __init__(self, entries=None, search_dir: str = ".", config=DEFAULT_SPECTRAL):
        self.entries: dict[str, tuple[str, object]] = dict(entries or {})
        self.search_dir = search_dir
        self.config = config
        self._used: set[str] = set()

    # -- construction -------------------------------------------------------
    def add(self, ptype: str, name: str, values: list):
        self.entries[name] = (ptype, values)

    # -- typed getters ------------------------------------------------------
    def _get(self, name, expect_types):
        ent = self.entries.get(name)
        if ent is None:
            return None
        ptype, values = ent
        if ptype not in expect_types:
            return None
        self._used.add(name)
        return values

    def find_one_float(self, name, default):
        v = self._get(name, ("float", "integer"))
        return float(v[0]) if v else float(default)

    def find_one_int(self, name, default):
        v = self._get(name, ("integer", "float"))
        return int(v[0]) if v else int(default)

    def find_one_bool(self, name, default):
        v = self._get(name, ("bool",))
        if not v:
            return bool(default)
        x = v[0]
        if isinstance(x, str):
            return x == "true"
        return bool(x)

    def find_one_string(self, name, default):
        v = self._get(name, ("string",))
        return str(v[0]) if v else default

    def find_one_filename(self, name, default=""):
        s = self.find_one_string(name, "")
        if not s:
            return default
        if not os.path.isabs(s):
            s = os.path.join(self.search_dir, s)
        return s

    def find_one_point(self, name, default):
        v = self._get(name, ("point", "vector", "normal"))
        return np.asarray(v[:3], np.float64) if v else np.asarray(default, np.float64)

    find_one_vector = find_one_point
    find_one_normal = find_one_point

    def find_texture(self, name):
        v = self._get(name, ("texture",))
        return str(v[0]) if v else None

    def find_one_spectrum(self, name, default, kind="reflectance"):
        """Resolve any spectral declaration to a binned (n_bins,) array.

        Handles: "rgb"/"color", "xyz", "spectrum" (inline pairs or .spd
        file), "blackbody" (T, scale) — reference: paramset.cpp:293-380.

        Parity quirk: the reference converts ALL rgb/xyz ParamSet values with
        the REFLECTANCE basis regardless of context — AddRGBSpectrum
        (paramset.cpp:89-97) calls FromRGB with its default type, and the
        SpectrumType argument of the parser's InitParamSet is shadowed by a
        local and never used (pbrtparse.cpp:2388-2391). The illuminant basis
        is only reached through light image-map texel conversion
        (SPECTRUM_ILLUMINANT at infinite.cpp:113 etc.), so ``kind`` here only
        affects defaults supplied as RGB triples."""
        ent = self.entries.get(name)
        cfg = self.config
        if ent is None:
            return self._default_spectrum(default, kind)
        ptype, values = ent
        self._used.add(name)
        if ptype in ("rgb", "color"):
            rgb = np.asarray(values[:3], np.float64)
            return np.asarray(
                spec.from_rgb(rgb.astype(np.float32), "reflectance", cfg)
            )
        if ptype == "xyz":
            xyz = np.asarray(values[:3], np.float64)
            return np.asarray(
                spec.from_xyz(xyz.astype(np.float32), "reflectance", cfg)
            )
        if ptype == "blackbody":
            t = float(values[0])
            sc = float(values[1]) if len(values) > 1 else 1.0
            return spec.blackbody(t, cfg, normalize=True) * sc
        if ptype == "spectrum":
            if values and isinstance(values[0], str):
                path = values[0]
                if not os.path.isabs(path):
                    path = os.path.join(self.search_dir, path)
                return load_spd(path, cfg)
            arr = np.asarray(values, np.float64)
            return spec.from_sampled(arr[0::2], arr[1::2], cfg)
        if ptype in ("float", "integer"):
            return np.full(cfg.n_bins, float(values[0]), np.float32)
        return self._default_spectrum(default, kind)

    def _default_spectrum(self, default, kind):
        cfg = self.config
        if np.isscalar(default):
            return np.full(cfg.n_bins, float(default), np.float32)
        default = np.asarray(default, np.float64)
        if default.shape == (3,):
            return np.asarray(spec.from_rgb(default.astype(np.float32), kind, cfg))
        if default.shape == (cfg.n_bins,):
            return default.astype(np.float32)
        raise ValueError(f"bad default spectrum shape {default.shape}")

    def find_floats(self, name):
        v = self._get(name, ("float", "integer"))
        return np.asarray(v, np.float64) if v is not None else None

    def find_ints(self, name):
        v = self._get(name, ("integer", "float"))
        return np.asarray(v, np.int64) if v is not None else None

    def find_points(self, name):
        v = self._get(name, ("point", "vector", "normal", "float"))
        if v is None:
            return None
        a = np.asarray(v, np.float64)
        return a.reshape(-1, 3)

    find_vectors = find_points
    find_normals = find_points

    def find_strings(self, name):
        v = self._get(name, ("string",))
        return list(v) if v is not None else None

    def has(self, name) -> bool:
        return name in self.entries

    def report_unused(self, where: str = ""):
        """(reference: ParamSet::ReportUnused, api.cpp:369 et al.)"""
        for name in self.entries:
            if name not in self._used:
                from pbrt_tpu.utils import error as err

                err.warning(f"unused parameter {name!r} {where}")

    def __repr__(self):
        return f"ParamSet({self.entries})"
