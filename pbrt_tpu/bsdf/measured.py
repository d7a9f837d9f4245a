"""Measured BRDFs: scattered spectral (.brdf) and MERL half-angle (.merl).

Reference: src/materials/measured.cpp + core/reflection.{h,cpp}
(IrregIsotropicBRDF :472-483, RegularHalfangleBRDF :484-499, BRDFRemap).

  - ``.brdf``: text — numWls, wavelengths, then rows of
    (θi, φi, θo, φo, spectrum[numWls]) (measured.cpp:29-42). The reference
    stores samples in a kd-tree keyed by the Marschner-style remap
    p = (sinθi·sinθo, Δφ/π, cosθi·cosθo) and evaluates with an
    e^{−100·d²} weighted average of nearby samples.
  - ``.merl``: binary MERL: 3 int32 dims (90, 90, 180) + doubles, indexed by
    (sqrt-remapped θh, θd, φd), channel scales (1/1500, 1.15/1500,
    1.66/1500).

TPU-native design: the kd-tree becomes a **dense masked Gaussian gather**
over the (capped) sample pool — distance computation is a small matmul, the
weighted reduction fuses; no pointer chasing. MERL tables are flat arrays
with computed indices. Pools live in the MaterialTable and are threaded
unmapped through the vmapped lobe dispatch.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import spectrum as spec_mod

#: cap on retained .brdf samples per file (memory: eval builds (R, P) weights)
MAX_IRREG_SAMPLES = 1500

MERL_N_THETA_H = 90
MERL_N_THETA_D = 90
MERL_N_PHI_D = 180
_MERL_SCALE = np.array([1.0 / 1500.0, 1.15 / 1500.0, 1.66 / 1500.0])


def brdf_remap(wo, wi):
    """(reference: BRDFRemap, core/reflection.cpp) — local-frame dirs →
    3D lookup point. Works on (..., 3)."""
    cosi = wi[..., 2]
    coso = wo[..., 2]
    sini = jnp.sqrt(jnp.maximum(0.0, 1.0 - cosi * cosi))
    sino = jnp.sqrt(jnp.maximum(0.0, 1.0 - coso * coso))
    phii = jnp.arctan2(wi[..., 1], wi[..., 0])
    phio = jnp.arctan2(wo[..., 1], wo[..., 0])
    dphi = phii - phio
    dphi = jnp.where(dphi < 0.0, dphi + 2 * jnp.pi, dphi)
    dphi = jnp.where(dphi > 2 * jnp.pi, dphi - 2 * jnp.pi, dphi)
    dphi = jnp.where(dphi > jnp.pi, 2 * jnp.pi - dphi, dphi)
    return jnp.stack([sini * sino, dphi / jnp.pi, cosi * coso], axis=-1)


#: radius-doubling schedule of IrregIsotropicBRDF::f (reflection.cpp:254-263):
#: start maxDist2=.001, double until >2 samples found or maxDist2 > 1.5.
_IRREG_R2 = 0.001 * (2.0 ** np.arange(12, dtype=np.float64))


def irreg_f_one(points, spectra, offset, count, wo, wi):
    """Per-lane IrregIsotropic eval (reference: IrregIsotropicBRDF::f,
    reflection.cpp:251-264): find the smallest radius in the doubling
    schedule holding >2 samples, then Gaussian-weight (e^{-100 d²}) ONLY the
    samples inside it. The radius restriction matters: a global Gaussian
    blend smears sharp specular lobes (measured r3 on mystique.brdf: up to
    80x too bright at highlight configurations). points (P, 3),
    spectra (P, S); offset/count scalar.
    """
    m = brdf_remap(wo, wi)
    P = points.shape[0]
    idx = jnp.arange(P)
    in_range = (idx >= offset) & (idx < offset + count)
    d2 = jnp.sum((points - m) ** 2, axis=-1)
    d2 = jnp.where(in_range, d2, jnp.inf)
    r2s = jnp.asarray(_IRREG_R2, d2.dtype)
    counts = jnp.sum(d2[None, :] < r2s[:, None], axis=1)  # (12,)
    ok = (counts > 2).at[-1].set(True)  # last step = the >1.5 bail-out
    r2 = r2s[jnp.argmax(ok)]
    w = jnp.where(d2 < r2, jnp.exp(-100.0 * d2), 0.0)
    wsum = jnp.sum(w)
    v = jnp.maximum(w @ spectra, 0.0)  # reference clamps v before dividing
    return jnp.where(wsum > 1e-9, v / wsum, 0.0)


def merl_f_one(table, offset, wo, wi, config_tables):
    """Per-lane MERL eval. table (Q, 3) rgb pool; offset scalar."""
    wh = wo + wi
    whn = geom.normalize(wh)
    # half-angle coordinates (reference: RegularHalfangleBRDF::f)
    wh_theta = jnp.arccos(jnp.clip(whn[2], -1.0, 1.0))
    wh_phi = jnp.arctan2(whn[1], whn[0])
    # rotate wi into the half-vector frame to get the difference vector
    def rotate(v, axis, angle):
        c = jnp.cos(angle)
        s = jnp.sin(angle)
        return (
            v * c
            + jnp.cross(axis, v) * s
            + axis * jnp.dot(axis, v) * (1.0 - c)
        )

    z = jnp.asarray([0.0, 0.0, 1.0])
    wd = rotate(wi, z, -wh_phi)
    wd = rotate(wd, jnp.asarray([0.0, 1.0, 0.0]), -wh_theta)
    wd_theta = jnp.arccos(jnp.clip(wd[2], -1.0, 1.0))
    wd_phi = jnp.arctan2(wd[1], wd[0])
    wd_phi = jnp.where(wd_phi < 0.0, wd_phi + jnp.pi, wd_phi)
    # indices (sqrt remap on θh)
    th_idx = jnp.clip(
        (jnp.sqrt(jnp.maximum(wh_theta / (jnp.pi / 2), 0.0)) * MERL_N_THETA_H)
        .astype(jnp.int32), 0, MERL_N_THETA_H - 1,
    )
    td_idx = jnp.clip(
        (wd_theta / (jnp.pi / 2) * MERL_N_THETA_D).astype(jnp.int32),
        0, MERL_N_THETA_D - 1,
    )
    pd_idx = jnp.clip(
        (wd_phi / jnp.pi * MERL_N_PHI_D).astype(jnp.int32), 0, MERL_N_PHI_D - 1
    )
    flat = (th_idx * MERL_N_THETA_D + td_idx) * MERL_N_PHI_D + pd_idx
    rgb = table[offset + flat]
    return spec_mod.from_rgb(rgb)


# ---------------------------------------------------------------------------
# Host-side loaders
# ---------------------------------------------------------------------------


def load_irreg_brdf(path: str, config):
    """.brdf → (points (P, 3), spectra (P, S)) (capped, stratified subsample
    when the file exceeds MAX_IRREG_SAMPLES)."""
    from pbrt_tpu.scene.paramset import read_float_file

    vals = read_float_file(path)
    pos = 0
    num_wls = int(vals[pos]); pos += 1
    wls = vals[pos : pos + num_wls]; pos += num_wls
    rest = vals[pos:]
    stride = 4 + num_wls
    n = len(rest) // stride
    rows = rest[: n * stride].reshape(n, stride)
    thetai, phii = rows[:, 0], rows[:, 1]
    thetao, phio = rows[:, 2], rows[:, 3]
    spectra_raw = rows[:, 4:]

    def sph(theta, phi):
        st, ct = np.sin(theta), np.cos(theta)
        return np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)

    wo = sph(thetao, phio)
    wi = sph(thetai, phii)
    pts = np.asarray(brdf_remap(jnp.asarray(wo), jnp.asarray(wi)))
    # resample spectra into bins
    S = config.n_bins
    spectra = np.stack(
        [spec_mod.from_sampled(wls, spectra_raw[k], config) for k in range(n)]
    )
    if n > MAX_IRREG_SAMPLES:
        sel = np.linspace(0, n - 1, MAX_IRREG_SAMPLES).astype(int)
        pts, spectra = pts[sel], spectra[sel]
    return pts.astype(np.float32), spectra.astype(np.float32)


def load_merl(path: str):
    """.merl binary → (N³, 3) float32 RGB (pre-scaled)."""
    with open(path, "rb") as f:
        dims = np.frombuffer(f.read(12), "<i4")
        n = int(dims[0] * dims[1] * dims[2])
        if n != MERL_N_THETA_H * MERL_N_THETA_D * MERL_N_PHI_D:
            raise ValueError(f"{path}: unexpected MERL dims {dims}")
        data = np.frombuffer(f.read(n * 3 * 8), "<f8")
    rgb = data.reshape(3, n).T * _MERL_SCALE
    return np.maximum(rgb, 0.0).astype(np.float32)
