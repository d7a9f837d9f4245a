"""SpectralRenderer: the fork's per-wavelength renderer.

Reference: src/renderers/spectralrenderer.{h,cpp} — splits the 32-bin
spectrum into ``nWaveBands`` bands (param, default 32; api.cpp:1378). Two
modes (``samplingMethod``, api.cpp:1379):
  - ``singleDirection``: every camera sample is traced once **per band**
    (cost ×nWaveBands) with ``ray.wavelength`` set to the band center
    (spectralrenderer.cpp:124) so lens cameras refract chromatically;
  - ``samplerDirection``: bands are assigned round-robin across sampler
    rays (one band per sample).
After tracing, the traced wavelength's radiance is extracted with
GetValueAtWavelength (:180) and written into the band's bin range via
AssignValueAtIndex (:183-188).

TPU-native design: the band index is a **traced scalar**, so all bands
share one compiled wave kernel; within a wave the whole pixel wavefront
carries one λ (maximally coherent lens refraction). The band loop is the
only Python loop added over the sampler renderer.

Known reference quirks intentionally NOT reproduced (SURVEY.md §7):
``samplerDirection``'s loop-index overwrite (spectralrenderer.cpp:122
mutates the loop var) and the Ls[i]/Ls_thisRay validation mismatch
(:163-168) — we implement the documented intent.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.film import film as film_mod
from pbrt_tpu.integrators.path import trace_radiance
from pbrt_tpu.renderers.sampler import _sampler_uniforms


def spectral_wave(
    film_state, scene, camera, filter_table, pixel_x, pixel_y,
    sample_idx, band_idx, n_bands, root_key, icfg, sampler_name, spp,
    film_cfg, spectral_cfg,
):
    """One (sample, band) wave: trace at the band-center wavelength, write
    the extracted value into the band's bin range."""
    S = spectral_cfg.n_bins
    delta_index = S // n_bands
    delta_wave = (spectral_cfg.lambda_end - spectral_cfg.lambda_start) / n_bands
    lam = (
        spectral_cfg.lambda_start
        + delta_wave * band_idx.astype(jnp.float32)
        + delta_wave * 0.5
    )
    W = film_state.weight.shape[1]
    pixel_index = pixel_y * W + pixel_x
    keys = rngmod.pixel_sample_key(root_key, pixel_index, sample_idx)
    pixel_keys = rngmod.pixel_sample_key(
        root_key, pixel_index, jnp.zeros_like(pixel_index)
    )
    iu, iv, lu, lv, tu = _sampler_uniforms(
        sampler_name, pixel_index, sample_idx,
        keys if sampler_name in ("random", "stratified") else pixel_keys,
        spp,
    )
    px = pixel_x.astype(jnp.float32) + iu
    py = pixel_y.astype(jnp.float32) + iv
    lam_arr = jnp.full(px.shape, lam, jnp.float32)
    rays = camera.generate_rays(px, py, lu, lv, tu, wavelength=lam_arr, keys=keys)
    L_full, first_t = trace_radiance(scene, rays, keys, icfg)
    bad = jnp.isnan(L_full) | (L_full < 0.0) | jnp.isinf(L_full)
    L_full = jnp.where(bad, 0.0, L_full)
    # extract the traced wavelength's value (reference :180)
    v = spec.value_at_wavelength(L_full, lam_arr, spectral_cfg)
    # write it into this band's bin range (reference :183-188)
    bins = jnp.arange(S)
    in_band = (bins >= band_idx * delta_index) & (
        bins < (band_idx + 1) * delta_index
    )
    L_band = jnp.where(in_band[None, :], v[:, None], 0.0)
    return film_mod.add_samples(
        film_state, film_cfg, px, py, L_band, first_t, filter_table
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_bands", "icfg", "sampler_name", "spp", "film_cfg",
                     "spectral_cfg"),
)
def _spectral_wave_jit(
    film_state, scene, camera, filter_table, pixel_x, pixel_y,
    sample_idx, band_idx, n_bands, root_key, icfg, sampler_name, spp,
    film_cfg, spectral_cfg,
):
    return spectral_wave(
        film_state, scene, camera, filter_table, pixel_x, pixel_y,
        sample_idx, band_idx, n_bands, root_key, icfg, sampler_name, spp,
        film_cfg, spectral_cfg,
    )


def render_spectral(built, spp=None, seed=0, quick=False, verbose=True,
                    chunk_pixels=None):
    from pbrt_tpu.config import DEFAULT_SPECTRAL, SpectralConfig

    cfg = built.film_config
    icfg = built.integrator
    params = built.renderer_params
    n_bands = params.find_one_int("nWaveBands", 32) if params else 32
    method = (
        params.find_one_string("samplingMethod", "singleDirection")
        if params
        else "singleDirection"
    )
    scfg = SpectralConfig(n_bins=cfg.n_bins) if cfg.n_bins != 32 else DEFAULT_SPECTRAL
    if scfg.n_bins % n_bands != 0:
        raise ValueError(f"nWaveBands={n_bands} must divide {scfg.n_bins}")
    spp = spp if spp is not None else built.pixel_samples
    if quick:
        spp = 1
    x0, x1, y0, y1 = cfg.pixel_bounds
    gx, gy = np.meshgrid(
        np.arange(x0, x1, dtype=np.int32), np.arange(y0, y1, dtype=np.int32)
    )
    all_x = jnp.asarray(gx.ravel())
    all_y = jnp.asarray(gy.ravel())
    film_state = film_mod.init_film(cfg)
    root = rngmod.root_key(seed)
    table = jnp.asarray(built.filter_table)
    t0 = time.time()
    total = spp * (n_bands if method == "singleDirection" else 1)
    done = 0
    for s in range(spp):
        if method == "singleDirection":
            bands = range(n_bands)
        else:  # samplerDirection: one band per sample, round-robin
            bands = [s % n_bands]
        for b in bands:
            film_state = _spectral_wave_jit(
                film_state, built.scene, built.camera, table, all_x, all_y,
                jnp.int32(s), jnp.int32(b), n_bands, root, icfg,
                built.sampler_name, spp, cfg, scfg,
            )
            done += 1
            if verbose:
                el = time.time() - t0
                print(
                    f"\r[pbrt_tpu] spectral wave {done}/{total} ({el:5.1f}s)",
                    end="", flush=True,
                )
    jax.block_until_ready(film_state.pixels)
    if verbose:
        print(f"\n[pbrt_tpu] spectral render done in {time.time()-t0:.2f}s")
    return film_state
