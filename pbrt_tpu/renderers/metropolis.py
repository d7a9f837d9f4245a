"""MetropolisRenderer: Kelemen-style primary-sample-space MLT.

Reference: src/renderers/metropolis.{h,cpp} (802 LoC) — bootstrap phase to
estimate the normalization b, large/small primary-space mutations with
p_large (default .25), per-mutation film splats with expected-value
(acceptance-weighted) contributions, optional separate direct-lighting pass
(``dodirectseparately``).

TPU-native design: thousands of **parallel Markov chains**, one lane each —
a chain's state is its primary-sample vector u ∈ [0,1]^D plus its cached
(L, I). Each jitted step mutates every chain, re-traces the whole wavefront
through the standard path integrator (driven by ``PrimarySource`` uniforms),
applies Metropolis accept/reject lane-wise, and splats both candidate and
current states with expected-value weights. Replaces the reference's
single-chain sequential mutation loop with an embarrassingly parallel
ensemble (same stationary distribution; standard practice for GPU/TPU MLT).

Kelemen small-step: δ = s2·exp(−log(s2/s1)·U) applied per dimension with
wrap-around (reference: metropolis.cpp mutation sizes s1=1/1024, s2=1/16).

``bidirectional`` (reference default true, metropolis.cpp:513) switches the
estimator to the bidirectional connection machinery in
``integrators/bdpt.py`` (camera/light subpaths + i×j connections, the
Lbidir combination of metropolis.cpp:387-470); false uses the
unidirectional path estimator.

Divergences (documented): ``dodirectseparately``'s direct/indirect split is
not reproduced — the full path estimator is mutated (same expectation,
different variance profile). Splatting is nearest-pixel BY DESIGN: that is
the reference film contract (Film::Splat Floor2Int's into one pixel with no
filter, image.cpp:131-146; the fork's SpectralImageFilm::Splat body is the
splatC self-add bug at spectralImage.cpp:171 — we implement the intended
add-L semantics).
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.film import film as film_mod
from pbrt_tpu.integrators.path import PrimarySource, trace_radiance


def _eval_paths(built, u, keys, bidirectional=False):
    """Trace chains' primary vectors → (L (N,S), I (N,), px, py)."""
    cfg = built.film_config
    icfg = built.integrator
    px = u[:, 0] * cfg.xres
    py = u[:, 1] * cfg.yres
    rays = built.camera.generate_rays(
        px, py, u[:, 2], u[:, 3], u[:, 4], keys=keys
    )
    if bidirectional:
        from pbrt_tpu.integrators.bdpt import trace_bidir

        L, _ = trace_bidir(built.scene, rays, keys, icfg, uniforms=u)
    else:
        L, _ = trace_radiance(built.scene, rays, keys, icfg, uniforms=u)
    bad = jnp.isnan(L) | jnp.isinf(L) | (L < 0.0)
    L = jnp.where(bad, 0.0, L)
    I = spec.luminance(L)
    return L, I, px, py


def _mutate(u, key, p_large, s1=1.0 / 1024.0, s2=1.0 / 16.0):
    """Large-step w.p. p_large else Kelemen small-step, per chain."""
    N, D = u.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u_large = jax.random.uniform(k1, (N, D))
    eps = jax.random.uniform(k2, (N, D))
    sign = jnp.where(jax.random.uniform(k3, (N, D)) < 0.5, -1.0, 1.0)
    delta = s2 * jnp.exp(-jnp.log(s2 / s1) * eps)
    u_small = (u + sign * delta) % 1.0
    is_large = jax.random.uniform(k4, (N, 1)) < p_large
    return jnp.where(is_large, u_large, u_small), is_large[:, 0]


def render_metropolis(built, spp=None, seed=0, quick=False, verbose=True,
                      n_chains=16384):
    """Run parallel-chain PSSMLT; returns a FilmState with splats."""
    cfg = built.film_config
    params = built.renderer_params
    mpp = params.find_one_int("samplesperpixel", 100) if params else 100
    p_large = (
        params.find_one_float("largestepprobability", 0.25) if params else 0.25
    )
    n_bootstrap = (
        params.find_one_int("bootstrapsamples", 100000) if params else 100000
    )
    if quick:
        mpp = max(1, mpp // 16)
    # reference default: bidirectional = true (metropolis.cpp:513)
    bidir = params.find_one_bool("bidirectional", True) if params else True
    n_pixels = cfg.xres * cfg.yres
    if bidir:
        from pbrt_tpu.integrators.bdpt import n_dims_bidir

        D = n_dims_bidir(built.integrator.max_depth)
    else:
        D = PrimarySource.n_dims(built.integrator.max_depth)
    total_mutations = n_pixels * mpp
    n_iters = max(1, total_mutations // n_chains)

    root = jax.random.key(seed)
    chain_keys = rngmod.pixel_sample_key(
        rngmod.root_key(seed + 7), jnp.arange(n_chains), jnp.zeros(n_chains, jnp.int32)
    )

    # --- bootstrap: estimate b and seed chains ∝ I -----------------------
    nb = min(max(n_bootstrap, n_chains), 1 << 17)
    kb = jax.random.fold_in(root, 1)
    u_boot = jax.random.uniform(kb, (nb, D))
    Lb, Ib, _, _ = jax.jit(lambda u: _eval_paths(built, u, chain_keys[
        jnp.arange(nb) % n_chains], bidir))(u_boot)
    b = float(jnp.mean(Ib))
    if b <= 0.0:
        # black scene
        return film_mod.init_film(cfg)
    probs = np.maximum(np.asarray(Ib), 0.0)
    probs = probs / probs.sum()
    sel = np.random.default_rng(seed).choice(nb, n_chains, p=probs)
    u = u_boot[jnp.asarray(sel)]
    L, I, px, py = jax.jit(lambda u: _eval_paths(built, u, chain_keys, bidir))(u)

    splat = jnp.zeros((cfg.yres, cfg.xres, cfg.n_bins), jnp.float32)

    @jax.jit
    def step(carry, it):
        u, L, I, px, py, splat = carry
        key_it = jax.random.fold_in(root, 1000 + it)
        u_new, is_large = _mutate(u, key_it, p_large)
        L_new, I_new, px_new, py_new = _eval_paths(built, u_new, chain_keys, bidir)
        a = jnp.clip(I_new / jnp.maximum(I, 1e-12), 0.0, 1.0)
        # expected-value splatting (reference: metropolis.cpp:725-738):
        # candidate with weight a, current with weight 1-a; contributions
        # are L/I (radiance normalized by scalar importance). Splats are
        # NEAREST-PIXEL by the reference's own film contract —
        # Film::Splat Floor2Int's the sample position into a single pixel
        # with no filter (image.cpp:131-146); out-of-image splats are
        # dropped, not clamped (SpectralImageFilm::Splat's literal body is
        # the splatC+=splatC self-add bug at spectralImage.cpp:171; we
        # implement the intended add-L semantics)
        def splat_into(s, px_, py_, L_, w_):
            xi = jnp.floor(px_).astype(jnp.int32)
            yi = jnp.floor(py_).astype(jnp.int32)
            inside = (
                (xi >= 0) & (xi < cfg.xres) & (yi >= 0) & (yi < cfg.yres)
            )
            w_ = jnp.where(inside, w_, 0.0)
            xi = jnp.clip(xi, 0, cfg.xres - 1)
            yi = jnp.clip(yi, 0, cfg.yres - 1)
            return s.at[yi, xi].add(w_[:, None] * L_)

        w_new = a / jnp.maximum(I_new, 1e-12)
        w_old = (1.0 - a) / jnp.maximum(I, 1e-12)
        w_new = jnp.where(I_new > 0.0, w_new, 0.0)
        w_old = jnp.where(I > 0.0, w_old, 0.0)
        splat = splat_into(splat, px_new, py_new, L_new, w_new)
        splat = splat_into(splat, px, py, L, w_old)
        # accept/reject
        u_acc = jax.random.uniform(jax.random.fold_in(key_it, 99), (u.shape[0],))
        accept = u_acc < a
        u = jnp.where(accept[:, None], u_new, u)
        L = jnp.where(accept[:, None], L_new, L)
        I = jnp.where(accept, I_new, I)
        px = jnp.where(accept, px_new, px)
        py = jnp.where(accept, py_new, py)
        return (u, L, I, px, py, splat), None

    t0 = time.time()
    carry = (u, L, I, px, py, splat)
    for it in range(n_iters):
        carry, _ = step(carry, jnp.int32(it))
        if verbose and (it % max(1, n_iters // 20) == 0):
            print(f"\r[pbrt_tpu] MLT iter {it+1}/{n_iters} "
                  f"({time.time()-t0:5.1f}s)", end="", flush=True)
    (u, L, I, px, py, splat) = carry
    jax.block_until_ready(splat)
    if verbose:
        print(f"\n[pbrt_tpu] MLT done in {time.time()-t0:.2f}s (b={b:.4g})")

    # final scaling: each mutation deposits expected weight 1 in L/I units;
    # pixel estimate = splat · b / mutations_per_pixel
    mutations_per_pixel = n_chains * n_iters / n_pixels
    state = film_mod.init_film(cfg)
    state = dataclasses.replace(
        state,
        pixels=splat * (b / mutations_per_pixel),
        weight=jnp.ones((cfg.yres, cfg.xres), jnp.float32),
    )
    return state
