"""Irradiance-cache-equivalent and probe-based integrators.

Reference: src/integrators/irradiancecache.{h,cpp} (389 LoC) — octree-cached
hemispherical irradiance with gradients — and useprobes.{h,cpp} (SH probe
interpolation).

TPU-native design: the reference cache amortizes expensive hemisphere
gathers through an octree of cached samples + error-bounded interpolation
(irradiancecache.cpp:260-325). The wavefront analogue is a two-pass scheme
per wave: (1) gather irradiance at a strided subset of shading points (the
"cache fill" — 1/ic_stride of the lanes trace gather rays), recording the
reference's (E, wAvg, contribExtent) triple (:268-271 ``contribExtent =
Clamp(minHitDistance/2, minDist, maxDist)``); (2) every lane interpolates
over a window of nearby cache entries with the reference's error weights —
``perr = dist/maxDist``, ``nerr = sqrt((1-n·nᵢ)/(1-cosMaxAngle))``,
``wt = 1-max(perr, nerr)`` accepted when ``Σwt ≥ minWeight``
(IrradProcess::operator(), :308-325) — and lanes the cache cannot serve
fall back to a fresh (masked) gather, exactly the reference's cache-miss
path. The savings profile differs from the octree (masked fallback lanes
still occupy the wave), but the interpolation semantics and all four
quality knobs are the reference's. ``useprobes`` evaluates trilinearly-
interpolated SH probes (from createprobes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.accel.intersect import intersect
from pbrt_tpu.bsdf import bxdf
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.core import sh as sh_mod
from pbrt_tpu.core.interaction import offset_ray_origin, surface_interaction
from pbrt_tpu.materials import table as mat_mod
from pbrt_tpu.utils import pytree_dataclass, static_field


@pytree_dataclass
class ProbeGrid:
    lo: jnp.ndarray  # (3,)
    hi: jnp.ndarray  # (3,)
    coeffs: jnp.ndarray  # (nx, ny, nz, terms, S)
    lmax: int = static_field(default=4)


def _gather_irradiance(scene, si, diffuse, n_gather, frame, rays, keys, K,
                       key_salt, direct_cfg):
    """Cosine-weighted hemisphere gather at each lane's shading point →
    (E (R, S), wAvg (R, 3), min_hit (R,)) — the quantities the reference
    caches per sample (irradiancecache.cpp:245-271)."""
    from pbrt_tpu.integrators.path import trace_radiance
    from pbrt_tpu.core import spectrum as spec

    ss, ts = frame
    R = si.p.shape[0]
    S = scene.materials.kd.shape[-1]
    E = jnp.zeros((R, S))
    w_avg = jnp.zeros((R, 3))
    min_hit = jnp.full((R,), jnp.inf)
    for k in range(K):
        gk = rngmod.bounce_key(keys, key_salt + k, rngmod.BSDF_SAMPLE)
        u = rngmod.uniform_per(gk, 2)
        w_local = smp.cosine_sample_hemisphere(u[:, 0], u[:, 1])
        w = bxdf.local_to_world(w_local, ss, ts, n_gather)
        o = offset_ray_origin(si.p, si.ng, w, si.ray_epsilon)
        gather_rays = geom.Ray.make(
            jnp.where(diffuse[:, None], o, rays.origin),
            jnp.where(diffuse[:, None], w, rays.direction),
        )
        gkeys = rngmod.bounce_key(keys, key_salt + 100 + k, rngmod.CAMERA)
        Lg, t_hit = trace_radiance(scene, gather_rays, gkeys, direct_cfg)
        E = E + Lg * jnp.pi / K
        w_avg = w_avg + w * spec.luminance(Lg)[:, None]
        min_hit = jnp.minimum(
            min_hit, jnp.where(t_hit > 0.0, t_hit, jnp.inf)
        )
    return E, w_avg, min_hit


def irradiance_cache_li(scene, rays, keys, cfg):
    """directlighting + cached hemispherical indirect gather (reference:
    IrradianceCacheIntegrator::Li + indirectLo, irradiancecache.cpp:195-330;
    see the module docstring for the wavefront cache design)."""
    from pbrt_tpu.integrators.path import trace_radiance

    import dataclasses

    direct_cfg = dataclasses.replace(cfg, kind="directlighting")
    L_direct, first_t = trace_radiance(scene, rays, keys, direct_cfg)
    # primary hits for the gather
    hit = intersect(scene.geometry, rays)
    si = surface_interaction(scene.geometry, rays, hit)
    lm = mat_mod.gather_lane(scene.materials, si.material)
    diffuse = si.valid & ~mat_mod.has_delta_only(lm)
    # gather over the hemisphere FACING the viewer (reference:
    # ``ng = Faceforward(ng, wo)``, irradiancecache.cpp:216)
    n_gather = geom.face_forward(si.ns, si.wo)
    ss, ts = bxdf.make_shading_frame(n_gather, si.dpdu)
    R = rays.origin.shape[0]
    K = cfg.ao_nsamples  # "nsamples" param (reference default 4096; capped)

    # ---- pass 1: cache fill at a strided lane subset --------------------
    stride = max(1, min(cfg.ic_stride, R))
    sub = lambda a: a[::stride]
    si_c = jax.tree_util.tree_map(sub, si)
    rays_c = jax.tree_util.tree_map(sub, rays)
    E_c, wavg_c, minhit_c = _gather_irradiance(
        scene, si_c, sub(diffuse), sub(n_gather), (sub(ss), sub(ts)),
        rays_c, sub(keys), K, 100, direct_cfg,
    )
    # pixel spacing at the cache point: ray-cone width (the wavefront
    # analogue of sqrt(|dpdx × dpdy|), irradiancecache.cpp:219)
    spread = scene.pixel_spread if scene.pixel_spread > 0.0 else 5e-3
    ps_c = spread * jnp.maximum(sub(hit.t), 1e-6)
    ext_c = jnp.clip(
        minhit_c / 2.0, cfg.ic_minspacing * ps_c, cfg.ic_maxspacing * ps_c
    )  # contribExtent (irradiancecache.cpp:268-271)
    valid_c = sub(diffuse)

    # ---- pass 2: error-weighted interpolation over nearby entries -------
    # (IrradProcess::operator(), irradiancecache.cpp:308-325)
    cos_max = np.cos(np.deg2rad(max(cfg.ic_maxangle, 1e-3)))
    Rc = si_c.p.shape[0]
    n_c = sub(n_gather)
    j0 = jnp.arange(R) // stride
    WIN = 8  # cache entries examined per lane (window along the wave)
    sum_w = jnp.zeros((R,))
    E_i = jnp.zeros((R, E_c.shape[-1]))
    wavg_i = jnp.zeros((R, 3))
    for dj in range(-(WIN // 2 - 1), WIN // 2 + 1):
        j = jnp.clip(j0 + dj, 0, Rc - 1)
        perr = geom.length(si.p - si_c.p[j]) / jnp.maximum(ext_c[j], 1e-12)
        ndot = jnp.sum(n_gather * n_c[j], axis=-1)
        nerr = jnp.sqrt(
            jnp.maximum(1.0 - ndot, 0.0) / jnp.maximum(1.0 - cos_max, 1e-6)
        )
        err = jnp.maximum(perr, nerr)
        wt = jnp.where((err < 1.0) & valid_c[j], 1.0 - err, 0.0)
        sum_w = sum_w + wt
        E_i = E_i + wt[:, None] * E_c[j]
        wavg_i = wavg_i + wt[:, None] * wavg_c[j]
    ok = sum_w >= cfg.ic_minweight  # Successful() (irradiancecache.cpp:78)
    E_i = E_i / jnp.maximum(sum_w, 1e-12)[:, None]

    # ---- pass 3: cache-miss fallback — fresh gather, masked -------------
    miss = diffuse & ~ok
    E_m, wavg_m, _ = _gather_irradiance(
        scene, si, miss, n_gather, (ss, ts), rays, keys, K, 300, direct_cfg,
    )
    E = jnp.where(ok[:, None], E_i, E_m)
    w_avg = jnp.where(ok[:, None], wavg_i, wavg_m)

    # L_ind = f(wo, normalize(wAvg)) · E (irradiancecache.cpp:285-287)
    wlen = geom.length(w_avg)
    wi_w = w_avg / jnp.maximum(wlen, 1e-12)[:, None]
    wo_local = bxdf.world_to_local(si.wo, ss, ts, n_gather)
    wi_local = bxdf.world_to_local(wi_w, ss, ts, n_gather)
    f = mat_mod.bsdf_f(lm, wo_local, wi_local, mat_mod.pools_of(scene.materials))
    L_ind = jnp.where((wlen > 0.0)[:, None], f * E, 0.0)
    L = L_direct + jnp.where(diffuse[:, None], L_ind, 0.0)
    return L, first_t


def useprobes_li(scene, rays, keys, cfg, probes: ProbeGrid):
    """directlighting + SH-probe irradiance
    (reference: useprobes.cpp Li)."""
    from pbrt_tpu.integrators.path import trace_radiance
    import dataclasses

    direct_cfg = dataclasses.replace(cfg, kind="directlighting")
    L_direct, first_t = trace_radiance(scene, rays, keys, direct_cfg)
    hit = intersect(scene.geometry, rays)
    si = surface_interaction(scene.geometry, rays, hit)
    lm = mat_mod.gather_lane(scene.materials, si.material)
    diffuse = si.valid & ~mat_mod.has_delta_only(lm)
    coeffs = _trilerp_probes(probes, si.p)  # (R, terms, S)
    # irradiance from SH: E(n) = Σ Â_l L_lm Y_lm(n), n facing the viewer
    lmax = probes.lmax
    n_probe = geom.face_forward(si.ns, si.wo)
    basis = sh_mod.sh_evaluate(n_probe, lmax)  # (R, terms)
    A_hat = np.zeros(sh_mod.sh_terms(lmax), np.float32)
    A_l = [np.pi, 2.0 * np.pi / 3.0, np.pi / 4.0]
    for l in range(min(lmax, 2) + 1):
        for m in range(-l, l + 1):
            A_hat[sh_mod.sh_index(l, m)] = A_l[l] / np.pi * np.sqrt(
                4 * np.pi / (2 * l + 1)
            )
    A_hat_j = jnp.asarray(A_hat)
    E = jnp.einsum("rt,t,rts->rs", basis, A_hat_j, coeffs)
    L_ind = lm.kd * bxdf.INV_PI * jnp.maximum(E, 0.0)
    L = L_direct + jnp.where(diffuse[:, None], L_ind, 0.0)
    return L, first_t


def _trilerp_probes(probes: ProbeGrid, p):
    nx, ny, nz = probes.coeffs.shape[:3]
    ext = jnp.maximum(probes.hi - probes.lo, 1e-9)
    q = (p - probes.lo) / ext * jnp.asarray([nx, ny, nz], p.dtype) - 0.5
    qi = jnp.floor(q).astype(jnp.int32)
    d = q - qi

    def at(ix, iy, iz):
        ix = jnp.clip(ix, 0, nx - 1)
        iy = jnp.clip(iy, 0, ny - 1)
        iz = jnp.clip(iz, 0, nz - 1)
        return probes.coeffs[ix, iy, iz]

    acc = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (d[:, 0] if dx else 1 - d[:, 0])
                    * (d[:, 1] if dy else 1 - d[:, 1])
                    * (d[:, 2] if dz else 1 - d[:, 2])
                )
                acc = acc + w[:, None, None] * at(
                    qi[:, 0] + dx, qi[:, 1] + dy, qi[:, 2] + dz
                )
    return acc
