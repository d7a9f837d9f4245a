"""Irradiance-cache-equivalent and probe-based integrators.

Reference: src/integrators/irradiancecache.{h,cpp} (389 LoC) — octree-cached
hemispherical irradiance with gradients — and useprobes.{h,cpp} (SH probe
interpolation).

TPU-native design: the irradiance *cache* is a CPU-era performance hack
(amortize expensive hemisphere gathers through an octree of cached values
+ error-bounded interpolation). On TPU, recomputing the gather per shading
point is a coherent batched workload, so ``irradiancecache`` here computes
the exact quantity the cache approximates — a cosine-weighted hemispherical
gather of one-bounce radiance — with no interpolation error. ``useprobes``
evaluates trilinearly-interpolated SH probes (from createprobes).
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


def irradiance_cache_li(scene, rays, keys, cfg):
    """directlighting + hemispherical indirect gather
    (reference behavior of irradiancecache.cpp without the cache)."""
    from pbrt_tpu.integrators.path import IntegratorConfig, trace_radiance

    import dataclasses

    direct_cfg = dataclasses.replace(cfg, kind="directlighting")
    L_direct, first_t = trace_radiance(scene, rays, keys, direct_cfg)
    # primary hits for the gather
    hit = intersect(scene.geometry, rays)
    si = surface_interaction(scene.geometry, rays, hit)
    lm = mat_mod.gather_lane(scene.materials, si.material)
    diffuse = si.valid & ~mat_mod.has_delta_only(lm)
    # gather over the hemisphere FACING the viewer (two-sided shading, like
    # the path integrator's wo-hemisphere BSDF sampling)
    n_gather = geom.face_forward(si.ns, si.wo)
    ss, ts = bxdf.make_shading_frame(n_gather, si.dpdu)
    R = rays.origin.shape[0]
    S = scene.materials.kd.shape[-1]
    K = cfg.ao_nsamples  # reuse "nsamples" param for gather count
    E = jnp.zeros((R, S))
    for k in range(K):
        gk = rngmod.bounce_key(keys, 100 + k, rngmod.BSDF_SAMPLE)
        u = rngmod.uniform_per(gk, 2)
        w_local = smp.cosine_sample_hemisphere(u[:, 0], u[:, 1])
        w = bxdf.local_to_world(w_local, ss, ts, n_gather)
        o = offset_ray_origin(si.p, si.ng, w, si.ray_epsilon)
        gather_rays = geom.Ray.make(
            jnp.where(diffuse[:, None], o, rays.origin),
            jnp.where(diffuse[:, None], w, rays.direction),
        )
        gkeys = rngmod.bounce_key(keys, 200 + k, rngmod.CAMERA)
        Lg, _ = trace_radiance(scene, gather_rays, gkeys, direct_cfg)
        # cosine-weighted MC: E ≈ π·mean(L)
        E = E + Lg * jnp.pi / K
    L_ind = lm.kd * bxdf.INV_PI * E
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
