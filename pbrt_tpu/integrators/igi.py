"""Instant Global Illumination: virtual point lights.

Reference: src/integrators/igi.{h,cpp} (235 LoC) — Preprocess traces
``nlights`` light paths per light set depositing VirtualLights (p, n,
pathContrib); Li picks a set per sample and sums f·G·L over its VPLs with a
clamped geometric term (``glimit``) and Russian-roulette distance skipping,
plus regular direct lighting and specular recursion.

TPU-native design: VPL generation is a wavefront light-path trace (same
intersect/BSDF kernels); the per-VPL visibility loop becomes K uniformly
chosen VPLs per shading lane (contribution × N/K) — unbiased, constant
shadow-ray budget per lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.accel.intersect import intersect
from pbrt_tpu.bsdf import bxdf
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core.interaction import offset_ray_origin, surface_interaction
from pbrt_tpu.lights import table as lights_mod
from pbrt_tpu.materials import table as mat_mod
from pbrt_tpu.utils import pytree_dataclass


@pytree_dataclass
class VPLSet:
    p: jnp.ndarray  # (N, 3)
    n: jnp.ndarray  # (N, 3)
    contrib: jnp.ndarray  # (N, S) path contribution
    valid: jnp.ndarray  # (N,) bool


def generate_vpls(scene, n_paths: int = 1024, max_depth: int = 3, seed: int = 11):
    """Trace light paths, depositing a VPL at each diffuse bounce
    (reference: IGIIntegrator::Preprocess, igi.cpp:60-140)."""
    lt = scene.lights
    S = scene.materials.kd.shape[-1]
    keys = rngmod.pixel_sample_key(
        rngmod.root_key(seed), jnp.arange(n_paths), jnp.zeros(n_paths, jnp.int32)
    )
    u0 = rngmod.uniform_per(keys, 5)
    # power-weighted light pick + exact emission sampling
    # (reference: igi.cpp:80-89 — lightDistribution->SampleDiscrete then
    # light->Sample_L(scene, ls, ...); alpha = Le / (pdf · lightPdf))
    li, light_pmf = lt.power_dist.sample_discrete(u0[:, 0])
    es = lights_mod.sample_le(
        lt, scene.geometry, li, u0[:, 1], u0[:, 2], u0[:, 3], u0[:, 4]
    )
    denom = jnp.maximum(es.pdf * light_pmf, 1e-12)
    alpha = es.Le / denom[:, None] / n_paths
    ray = geom.Ray.make(es.p + 1e-3 * es.d, es.d)
    vpl_p = jnp.zeros((n_paths * max_depth, 3))
    vpl_n = jnp.zeros((n_paths * max_depth, 3))
    vpl_c = jnp.zeros((n_paths * max_depth, S))
    vpl_ok = jnp.zeros((n_paths * max_depth,), bool)
    alive = jnp.ones((n_paths,), bool)
    for b in range(max_depth):
        hit = intersect(scene.geometry, ray)
        si = surface_interaction(scene.geometry, ray, hit)
        alive = alive & si.valid
        lm = mat_mod.gather_lane(scene.materials, si.material)
        sl = slice(b * n_paths, (b + 1) * n_paths)
        vpl_p = vpl_p.at[sl].set(si.p)
        vpl_n = vpl_n.at[sl].set(si.ns)
        vpl_c = vpl_c.at[sl].set(alpha)
        vpl_ok = vpl_ok.at[sl].set(alive & ~mat_mod.has_delta_only(lm))
        # continue
        ss, ts = bxdf.make_shading_frame(si.ns, si.dpdu)
        wo_local = bxdf.world_to_local(si.wo, ss, ts, si.ns)
        kb = rngmod.bounce_key(keys, b, rngmod.PHOTON)
        ub = rngmod.uniform_per(kb, 3)
        wi_local, f, pdf, is_delta = mat_mod.bsdf_sample(
            lm, wo_local, ub[:, 0], ub[:, 1], ub[:, 2],
            mat_mod.pools_of(scene.materials),
        )
        wi_world = bxdf.local_to_world(wi_local, ss, ts, si.ns)
        cos_i = geom.absdot(wi_world, si.ns)
        ok = alive & (pdf > 0.0)
        alpha = jnp.where(
            ok[:, None], alpha * f * (cos_i / jnp.maximum(pdf, 1e-9))[:, None],
            alpha,
        )
        alive = ok
        o_new = offset_ray_origin(si.p, si.ng, wi_world, si.ray_epsilon)
        ray = geom.Ray.make(
            jnp.where(alive[:, None], o_new, ray.origin),
            jnp.where(alive[:, None], wi_world, ray.direction),
        )
    return VPLSet(p=vpl_p, n=vpl_n, contrib=vpl_c, valid=vpl_ok)


def vpl_lighting(scene, vpls: VPLSet, si, lm, wo_local, frame, keys,
                 n_vpl_samples: int = 8, g_limit: float = 10.0):
    """Σ over sampled VPLs of f·G·contrib with visibility
    (reference: igi.cpp:170-230). Returns (R, S)."""
    ss, ts, ns = frame
    R = si.p.shape[0]
    S = scene.materials.kd.shape[-1]
    N = vpls.p.shape[0]
    total = jnp.zeros((R, S))
    n_valid = jnp.maximum(jnp.sum(vpls.valid), 1)
    from pbrt_tpu.integrators.path import _shadow_unoccluded

    for k in range(n_vpl_samples):
        kk = rngmod.bounce_key(keys, k, rngmod.PHOTON)
        u = rngmod.uniform_per(kk, 1)[:, 0]
        vi = jnp.minimum((u * N).astype(jnp.int32), N - 1)
        vp = vpls.p[vi]
        vn = vpls.n[vi]
        vc = vpls.contrib[vi]
        ok = vpls.valid[vi] & si.valid
        d = vp - si.p
        dist2 = jnp.maximum(jnp.sum(d * d, -1), 1e-9)
        wi = d / jnp.sqrt(dist2)[:, None]
        g = (
            jnp.maximum(geom.dot(wi, ns), 0.0)
            * jnp.maximum(geom.dot(-wi, vn), 0.0)
            / dist2
        )
        g = jnp.minimum(g, g_limit)  # clamp (reference: glimit param)
        wi_local = bxdf.world_to_local(wi, ss, ts, ns)
        f = mat_mod.bsdf_f(lm, wo_local, wi_local,
                           mat_mod.pools_of(scene.materials))
        vis = _shadow_unoccluded(
            scene.geometry, si.p, si.ng, wi, jnp.sqrt(dist2), si.ray_epsilon
        )
        contrib = f * vc * (g * vis)[:, None]
        total = total + jnp.where(ok[:, None], contrib, 0.0)
    # uniform pick of K among N slots (invalid slots contribute 0):
    # E[Σ] = (N/K)·mean; per-path 1/n_paths is folded into contrib
    return total * (N / n_vpl_samples)
