"""Photon mapping integrator.

Reference: src/integrators/photonmap.{h,cpp} (795 LoC) — Preprocess shoots
photons from lights in parallel tasks, storing caustic / indirect /
radiance photons in kd-trees; Li = direct NEE + caustic density estimation
(k-NN gather) + indirect (final gather over the radiance photons, or direct
density estimation when finalgather=false).

TPU-native design: photon shooting is a wavefront light-path trace
(classifying deposits into caustic = previous bounce specular, indirect =
any later diffuse bounce). The kd-tree k-NN gather becomes a fixed-radius
kernel density estimation via a dense chunked reduction over the photon
arrays (the same MXU-friendly N-body pattern as the dipole Mo gather) —
equivalent to the reference's gather with a constant search radius.
Final gather is realized as one extra hemispheric bounce whose hits are
shaded by the indirect photon density (reference finalgather semantics).
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

CHUNK = 256


@pytree_dataclass
class PhotonMaps:
    p: jnp.ndarray  # (N, 3) photon positions
    wi: jnp.ndarray  # (N, 3) arrival directions
    alpha: jnp.ndarray  # (N, S) photon powers (already /n_paths)
    is_caustic: jnp.ndarray  # (N,) bool
    valid: jnp.ndarray  # (N,)
    radius: jnp.ndarray  # () gather radius


def shoot_photons(scene, n_paths=4096, max_depth=5, seed=17,
                  radius_scale=0.02):
    """Wavefront photon shooting
    (reference: PhotonShootingTask::Run, photonmap.cpp:300-470)."""
    from pbrt_tpu.integrators.igi import generate_vpls  # emission pattern

    lt = scene.lights
    S = scene.materials.kd.shape[-1]
    keys = rngmod.pixel_sample_key(
        rngmod.root_key(seed), jnp.arange(n_paths), jnp.zeros(n_paths, jnp.int32)
    )
    u0 = rngmod.uniform_per(keys, 5)
    # power-weighted light pick + exact emission sampling (reference:
    # photonmap.cpp:330-345 — lightDistribution->SampleDiscrete then
    # light->Sample_L(scene, ls, ...); alpha = Le·|cos(Nl,d)| / (pdf·pmf))
    li, light_pmf = lt.power_dist.sample_discrete(u0[:, 0])
    es = lights_mod.sample_le(
        lt, scene.geometry, li, u0[:, 1], u0[:, 2], u0[:, 3], u0[:, 4]
    )
    denom = jnp.maximum(es.pdf * light_pmf, 1e-12)
    cos_l = jnp.abs(jnp.sum(es.d * es.n, axis=-1))
    alpha = es.Le * (cos_l / denom)[:, None] / n_paths
    ray = geom.Ray.make(es.p + 1e-3 * es.d, es.d)
    N = n_paths * max_depth
    ph_p = jnp.zeros((N, 3))
    ph_wi = jnp.zeros((N, 3))
    ph_a = jnp.zeros((N, S))
    ph_caustic = jnp.zeros((N,), bool)
    ph_ok = jnp.zeros((N,), bool)
    alive = jnp.ones((n_paths,), bool)
    prev_specular = jnp.ones((n_paths,), bool)  # first hits are "direct"
    for b in range(max_depth):
        hit = intersect(scene.geometry, ray)
        si = surface_interaction(scene.geometry, ray, hit)
        alive = alive & si.valid
        lm = mat_mod.gather_lane(scene.materials, si.material)
        diffuse_here = ~mat_mod.has_delta_only(lm)
        sl = slice(b * n_paths, (b + 1) * n_paths)
        ph_p = ph_p.at[sl].set(si.p)
        ph_wi = ph_wi.at[sl].set(-geom.normalize(ray.direction))
        ph_a = ph_a.at[sl].set(alpha)
        # photons only deposit after the first bounce (direct excluded);
        # caustic = arrived via a specular chain (photonmap.cpp:380-420)
        deposit = alive & diffuse_here & (b > 0)
        ph_caustic = ph_caustic.at[sl].set(prev_specular & deposit)
        ph_ok = ph_ok.at[sl].set(deposit)
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
        prev_specular = is_delta
        alive = ok
        o_new = offset_ray_origin(si.p, si.ng, wi_world, si.ray_epsilon)
        ray = geom.Ray.make(
            jnp.where(alive[:, None], o_new, ray.origin),
            jnp.where(alive[:, None], wi_world, ray.direction),
        )
    radius = lt.world_radius * radius_scale
    return PhotonMaps(
        p=ph_p, wi=ph_wi, alpha=ph_a, is_caustic=ph_caustic, valid=ph_ok,
        radius=radius,
    )


def radiance_estimate(maps: PhotonMaps, scene, si, lm, wo_local, frame,
                      caustic_only=None):
    """Fixed-radius kernel density estimate of reflected radiance:
    L(x, wo) ≈ Σ f(wo, wi_p)·α_p / (π r²) over photons within r
    (reference: LPhoton, photonmap.cpp:200-260). Returns (R, S)."""
    ss, ts, ns = frame
    R = si.p.shape[0]
    S = maps.alpha.shape[-1]
    N = maps.p.shape[0]
    r2 = maps.radius * maps.radius
    n_chunks = (N + CHUNK - 1) // CHUNK
    pools = mat_mod.pools_of(scene.materials)

    def body(c, acc):
        start = c * CHUNK
        pp = jax.lax.dynamic_slice_in_dim(maps.p, start, CHUNK, 0)
        pw = jax.lax.dynamic_slice_in_dim(maps.wi, start, CHUNK, 0)
        pa = jax.lax.dynamic_slice_in_dim(maps.alpha, start, CHUNK, 0)
        pv = jax.lax.dynamic_slice_in_dim(maps.valid, start, CHUNK, 0)
        pc = jax.lax.dynamic_slice_in_dim(maps.is_caustic, start, CHUNK, 0)
        sel = pv
        if caustic_only is True:
            sel = pv & pc
        elif caustic_only is False:
            sel = pv & (~pc)
        d2 = (
            jnp.sum(si.p * si.p, -1, keepdims=True)
            - 2.0 * si.p @ pp.T
            + jnp.sum(pp * pp, -1)[None, :]
        )
        near = (d2 <= r2) & sel[None, :]  # (R, C)
        # f(wo, wi_p): diffuse-only kernel (pbrt uses the BSDF's diffuse
        # part for density estimation) — Lambertian kd/π per lane
        f_diff = lm.kd * bxdf.INV_PI  # (R, S)
        w = near.astype(jnp.float32)  # (R, C)
        gathered = w @ pa  # (R, S)
        return acc + f_diff * gathered

    acc = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((R, S)))
    return acc / (jnp.pi * r2)
