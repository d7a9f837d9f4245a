"""Precomputed radiance transfer integrators: diffuseprt / glossyprt.

Reference: src/integrators/diffuseprt.{h,cpp} and glossyprt.{h,cpp} over
src/core/sh.{h,cpp} — Preprocess projects incident direct radiance at the
world-bound center into SH (`SHProjectIncidentDirectRadiance`,
diffuseprt.cpp:48-56); Li computes a per-hit SH transfer and integrates it
against the lighting coefficients.

TPU-native design:
- The lighting projection is one batched wavefront trace (D outward rays
  from the bbox center through the directlighting integrator) followed by
  one SH-basis matmul — no per-sample recursion.
- diffuseprt: the per-hit diffuse transfer vector (cosine × visibility
  projected into SH, reference sh.cpp `SHComputeDiffuseTransfer`) is built
  from a fixed budget of shadow rays per lane, all lanes in parallel.
- glossyprt: the reference's default path rotates SH into the local frame
  (shrots.cpp) and applies a precomputed 25×25 BSDF matrix
  (`SHComputeBSDFMatrix`). pbrt itself ships the equivalent direct
  estimator (glossyprt.cpp `#if 0` branch): sample the surface BSDF,
  evaluate the SH-reconstructed incident lighting × visibility along each
  sample. That branch is the TPU-native choice — no SH rotation matrices,
  no double band-limiting through T and B (documented divergence: slightly
  *less* approximation than the matrix chain).

Delta lights (point/spot/distant) are invisible to direction sampling and
are therefore absent from the SH lighting projection, as in the reference
(SHProjectIncidentDirectRadiance samples area/infinite lights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.bsdf import bxdf
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.core import sh as sh_mod
from pbrt_tpu.materials import table as mat_mod
from pbrt_tpu.utils import pytree_dataclass, static_field


@pytree_dataclass
class PRTData:
    """Preprocess product: SH lighting coefficients at the scene center."""

    c_in: jnp.ndarray  # (terms, S)
    lmax: int = static_field(default=4)


def project_incident_radiance(scene, cfg, lmax: int, nsamples: int,
                              seed: int = 0) -> PRTData:
    """SHProjectIncidentDirectRadiance equivalent (diffuseprt.cpp:48-56):
    project incident radiance at the world-bound center into SH by tracing
    D uniform-sphere rays through the directlighting integrator."""
    import dataclasses

    from pbrt_tpu.integrators.path import IntegratorConfig, trace_radiance

    g = scene.geometry
    center = 0.5 * (np.asarray(g.world_lo) + np.asarray(g.world_hi))
    D = max(int(nsamples), 16)
    key = rngmod.root_key(seed + 77)
    u = jax.random.uniform(key, (D, 2))
    w = smp.uniform_sample_sphere(u[:, 0], u[:, 1])  # (D, 3)
    origins = jnp.broadcast_to(jnp.asarray(center, jnp.float32), (D, 3))
    rays = geom.Ray.make(origins, w)
    keys = rngmod.pixel_sample_key(
        rngmod.root_key(seed + 78), jnp.arange(D), jnp.zeros(D, jnp.int32)
    )
    dl_cfg = IntegratorConfig(
        kind="directlighting", max_depth=1, strategy="all",
        volume_kind="none", n_bins=cfg.n_bins,
    )
    L, _ = trace_radiance(scene, rays, keys, dl_cfg)  # (D, S)
    c_in = sh_mod.project_directions(w, L, lmax)
    return PRTData(c_in=jnp.asarray(c_in), lmax=lmax)


def _hit_setup(scene, rays, cfg):
    from pbrt_tpu.accel.intersect import intersect
    from pbrt_tpu.core.interaction import surface_interaction
    from pbrt_tpu.integrators.path import apply_textures, _spread_of
    from pbrt_tpu.lights import table as lights_mod

    hit = intersect(scene.geometry, rays)
    si = surface_interaction(scene.geometry, rays, hit,
                             spread=_spread_of(scene))
    first_hit_t = jnp.where(si.valid, hit.t, 0.0)
    lm = mat_mod.gather_lane(scene.materials, si.material)
    si, lm = apply_textures(scene, si, lm)
    S = cfg.n_bins
    R = si.valid.shape[0]
    L = jnp.zeros((R, S))
    if scene.lights.count > 0:
        # emitted light at the hit + background for escaped rays
        # (diffuseprt.cpp:69 isect.Le; misses are the renderer's Le sum,
        # samplerrenderer.cpp:241-242)
        le = lights_mod.emitted_radiance(
            scene.lights, si.area_light, si.ng, si.wo
        )
        L = L + jnp.where(si.valid[..., None], le, 0.0)
        le_bg = lights_mod.le_escaped(scene.lights, rays.direction)
        L = L + jnp.where(si.valid[..., None], 0.0, le_bg)
    return hit, si, lm, L, first_hit_t


def diffuseprt_li(scene, rays, keys, cfg):
    """DiffusePRTIntegrator::Li (diffuseprt.cpp:63-88): per-hit diffuse
    transfer vector (cos⁺ × visibility in SH) dotted with c_in, scaled by
    the hemispherical reflectance / π."""
    from pbrt_tpu.integrators.path import _shadow_unoccluded

    prt: PRTData = scene.prt
    lmax = prt.lmax
    terms = sh_mod.sh_terms(lmax)
    hit, si, lm, L, first_hit_t = _hit_setup(scene, rays, cfg)
    n = geom.face_forward(si.ns, si.wo)
    R = si.valid.shape[0]

    c_transfer = jnp.zeros((R, terms))
    N = cfg.prt_nsamples
    far = jnp.full((R,), 1e30)
    for k in range(N):
        uk = rngmod.uniform_per(
            rngmod.bounce_key(keys, k, rngmod.LIGHT_SAMPLE), 2
        )
        w = smp.uniform_sample_sphere(uk[..., 0], uk[..., 1])  # (R, 3)
        cos_t = jnp.maximum(geom.dot(w, n), 0.0)
        vis = _shadow_unoccluded(
            scene.geometry, si.p, si.ng, w, far, si.ray_epsilon
        )
        weight = cos_t * vis.astype(cos_t.dtype) * (4.0 * jnp.pi / N)
        c_transfer = c_transfer + sh_mod.sh_evaluate(w, lmax) * weight[:, None]

    lo = jnp.einsum("rt,ts->rs", c_transfer, prt.c_in)
    lo = jnp.maximum(lo, 0.0)  # Lo.Clamp() (diffuseprt.cpp:87)
    kd = lm.kd if not isinstance(lm, mat_mod.MixLane) else lm.lm1.kd
    L = L + jnp.where(si.valid[..., None], kd / jnp.pi * lo, 0.0)
    return L, first_hit_t


def glossyprt_li(scene, rays, keys, cfg):
    """GlossyPRTIntegrator::Li via the reference's direct-sampling branch
    (glossyprt.cpp `#if 0`): E[ f·|cosθ|/pdf · V(p,wi) · L_SH(wi) ]."""
    from pbrt_tpu.integrators.path import _shadow_unoccluded

    prt: PRTData = scene.prt
    lmax = prt.lmax
    hit, si, lm, L, first_hit_t = _hit_setup(scene, rays, cfg)
    ss, ts = bxdf.make_shading_frame(si.ns, si.dpdu)
    wo_local = bxdf.world_to_local(si.wo, ss, ts, si.ns)
    pools = mat_mod.pools_of(scene.materials)
    R = si.valid.shape[0]
    S = cfg.n_bins

    acc = jnp.zeros((R, S))
    N = cfg.prt_nsamples
    far = jnp.full((R,), 1e30)
    for k in range(N):
        ub = rngmod.uniform_per(rngmod.bounce_key(keys, k, rngmod.BSDF_SAMPLE), 3)
        wi_local, f, pdf, is_delta = mat_mod.bsdf_sample(
            lm, wo_local, ub[..., 0], ub[..., 1], ub[..., 2], pools
        )
        wi = bxdf.local_to_world(wi_local, ss, ts, si.ns)
        cos_i = geom.absdot(wi, si.ns)
        vis = _shadow_unoccluded(
            scene.geometry, si.p, si.ng, wi, far, si.ray_epsilon
        )
        li = jnp.maximum(sh_mod.reconstruct(wi, prt.c_in, lmax), 0.0)
        ok = (pdf > 0.0) & vis
        contrib = f * li * (cos_i / jnp.maximum(pdf, 1e-12))[..., None]
        acc = acc + jnp.where(ok[..., None], contrib, 0.0) / N

    L = L + jnp.where(si.valid[..., None], acc, 0.0)
    return L, first_hit_t
