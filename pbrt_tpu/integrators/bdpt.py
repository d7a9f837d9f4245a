"""Bidirectional path estimator for the Metropolis renderer.

Reference: src/renderers/metropolis.cpp — ``GeneratePath`` (:187-290)
builds camera/light subpaths of ``PathVertex`` {bsdf, alpha, wPrev,
specularBounce}; ``Lbidir`` (:387-470) combines, per camera vertex i:
emitted light gated on previousSpecular, one-light ``EstimateDirect``
weighted 1/(i+1−nSpec[i+1]), and connections to every light vertex j with
geometric term G and uniform path weight 1/(i+j+2−nSpec[i+j+2]) (specular
vertices excluded from both the strategy count and the connections).

TPU-native design: subpaths are generated for the whole wavefront at once
with per-bounce SoA vertex storage (Python-unrolled over max_depth so every
vertex's shading lane stays addressable); the i×j connection double loop
becomes max_depth² batched shadow-ray waves. Light emission sampling
follows the photon-shooting pattern (uniform light pick × area sample ×
uniform sphere direction) shared with igi/photonmap.

Divergences (documented): the reference scales connection BSDFs by
(1 + nSpecularComponents) to account for strategies lost to specular
lobes — our lanes never mix delta and non-delta lobes, so the factor is 1;
volume transmittance on connection rays is applied when media are present
(the reference's MLT ignores media on connections).
"""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.accel.intersect import intersect
from pbrt_tpu.bsdf import bxdf
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core.interaction import surface_interaction, offset_ray_origin
from pbrt_tpu.lights import table as lights_mod
from pbrt_tpu.materials import table as mat_mod
from pbrt_tpu.integrators.path import (
    IntegratorConfig, KeySource, PrimarySource, RenderScene, apply_textures,
    _nee_one_light, _shadow_unoccluded, _spread_of,
)


class _LightSource:
    """Uniform source addressing the light-subpath block of the primary
    sample vector (dims beyond the camera blocks), or fresh keys."""

    #: light-ray sampling dims: light select, area u1/u2, dir u1/u2
    EMIT_DIMS = 5
    PER_BOUNCE = 3  # bsdf lobe/u1/u2

    def __init__(self, inner, max_depth):
        self.inner = inner
        self.base = PrimarySource.n_dims(max_depth)

    def emit(self, keys):
        if isinstance(self.inner, PrimarySource):
            return self.inner.u[:, self.base : self.base + self.EMIT_DIMS]
        k = rngmod.bounce_key(keys, 97, rngmod.PHOTON)
        return rngmod.uniform_per(k, self.EMIT_DIMS)

    def bsdf(self, keys, bounce):
        if isinstance(self.inner, PrimarySource):
            c = self.base + self.EMIT_DIMS + bounce * self.PER_BOUNCE
            return self.inner.u[:, c : c + self.PER_BOUNCE]
        k = rngmod.bounce_key(keys, 98 + bounce, rngmod.PHOTON)
        return rngmod.uniform_per(k, self.PER_BOUNCE)


def n_dims_bidir(max_depth: int) -> int:
    """Primary-sample vector length for bidirectional MLT."""
    return (PrimarySource.n_dims(max_depth) + _LightSource.EMIT_DIMS
            + _LightSource.PER_BOUNCE * max_depth)


def _gen_subpath(scene, ray, keys, cfg, source, n_verts, light_side,
                 light_src=None):
    """GeneratePath equivalent: returns per-vertex SoA lists of length
    ``n_verts``: dicts with valid/p/ng/ns/eps/alpha/wo_local/frame/lm/
    specular, plus the escaped (ray, alpha, prev_specular) record."""
    R = ray.origin.shape[0]
    S = cfg.n_bins
    alpha = jnp.ones((R, S))
    alive = jnp.ones((R,), bool)
    verts = []
    esc_alpha = jnp.zeros((R, S))
    esc_dir = ray.direction
    esc_prev_spec = jnp.zeros((R,), bool)
    prev_spec = jnp.ones((R,), bool)  # camera/light origin counts specular
    pools = mat_mod.pools_of(scene.materials)
    for b in range(n_verts):
        hit = intersect(scene.geometry, ray)
        si = surface_interaction(scene.geometry, ray, hit,
                                 spread=_spread_of(scene))
        escaped_now = alive & (~si.valid)
        esc_alpha = jnp.where(escaped_now[:, None], alpha, esc_alpha)
        esc_dir = jnp.where(escaped_now[:, None],
                            geom.normalize(ray.direction), esc_dir)
        esc_prev_spec = jnp.where(escaped_now, prev_spec, esc_prev_spec)
        alive = alive & si.valid
        lm = mat_mod.gather_lane(scene.materials, si.material)
        si, lm = apply_textures(scene, si, lm)
        ss, ts = bxdf.make_shading_frame(si.ns, si.dpdu)
        wo_local = bxdf.world_to_local(si.wo, ss, ts, si.ns)
        is_specular_mat = mat_mod.has_delta_only(lm)
        verts.append(dict(
            valid=alive, p=si.p, ng=si.ng, ns=si.ns, eps=si.ray_epsilon,
            alpha=alpha, wo_local=wo_local, frame=(ss, ts, si.ns),
            lm=lm, si=si, specular=is_specular_mat, prev_spec=prev_spec,
            wo_world=si.wo, first_t=hit.t,
        ))
        # continue the walk
        if light_side:
            ub = light_src.bsdf(keys, b)
        else:
            ub = source.get(b, rngmod.BSDF_SAMPLE, 3)
        wi_local, f, pdf, is_delta = mat_mod.bsdf_sample(
            lm, wo_local, ub[..., 0], ub[..., 1], ub[..., 2], pools
        )
        wi_world = bxdf.local_to_world(wi_local, ss, ts, si.ns)
        cos_i = geom.absdot(wi_world, si.ns)
        ok = alive & (pdf > 0.0) & jnp.any(f > 0.0, axis=-1)
        alpha = jnp.where(
            ok[:, None],
            alpha * f * (cos_i / jnp.maximum(pdf, 1e-12))[:, None],
            alpha,
        )
        prev_spec = is_delta
        alive = ok
        o_new = offset_ray_origin(si.p, si.ng, wi_world, si.ray_epsilon)
        ray = geom.Ray.make(
            jnp.where(alive[:, None], o_new, ray.origin),
            jnp.where(alive[:, None], wi_world, ray.direction),
            time=ray.time,
        )
    return verts, (esc_alpha, esc_dir, esc_prev_spec)


def trace_bidir(scene: RenderScene, rays: geom.Ray, keys,
                cfg: IntegratorConfig, uniforms=None):
    """Lbidir equivalent over the wavefront → (L (R, S), first_hit_t)."""
    R = rays.origin.shape[0]
    S = cfg.n_bins
    D = cfg.max_depth
    source = PrimarySource(uniforms) if uniforms is not None \
        else KeySource(keys)
    light_src = _LightSource(source, D)
    lt = scene.lights
    n_lights = max(lt.count, 1)

    # --- camera subpath ----------------------------------------------------
    cam, (e_alpha, e_dir, e_prev) = _gen_subpath(
        scene, rays, keys, cfg, source, D, light_side=False
    )
    first_hit_t = jnp.where(cam[0]["valid"], cam[0]["first_t"], 0.0)

    # --- light subpath (emission pattern shared with photonmap.py) ---------
    ue = light_src.emit(keys)
    li = jnp.minimum((ue[:, 0] * n_lights).astype(jnp.int32), n_lights - 1)
    center = jnp.broadcast_to(lt.world_center, (R, 3))
    ls0 = lights_mod.sample_li(lt, scene.geometry, li, center,
                               ue[:, 1], ue[:, 2])
    p0 = center + ls0.wi * jnp.where(
        jnp.isfinite(ls0.dist), ls0.dist, 2.0 * lt.world_radius
    )[:, None]
    ct = 1.0 - 2.0 * ue[:, 3]
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    d0 = jnp.stack(
        [st * jnp.cos(2 * jnp.pi * ue[:, 4]),
         st * jnp.sin(2 * jnp.pi * ue[:, 4]), ct], -1,
    )
    alpha_l0 = ls0.L * (
        4.0 * jnp.pi * n_lights / jnp.maximum(ls0.pdf, 1e-9)
    )[:, None]
    lray = geom.Ray.make(p0 + 1e-3 * d0, d0, time=rays.time)
    lverts, _ = _gen_subpath(
        scene, lray, keys, cfg, source, D, light_side=True,
        light_src=light_src,
    )
    for v in lverts:
        v["alpha"] = v["alpha"] * alpha_l0

    # --- specular strategy counts per total path length ---------------------
    # nSpec[k] = Σ_{i+j+2=k} (spec_c[i] | spec_l[j])  (metropolis.cpp:398-403)
    n_verts_total = 2 * D + 2
    n_spec = [jnp.zeros((R,), jnp.int32) for _ in range(n_verts_total)]
    for i in range(D):
        for j in range(D):
            sij = (cam[i]["specular"] | lverts[j]["specular"]) & \
                cam[i]["valid"] & lverts[j]["valid"]
            n_spec[i + j + 2] = n_spec[i + j + 2] + sij.astype(jnp.int32)

    L = jnp.zeros((R, S))
    pools = mat_mod.pools_of(scene.materials)
    all_spec = jnp.ones((R,), bool)
    for i, vc in enumerate(cam):
        active = vc["valid"]
        # emitted light, gated on the previous bounce being specular
        # (metropolis.cpp:412-414)
        if lt.count > 0:
            le = lights_mod.emitted_radiance(
                scene.lights, vc["si"].area_light, vc["ng"], vc["wo_world"]
            )
            L = L + jnp.where(
                (active & vc["prev_spec"])[:, None], vc["alpha"] * le, 0.0
            )
        # one-light NEE, uniform strategy weight 1/(i+1 − nSpec[i+1])
        nee = _nee_one_light(
            scene, vc["si"], vc["lm"], vc["wo_local"], vc["frame"],
            source, keys, i, active & ~vc["specular"],
        )
        denom = jnp.maximum(i + 1 - n_spec[i + 1], 1).astype(jnp.float32)
        L = L + vc["alpha"] * nee / denom[:, None]
        # connections to light vertices (metropolis.cpp:437-459)
        for j, vl in enumerate(lverts):
            pair_ok = (active & vl["valid"] & ~vc["specular"]
                       & ~vl["specular"])
            delta = vl["p"] - vc["p"]
            dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12)
            w = delta / jnp.sqrt(dist2)[:, None]
            ssc, tsc, nsc = vc["frame"]
            ssl, tsl, nsl = vl["frame"]
            fc = mat_mod.bsdf_f(
                vc["lm"], vc["wo_local"],
                bxdf.world_to_local(w, ssc, tsc, nsc), pools,
            )
            fl = mat_mod.bsdf_f(
                vl["lm"], vl["wo_local"],
                bxdf.world_to_local(-w, ssl, tsl, nsl), pools,
            )
            pair_ok = pair_ok & jnp.any(fc > 0, -1) & jnp.any(fl > 0, -1)
            dist = jnp.sqrt(dist2)
            vis = _shadow_unoccluded(
                scene.geometry, vc["p"], vc["ng"], w,
                dist * 0.999, vc["eps"],
            )
            G = geom.absdot(vc["ns"], w) * geom.absdot(vl["ns"], w) / dist2
            wt = 1.0 / jnp.maximum(
                i + j + 2 - n_spec[i + j + 2], 1
            ).astype(jnp.float32)
            contrib = vc["alpha"] * fc * fl * vl["alpha"] * (G * wt)[:, None]
            L = L + jnp.where((pair_ok & vis)[:, None], contrib, 0.0)

    # escaped-ray environment contribution (metropolis.cpp:462-466)
    if lt.count > 0:
        le_bg = lights_mod.le_escaped(scene.lights, e_dir)
        L = L + jnp.where(
            e_prev[:, None], e_alpha * le_bg, 0.0
        )
    return L, first_hit_t
