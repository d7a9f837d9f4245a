"""Wavefront surface integrators: path tracing, direct lighting, Whitted,
ambient occlusion, and the fork's metadata integrator.

Reference: src/integrators/path.{h,cpp} (per-bounce NEE via
UniformSampleOneLight, BSDF importance sampling, Russian roulette after
bounce 3 with p = min(.5, throughput.y()), path.cpp:44-110),
directlighting.{h,cpp} (SAMPLE_ALL/SAMPLE_ONE strategies + specular
recursion), whitted.{h,cpp}, ambientocclusion.{h,cpp}, and the fork's
metadata.{h,cpp} (mesh/material/depth channels as "radiance").

TPU-native design: the recursive ``Li`` call stacks of the reference become
a **wavefront**: SoA path state (origin, direction, throughput[S], L[S],
alive mask, rng keys) advanced by a statically-unrolled per-bounce kernel
sequence — intersect → emissive/escape accumulate → NEE + MIS → BSDF sample
→ Russian roulette. Dead lanes are masked, not compacted (compaction is a
later optimization; masked lanes cost ~0 after XLA fusion on short tails).
MIS uses the one-sample power-heuristic estimator: the BSDF-sampled side of
pbrt's EstimateDirect (integrator.cpp:109-180) is realized by weighting
emissive hits of continued path rays — algebraically the same estimator.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pbrt_tpu.accel.intersect import Hit, SceneGeometry, intersect
from pbrt_tpu.bsdf import bxdf
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.interaction import offset_ray_origin, surface_interaction
from pbrt_tpu.lights import table as lights_mod
from pbrt_tpu.materials import table as mat_mod
from pbrt_tpu.utils import pytree_dataclass, static_field
from pbrt_tpu.textures import texture as tex_mod


@pytree_dataclass
class RenderScene:
    """Render-ready device bundle produced by scene/builder.py."""

    geometry: SceneGeometry
    materials: mat_mod.MaterialTable
    lights: lights_mod.LightTable
    textures: object = None  # TextureTable or None
    volumes: object = None  # VolumeTable or None
    subsurface: object = None  # SubsurfaceData (dipole preprocess product)
    vpls: object = None  # VPLSet (IGI preprocess product)
    photons: object = None  # PhotonMaps (photonmap preprocess product)
    probes: object = None  # ProbeGrid (useprobes input / createprobes output)
    prt: object = None  # PRTData (diffuseprt/glossyprt preprocess product)
    has_textures: bool = static_field(default=False)
    has_volumes: bool = static_field(default=False)
    #: camera pixel cone half-width per unit distance (ray-cone mip
    #: filtering; 0 disables footprint computation entirely)
    pixel_spread: float = static_field(default=0.0)
    has_subsurface: bool = static_field(default=False)
    has_vpls: bool = static_field(default=False)
    has_photons: bool = static_field(default=False)


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    kind: str = "path"  # path | directlighting | whitted | ambientocclusion | metadata
    max_depth: int = 5
    strategy: str = "all"  # directlighting: all | one
    rr_depth: int = 3  # RR starts after this many bounces (reference: path.cpp:95)
    ao_nsamples: int = 4
    ao_maxdist: float = jnp.inf
    metadata_channel: str = "depth"  # depth | mesh_mask | material_mask
    volume_kind: str = "emission"  # emission | single | none
    n_bins: int = 32
    prt_nsamples: int = 32  # per-hit transfer/BSDF samples (diffuse/glossyprt)
    # irradiance-cache knobs (reference: irradiancecache.cpp:377-383)
    ic_minweight: float = 0.5
    ic_minspacing: float = 2.5  # in pixel-spacing units
    ic_maxspacing: float = 15.0
    ic_maxangle: float = 10.0  # degrees
    ic_stride: int = 8  # cache-point subsampling along the wavefront


class KeySource:
    """Uniforms from structural rng keys (default path)."""

    def __init__(self, keys):
        self.keys = keys

    def get(self, bounce, purpose, n):
        k = rngmod.bounce_key(self.keys, bounce, purpose)
        return rngmod.uniform_per(k, n)


class BatchedKeySource:
    """All bounce uniforms of the path loop derived in ONE threefry pass.

    The on-the-fly KeySource derives a fresh key (fold_in) + uniforms per
    (bounce, purpose) — ~4 derivation pairs per bounce, each a separate
    32k-lane threefry dispatch inside the loop. Batching them into a
    single (R, D, 8) tensor up front removes ~20 derivations per wave;
    streams stay per-path/per-bounce/per-purpose via the fixed column
    layout: [light_sel, light_u1, light_u2, bsdf_lobe, bsdf_u1, bsdf_u2,
    rr, spare]."""

    _COLS = {
        rngmod.LIGHT_SELECT: 0,
        rngmod.LIGHT_SAMPLE: 1,
        rngmod.BSDF_SAMPLE: 3,
        rngmod.ROULETTE: 6,
    }

    def __init__(self, keys, max_depth: int):
        ku = rngmod.bounce_key(keys, 0, 15)  # one reserved purpose tag
        D = max(max_depth, 1)
        self.u = rngmod.uniform_per(ku, D * 8).reshape(
            keys.shape + (D, 8)
        )

    def get(self, bounce, purpose, n):
        b = jnp.clip(bounce, 0, self.u.shape[-2] - 1)
        col = self._COLS[purpose]
        blk = jax.lax.dynamic_index_in_dim(self.u, b, axis=-2, keepdims=False)
        return jax.lax.slice_in_dim(blk, col, col + n, axis=-1)


class PrimarySource:
    """Uniforms read from an explicit primary-sample vector (R, D) — the
    Kelemen-style primary sample space used by the Metropolis renderer
    (reference: renderers/metropolis.{h,cpp} PSS mutations).

    Layout: dims [0:5) camera (image x/y, lens u/v, time); per bounce b a
    block of 7 at 5 + 7b: [light_sel, light_u1, light_u2, bsdf_lobe,
    bsdf_u1, bsdf_u2, rr]."""

    CAMERA_DIMS = 5
    PER_BOUNCE = 7
    _OFFSETS = {
        rngmod.LIGHT_SELECT: 0,
        rngmod.LIGHT_SAMPLE: 1,
        rngmod.BSDF_SAMPLE: 3,
        rngmod.ROULETTE: 6,
    }

    def __init__(self, u):
        self.u = u

    @staticmethod
    def n_dims(max_depth: int) -> int:
        return PrimarySource.CAMERA_DIMS + PrimarySource.PER_BOUNCE * max_depth

    def get(self, bounce, purpose, n):
        col = (
            self.CAMERA_DIMS
            + bounce * self.PER_BOUNCE
            + self._OFFSETS[purpose]
        )
        return jax.lax.dynamic_slice_in_dim(self.u, col, n, axis=1)


def _shadow_unoccluded(g: SceneGeometry, p, ng, wi, dist, eps):
    """Trace shadow rays; True where the light sample is visible
    (reference: VisibilityTester::Unoccluded → Scene::IntersectP)."""
    o = offset_ray_origin(p, ng, wi, eps)
    tmax = jnp.where(jnp.isfinite(dist), dist * (1.0 - 1e-3) - eps, jnp.float32(1e30))
    rays = geom.Ray(
        origin=o,
        direction=wi,
        tmin=jnp.zeros_like(dist),
        tmax=jnp.maximum(tmax, 0.0),
        time=jnp.zeros_like(dist),
        wavelength=jnp.zeros_like(dist),
    )
    hit = intersect(g, rays, any_hit=True)
    return ~hit.valid


def _nee_one_light(scene: RenderScene, si, lm, wo_local, frame, source, keys,
                   bounce, active, defer_shadow: bool = False):
    """One-light NEE with MIS (reference: UniformSampleOneLight +
    EstimateDirect, core/integrator.cpp:74-180). Returns (R, S) estimate
    already multiplied by the light-count factor.

    ``defer_shadow``: skip the visibility trace and return instead
    (candidate_contrib (R, S), shadow_o, shadow_d, shadow_tmax, candidate)
    — the caller folds the shadow ray into the NEXT bounce's batched
    traversal (one merged closest+any-hit pass per bounce)."""
    lt = scene.lights
    n_lights = lt.count
    if n_lights == 0:
        z = jnp.zeros(si.p.shape[:-1] + (scene.materials.kd.shape[-1],))
        if defer_shadow:
            R0 = si.p.shape[0]
            return (z, si.p, si.ns, jnp.zeros((R0,)),
                    jnp.zeros((R0,), bool))
        return z
    ss, ts, ns = frame
    u_sel = source.get(bounce, rngmod.LIGHT_SELECT, 1)[..., 0]
    u = source.get(bounce, rngmod.LIGHT_SAMPLE, 2)
    light_idx = jnp.minimum((u_sel * n_lights).astype(jnp.int32), n_lights - 1)
    ls = lights_mod.sample_li(lt, scene.geometry, light_idx, si.p, u[..., 0], u[..., 1])
    wi_local = bxdf.world_to_local(ls.wi, ss, ts, ns)
    pools = mat_mod.pools_of(scene.materials)
    # geometric-normal classification (BSDF::f) — load-bearing under
    # strong bump/shading-normal tilt
    ng_loc = bxdf.world_to_local(si.ng, ss, ts, ns)
    f = mat_mod.bsdf_f(lm, wo_local, wi_local, pools, ng_loc=ng_loc)
    cos_i = geom.absdot(ls.wi, ns)
    candidate = (
        active
        & (ls.pdf > 0.0)
        & (cos_i > 0.0)
        & jnp.any(f > 0.0, axis=-1)
        & jnp.any(ls.L > 0.0, axis=-1)
    )
    # MIS weight (delta lights → 1)
    pdf_b = mat_mod.bsdf_pdf(lm, wo_local, wi_local)
    w_mis = jnp.where(
        ls.is_delta, 1.0, smp.power_heuristic(1.0, ls.pdf, 1.0, pdf_b)
    )
    contrib = f * ls.L * (cos_i * w_mis / jnp.maximum(ls.pdf, 1e-12))[..., None]
    if scene.has_volumes:
        # media attenuation along the shadow ray
        # (reference: Renderer::Transmittance in EstimateDirect,
        # integrator.cpp:130)
        from pbrt_tpu.media import volumes as vol_mod

        k_t = rngmod.bounce_key(keys, bounce, rngmod.VOLUME)
        u_t = rngmod.uniform_per(k_t, 1)[..., 0]
        t1 = jnp.where(jnp.isfinite(ls.dist), ls.dist, 1e4)
        tr = vol_mod.transmittance(
            scene.volumes, si.p, ls.wi, jnp.zeros_like(t1), t1, u_t
        )
        contrib = contrib * tr
    if defer_shadow:
        o_sh = offset_ray_origin(si.p, si.ng, ls.wi, si.ray_epsilon)
        tmax_sh = jnp.maximum(
            jnp.where(
                jnp.isfinite(ls.dist),
                ls.dist * (1.0 - 1e-3) - si.ray_epsilon,
                jnp.float32(1e30),
            ),
            0.0,
        )
        return (
            jnp.where(candidate[..., None], contrib * n_lights, 0.0),
            o_sh, ls.wi, jnp.where(candidate, tmax_sh, 0.0), candidate,
        )
    visible = _shadow_unoccluded(
        scene.geometry, si.p, si.ng, ls.wi,
        # zero-contribution lanes get dist 0 → tmax 0 → instant traversal
        # exit; their visibility is discarded by the candidate mask anyway
        jnp.where(candidate, ls.dist, 0.0), si.ray_epsilon
    )
    ok = candidate & visible
    return jnp.where(ok[..., None], contrib * n_lights, 0.0)


def _spread_of(scene: RenderScene):
    """Static gate: footprint math is compiled in only when the camera
    published a nonzero pixel spread (textured perspective-like scenes)."""
    return scene.pixel_spread if scene.pixel_spread > 0.0 else None


def apply_textures(scene: RenderScene, si, lm):
    """Texture-bound material parameters + the fork's normal mapping.

    Reference: Texture<T>::Evaluate calls inside every material GetBSDF
    (e.g. matte.cpp:40-48) and the fork's NormalMap-over-bumpmap preference
    (e.g. anisoward.cpp:47-56)."""
    import dataclasses as _dc

    if not scene.has_textures:
        return si, lm
    tt = scene.textures
    mats = scene.materials
    mi = jnp.maximum(si.material, 0)
    fp = (si.uv_sigma, si.uv_major) if _spread_of(scene) is not None \
        else (None, None)

    def override_spec(cur, tex_ids, rows):
        tid = tex_ids[rows]
        val = jnp.maximum(
            tex_mod.eval_spectrum(tt, tid, si.uv, si.p, *fp), 0.0
        )
        return jnp.where((tid >= 0)[..., None], val, cur)

    def apply_one(lane, rows):
        return _dc.replace(
            lane,
            kd=override_spec(lane.kd, mats.kd_tex, rows),
            ks=override_spec(lane.ks, mats.ks_tex, rows),
        )

    if isinstance(lm, mat_mod.MixLane):
        # textures bind per sub-material row (reference: MixMaterial builds
        # both sub-BSDFs with their own texture evaluations, mix.cpp:40-56)
        lm = _dc.replace(
            lm, lm1=apply_one(lm.lm1, lm.m1), lm2=apply_one(lm.lm2, lm.m2)
        )
    else:
        lm = apply_one(lm, mi)
    # fork normalmap: tangent-space normal from an RGB texture, applied in
    # preference to bumpmap when non-black
    ntid = mats.normal_tex[mi]
    has_nm = ntid >= 0
    nm_spec = tex_mod.eval_spectrum(tt, ntid, si.uv, si.p)
    rgb = spec.to_rgb(nm_spec)
    nonblack = jnp.any(nm_spec > 1e-6, axis=-1)
    t = 2.0 * rgb - 1.0
    ss0, ts0 = bxdf.make_shading_frame(si.ns, si.dpdu)
    n_new = geom.normalize(
        t[..., 0:1] * ss0 + t[..., 1:2] * ts0 + t[..., 2:3] * si.ns
    )
    use = has_nm & nonblack
    si = _dc.replace(si, ns=jnp.where(use[..., None], n_new, si.ns))
    # bump mapping (reference: Material::Bump, core/material.cpp:40-84):
    # displacement texture sampled at u+du / v+dv offsets; perturbed
    # dpdu/dpdv; n = normalize(cross). du from the ray-cone uv footprint
    # (the wavefront's dudx analogue) with the reference's .01 fallback —
    # filtered evaluation flattens the perturbation at distance exactly
    # like the reference's differential-filtered Evaluate. The fork
    # prefers normalmap when present (anisoward.cpp:47-56).
    if mats.has_bump:
        btid = mats.bump_tex[mi]
        has_b = (btid >= 0) & ~use
        # per-axis uv offsets: du = .5(|dudx|+|dudy|), dv = .5(|dvdx|+|dvdy|)
        # straight from the per-pixel-axis uv differentials
        # (material.cpp:46-57), with the same .01 zero-footprint fallback
        # (secondary bounces carry zero differentials → .01 + unfiltered,
        # exactly the reference's hasDifferentials=false path).
        if si.duvdx is not None:
            du = 0.5 * (jnp.abs(si.duvdx[..., 0]) + jnp.abs(si.duvdy[..., 0]))
            dv = 0.5 * (jnp.abs(si.duvdx[..., 1]) + jnp.abs(si.duvdy[..., 1]))
            du = jnp.where(du > 1e-9, du, 0.01)
            dv = jnp.where(dv > 1e-9, dv, 0.01)
        else:
            du = jnp.full(si.t.shape, 0.01)
            dv = du
        # exact Material::Bump displaced-partials chain
        # (material.cpp:40-84): evaluate the displacement at u/v-offset
        # auxiliary points (same filter widths), then
        #   dpdu' = dpdu + (uDisp-disp)/du · n + disp · dndu   (and v alike)
        dpdu0, dpdv0 = si.dpdu, si.dpdv
        d0 = tex_mod.eval_float(tt, btid, si.uv, si.p, *fp)
        d_u = tex_mod.eval_float(
            tt, btid, si.uv.at[..., 0].add(du),
            si.p + du[..., None] * dpdu0, *fp
        )
        d_v = tex_mod.eval_float(
            tt, btid, si.uv.at[..., 1].add(dv),
            si.p + dv[..., None] * dpdv0, *fp
        )
        dpdu_b = (
            dpdu0 + ((d_u - d0) / du)[..., None] * si.ns
            + d0[..., None] * si.dndu
        )
        dpdv_b = (
            dpdv0 + ((d_v - d0) / dv)[..., None] * si.ns
            + d0[..., None] * si.dndv
        )
        n_b = geom.normalize(jnp.cross(dpdu_b, dpdv_b))
        n_b = geom.face_forward(n_b, si.ng)
        si = _dc.replace(
            si,
            ns=jnp.where(has_b[..., None], n_b, si.ns),
            dpdu=jnp.where(has_b[..., None], dpdu_b, si.dpdu),
            dpdv=jnp.where(has_b[..., None], dpdv_b, si.dpdv),
        )
    return si, lm


def trace_radiance(scene: RenderScene, rays: geom.Ray, keys,
                   cfg: IntegratorConfig, uniforms=None, diffs=None):
    """Main entry: (R,) wavefront → (L (R, S), first_hit_t (R,)).

    keys: per-path rng key array (R,). ``uniforms``: optional (R, D)
    primary-sample array (Metropolis) — replaces the key-derived uniforms
    for light/BSDF/RR decisions. ``diffs``: optional camera-ray
    differentials (rx_o, rx_d, ry_o, ry_d) — exact texture footprints on
    the FIRST hit; later bounces get zero differentials (unfiltered
    lookups + the 0.01 bump fallback), matching the reference where only
    camera rays carry differentials (path.cpp spawns plain
    RayDifferentials with hasDifferentials=false).
    """
    if cfg.kind == "metadata":
        return _metadata_li(scene, rays, cfg)
    if cfg.kind == "ambientocclusion":
        return _ao_li(scene, rays, keys, cfg)
    if cfg.kind == "irradiancecache":
        from pbrt_tpu.integrators.irradiance import irradiance_cache_li

        return irradiance_cache_li(scene, rays, keys, cfg)
    if cfg.kind == "useprobes":
        from pbrt_tpu.integrators.irradiance import useprobes_li

        return useprobes_li(scene, rays, keys, cfg, scene.probes)
    if cfg.kind == "diffuseprt":
        from pbrt_tpu.integrators.prt import diffuseprt_li

        return diffuseprt_li(scene, rays, keys, cfg)
    if cfg.kind == "glossyprt":
        from pbrt_tpu.integrators.prt import glossyprt_li

        return glossyprt_li(scene, rays, keys, cfg)

    S = scene.materials.kd.shape[-1]
    R = rays.origin.shape[0]
    n_lights = max(scene.lights.count, 1)
    source = (
        BatchedKeySource(keys, cfg.max_depth)
        if uniforms is None
        else PrimarySource(uniforms)
    )
    # merged shadow+closest traversal: the NEE shadow ray of bounce b rides
    # the closest-hit batch of bounce b+1 as the any-hit half of one 2R-lane
    # traversal. MEASURED SLOWER on the killeroo bench (601k vs 689k
    # paths/s): per-iteration cost scales with lanes on this chip (the
    # 32k-lane loop is already throughput-bound, not fixed-cost-bound), so
    # doubling the batch width buys nothing and the mixed skew costs extra
    # compaction rounds. Kept behind an env flag for wider-chip tuning.
    import os as _os

    # Unrolling the (static-trip-count) bounce loop lets XLA fuse across
    # bounces and drop the fori_loop carry streaming: measured +8% on the
    # bench (689k → 746k paths/s). Default on for shallow depths where the
    # ~max_depth× compile-time growth is cheap.
    _UNROLL_BOUNCES = _os.environ.get(
        "PBRT_TPU_UNROLL_BOUNCES", "1" if cfg.max_depth <= 6 else "0"
    ) == "1"
    merged_shadow = (
        _os.environ.get("PBRT_TPU_MERGE_SHADOW", "0") == "1"
        and scene.geometry.accel_kind == "bvh"
        and scene.geometry.wide_rows is not None
        and scene.lights.count > 0
    )

    def accumulate_hit(carry_L, ray, hit, si, throughput, alive, specular_bounce,
                       prev_bsdf_pdf):
        """Escape (env Le) + emissive-hit accumulation with MIS weights."""
        L = carry_L
        hit_valid = si.valid & alive
        escaped = alive & (~si.valid)
        # static gates: compile in only the light families the scene uses
        # (active_types is a static tuple — same mechanism as the lobe-set
        # compaction; skipping the env half saves ~4 ms/bounce on env-less
        # scenes like killeroo)
        has_env = lights_mod.INFINITE in scene.lights.active_types
        has_area = lights_mod.AREA in scene.lights.active_types
        if scene.lights.count > 0 and has_env:
            le_bg = lights_mod.le_escaped(scene.lights, ray.direction)
            pdf_env = lights_mod.pdf_li(
                scene.lights,
                scene.geometry,
                jnp.argmax(scene.lights.type == lights_mod.INFINITE)
                * jnp.ones((R,), jnp.int32),
                ray.origin,
                ray.direction,
            )
            w_env = jnp.where(
                specular_bounce,
                1.0,
                smp.power_heuristic(1.0, prev_bsdf_pdf, 1.0, pdf_env / n_lights),
            )
            L = L + jnp.where(
                escaped[..., None], throughput * le_bg * w_env[..., None], 0.0
            )
        if scene.lights.count > 0 and has_area:
            le = lights_mod.emitted_radiance(
                scene.lights, si.area_light, si.ng, si.wo
            )
            pdf_light_hit = lights_mod.pdf_li_hit(
                scene.lights,
                scene.geometry,
                si.area_light,
                ray.origin,
                geom.normalize(ray.direction),
                hit.t,
                si.ng,
            )
            w_hit = jnp.where(
                specular_bounce,
                1.0,
                smp.power_heuristic(
                    1.0, prev_bsdf_pdf, 1.0, pdf_light_hit / n_lights
                ),
            )
            emissive = hit_valid & (si.area_light >= 0)
            L = L + jnp.where(
                emissive[..., None], throughput * le * w_hit[..., None], 0.0
            )
        return L

    def _merged_intersect(ray, pend):
        """One 2R-lane traversal: [closest rays ; pending shadow rays]."""
        pend_o, pend_d, pend_tmax, pend_L, pend_ok = pend
        big = geom.Ray(
            origin=jnp.concatenate([ray.origin, pend_o]),
            direction=jnp.concatenate([ray.direction, pend_d]),
            tmin=jnp.concatenate([ray.tmin, jnp.zeros((R,), jnp.float32)]),
            tmax=jnp.concatenate([ray.tmax, pend_tmax]),
            time=jnp.concatenate([ray.time, ray.time]),
            wavelength=jnp.concatenate([ray.wavelength, ray.wavelength]),
        )
        any_mask = jnp.concatenate(
            [jnp.zeros((R,), bool), jnp.ones((R,), bool)]
        )
        hit2 = intersect(scene.geometry, big, any_hit=any_mask)
        hit = Hit(
            t=hit2.t[:R], prim=hit2.prim[:R], b1=hit2.b1[:R],
            b2=hit2.b2[:R],
            inst=None if hit2.inst is None else hit2.inst[:R],
        )
        occluded = hit2.prim[R:] >= 0
        dL = jnp.where((pend_ok & ~occluded)[..., None], pend_L, 0.0)
        return hit, dL

    def _empty_pend():
        return (
            jnp.full((R, 3), 1e8, jnp.float32),
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3)),
            jnp.zeros((R,), jnp.float32),
            jnp.zeros((R, S), jnp.float32),
            jnp.zeros((R,), bool),
        )

    def bounce_body(bounce, carry):
        """One full bounce: intersect → accumulate → NEE → BSDF → RR → spawn.
        ``bounce`` is traced, so the loop compiles once."""
        (ray, L, throughput, alive, specular_bounce, prev_bsdf_pdf,
         first_hit_t, gather_only, pend) = carry
        if merged_shadow:
            hit, dL = _merged_intersect(ray, pend)
            L = L + dL
        else:
            hit = intersect(scene.geometry, ray)
        si = surface_interaction(scene.geometry, ray, hit,
                                 spread=_spread_of(scene), diffs=diffs)
        if diffs is not None:
            # differentials are only valid against the CAMERA rays —
            # zero the footprint on every later bounce (reference:
            # secondary rays carry hasDifferentials=false)
            import dataclasses as _dcl

            primary = jnp.equal(bounce, 0)
            p2 = primary[..., None]
            si = _dcl.replace(
                si,
                uv_sigma=jnp.where(primary, si.uv_sigma, 0.0),
                uv_major=jnp.where(p2, si.uv_major, 0.0),
                duvdx=jnp.where(p2, si.duvdx, 0.0),
                duvdy=jnp.where(p2, si.duvdy, 0.0),
            )
        first_hit_t = jnp.where(
            bounce == 0, jnp.where(si.valid, hit.t, 0.0), first_hit_t
        )
        L = accumulate_hit(
            L, ray, hit, si, throughput, alive, specular_bounce, prev_bsdf_pdf
        )
        # gather-only lanes (EstimateDirect's BSDF-sampling half for the
        # direct-style integrators) exist solely to collect Le along the
        # sampled direction above — they terminate here
        alive = alive & si.valid & ~gather_only

        # --- shading frame + lane materials ------------------------------
        lm = mat_mod.gather_lane(scene.materials, si.material)
        si, lm = apply_textures(scene, si, lm)
        ss, ts = bxdf.make_shading_frame(si.ns, si.dpdu)
        frame = (ss, ts, si.ns)
        wo_local = bxdf.world_to_local(si.wo, ss, ts, si.ns)

        # --- next-event estimation ---------------------------------------
        delta_only = mat_mod.has_delta_only(lm)
        nee_active = alive & (~delta_only)
        if merged_shadow:
            neeL, po, pd, ptm, pok = _nee_one_light(
                scene, si, lm, wo_local, frame, source, keys, bounce,
                nee_active, defer_shadow=True,
            )
            # park dead shadow lanes far outside the scene (instant miss)
            pend = (
                jnp.where(pok[..., None], po, 1e8),
                pd,
                jnp.where(pok, ptm, 0.0),
                throughput * neeL,
                pok,
            )
        else:
            L = L + throughput * _nee_one_light(
                scene, si, lm, wo_local, frame, source, keys, bounce,
                nee_active,
            )

        # --- photon mapping: caustic + indirect density estimation --------
        if cfg.kind == "photonmap" and scene.has_photons:
            from pbrt_tpu.integrators import photonmap as pm

            lpho = pm.radiance_estimate(
                scene.photons, scene, si, lm, wo_local, frame
            )
            L = L + jnp.where(
                nee_active[..., None], throughput * lpho, 0.0
            )

        # --- IGI: virtual point light gathering --------------------------
        if cfg.kind == "igi" and scene.has_vpls:
            from pbrt_tpu.integrators import igi as igi_mod

            vk = rngmod.bounce_key(keys, bounce, rngmod.PHOTON)
            L = L + throughput * jnp.where(
                nee_active[..., None],
                igi_mod.vpl_lighting(
                    scene, scene.vpls, si, lm, wo_local, frame, vk
                ),
                0.0,
            )

        # --- dipole BSSRDF diffusion term --------------------------------
        # (reference: DipoleSubsurfaceIntegrator::Li — (1/π)·Ft·Mo)
        if cfg.kind == "dipolesubsurface" and scene.has_subsurface:
            from pbrt_tpu.integrators import dipole as dip
            from pbrt_tpu.materials.table import SUBSURFACE, KDSUBSURFACE

            mk = scene.materials.kind[jnp.maximum(si.material, 0)]
            is_ss = alive & ((mk == SUBSURFACE) | (mk == KDSUBSURFACE))
            mo = dip.mo_gather(
                scene.subsurface, scene.materials, si.p, si.material
            )
            cos_o = bxdf.abs_cos_theta(wo_local)
            eta_ss = scene.materials.eta[jnp.maximum(si.material, 0)]
            ft = 1.0 - bxdf.fresnel_dielectric(cos_o, 1.0, eta_ss)
            # Fdt = 1 − Fdr(η): the diffuse transmittance factor
            # (dipolesubsurface.cpp:290 `float Fdt = 1.f - Fdr(eta)`)
            fdr = (-1.440 / (eta_ss * eta_ss) + 0.710 / eta_ss + 0.668
                   + 0.0636 * eta_ss)
            fdt = 1.0 - fdr
            L = L + jnp.where(
                is_ss[..., None],
                throughput * mo * (ft * fdt / jnp.pi)[..., None],
                0.0,
            )

        # --- sample BSDF for continuation --------------------------------
        ub = source.get(bounce, rngmod.BSDF_SAMPLE, 3)
        wi_local, f, pdf, is_delta = mat_mod.bsdf_sample(
            lm, wo_local, ub[..., 0], ub[..., 1], ub[..., 2],
            mat_mod.pools_of(scene.materials),
            ng_loc=bxdf.world_to_local(si.ng, ss, ts, si.ns),
        )
        wi_world = bxdf.local_to_world(wi_local, ss, ts, si.ns)
        cos_i = geom.absdot(wi_world, si.ns)
        ok = alive & (pdf > 0.0) & jnp.any(f > 0.0, axis=-1)
        gather_next = jnp.zeros_like(ok)
        if cfg.kind in ("directlighting", "whitted", "dipolesubsurface",
                        "igi", "photonmap"):
            # only specular recursion continues (reference:
            # directlighting.cpp Li → SpecularReflect/Transmit) — but the
            # non-delta BSDF sample is NOT discarded: EstimateDirect's
            # second half (integrator.cpp:145-180) shoots it and adds
            # Le·f·cos/pdf with MIS if it reaches a light. whitted has no
            # MIS half (whitted.cpp samples lights only).
            if cfg.kind != "whitted":
                gather_next = ok & ~is_delta
            ok = ok & is_delta
        throughput = jnp.where(
            (ok | gather_next)[..., None],
            throughput * f * (cos_i / jnp.maximum(pdf, 1e-12))[..., None],
            throughput,
        )
        alive = ok | gather_next
        specular_bounce = is_delta & ok
        prev_bsdf_pdf = pdf

        # --- Russian roulette (reference: path.cpp:95-100) ----------------
        if cfg.kind == "path":
            ty = spec.luminance(throughput)
            cont_p = jnp.minimum(0.5, ty)
            u_rr = source.get(bounce, rngmod.ROULETTE, 1)[..., 0]
            rr_on = bounce > cfg.rr_depth
            survive = (~rr_on) | (u_rr < cont_p)
            throughput = jnp.where(
                (rr_on & alive & survive)[..., None],
                throughput / jnp.maximum(cont_p, 1e-6)[..., None],
                throughput,
            )
            alive = alive & survive

        # --- spawn continuation ray --------------------------------------
        o_new = offset_ray_origin(si.p, si.ng, wi_world, si.ray_epsilon)
        ray = geom.Ray(
            origin=jnp.where(alive[..., None], o_new, ray.origin),
            direction=jnp.where(alive[..., None], wi_world, ray.direction),
            tmin=jnp.zeros_like(ray.tmin),
            # dead lanes get tmax=0 so the traversal pops them at the root
            # and straggler compaction frees the lane immediately (their
            # results are discarded either way)
            tmax=jnp.where(alive, jnp.inf, 0.0),
            time=ray.time,
            wavelength=ray.wavelength,
        )
        return (ray, L, throughput, alive, specular_bounce, prev_bsdf_pdf,
                first_hit_t, gather_next, pend)

    # lens cameras mark vignetted/dead rays with a zero direction
    # (reference: GenerateRay returning weight 0, realisticDiffraction.cpp)
    ray_alive = geom.length_sq(rays.direction) > 0.5
    init = (
        rays,
        jnp.zeros((R, S), jnp.float32),
        jnp.ones((R, S), jnp.float32),
        ray_alive,
        jnp.ones((R,), bool),  # camera rays count as "specular prev"
        jnp.ones((R,), jnp.float32),
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), bool),  # gather_only
        _empty_pend(),
    )
    if _UNROLL_BOUNCES:
        # max_depth is static; unrolling lets XLA fuse across bounces and
        # drop the fori_loop carry streaming (the async copy-start pairs
        # that dominate the profile trace — PERF.md). Compile time grows
        # ~max_depth×; gated so the default stays fast to build.
        carry = init
        for b in range(cfg.max_depth):
            carry = bounce_body(b, carry)
    else:
        carry = jax.lax.fori_loop(0, cfg.max_depth, bounce_body, init)
    (ray, L, throughput, alive, specular_bounce, prev_bsdf_pdf, first_hit_t,
     _gather, pend) = carry
    # final tail: one more intersect purely to collect Le on the last
    # segment — and to resolve the last bounce's pending shadow batch
    if merged_shadow:
        hit, dL = _merged_intersect(ray, pend)
        L = L + dL
    else:
        hit = intersect(scene.geometry, ray)
    si = surface_interaction(scene.geometry, ray, hit,
                             spread=_spread_of(scene))
    first_hit_t = jnp.where(
        cfg.max_depth == 0, jnp.where(si.valid, hit.t, 0.0), first_hit_t
    )
    L = accumulate_hit(
        L, ray, hit, si, throughput, alive, specular_bounce, prev_bsdf_pdf
    )

    # --- participating media on the camera segment ------------------------
    # (reference: SamplerRenderer::Li returns T·Li + Lvi,
    # samplerrenderer.cpp:244-246 — the volume integrator runs on the
    # camera ray; shadow rays were attenuated in NEE above)
    if scene.has_volumes and cfg.volume_kind != "none":
        from pbrt_tpu.media import volumes as vol_mod

        k_v = rngmod.bounce_key(keys, 0, rngmod.VOLUME)
        u_v = rngmod.uniform_per(k_v, 1)[..., 0]
        t_end = jnp.where(first_hit_t > 0.0, first_hit_t, 1e4)
        if cfg.volume_kind == "single":
            Lv, tr = vol_mod.integrate_single_scattering(
                scene.volumes, scene, rays.origin,
                geom.normalize(rays.direction),
                jnp.zeros_like(t_end), t_end, keys, 0,
            )
        else:
            Lv, tr = vol_mod.integrate_emission(
                scene.volumes, rays.origin, geom.normalize(rays.direction),
                jnp.zeros_like(t_end), t_end, u_v,
            )
        L = tr * L + Lv
    return L, first_hit_t


def _ao_li(scene: RenderScene, rays, keys, cfg: IntegratorConfig):
    """Cosine-weighted ambient occlusion
    (reference: integrators/ambientocclusion.cpp:47-87)."""
    S = cfg.n_bins
    hit = intersect(scene.geometry, rays)
    si = surface_interaction(scene.geometry, rays, hit)
    first_hit_t = jnp.where(si.valid, hit.t, 0.0)
    ss, ts = bxdf.make_shading_frame(si.ns, si.dpdu)
    n_vis = jnp.zeros(si.t.shape, jnp.float32)
    for s in range(cfg.ao_nsamples):
        k = rngmod.bounce_key(keys, s, rngmod.BSDF_SAMPLE)
        u = rngmod.uniform_per(k, 2)
        w_local = smp.cosine_sample_hemisphere(u[..., 0], u[..., 1])
        w = bxdf.local_to_world(w_local, ss, ts, si.ns)
        w = geom.face_forward(w, si.ns)
        free = _shadow_unoccluded(
            scene.geometry, si.p, si.ng, w,
            jnp.full(si.t.shape, cfg.ao_maxdist), si.ray_epsilon,
        )
        n_vis = n_vis + free.astype(jnp.float32)
    frac = jnp.where(si.valid, n_vis / cfg.ao_nsamples, 0.0)
    return jnp.broadcast_to(frac[..., None], frac.shape + (S,)), first_hit_t


def _metadata_li(scene: RenderScene, rays, cfg: IntegratorConfig):
    """Fork metadata integrator: depth / mesh-id / material-id as radiance
    (reference: integrators/metadata.cpp:42-80)."""
    S = cfg.n_bins
    hit = intersect(scene.geometry, rays)
    si = surface_interaction(scene.geometry, rays, hit)
    first_hit_t = jnp.where(si.valid, hit.t, 0.0)
    if cfg.metadata_channel == "depth":
        v = jnp.where(si.valid, hit.t, 0.0)
    elif cfg.metadata_channel == "mesh_mask":
        v = jnp.where(si.valid, si.mesh_id.astype(jnp.float32), 0.0)
    else:  # material_mask
        mat_ids = jnp.where(si.valid, si.material, -1)
        v = (mat_ids + 1).astype(jnp.float32)
    return jnp.broadcast_to(v[..., None], v.shape + (S,)), first_hit_t
