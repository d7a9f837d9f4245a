"""Material system: a closed lobe-composition table, no virtual dispatch.

Reference: src/materials/*.cpp — each material's GetBSDF() assembles 1-4
BxDF lobes (e.g. plastic = Lambertian(Kd) + Microfacet(Ks, FresnelDielectric,
Blinn(1/rough)), plastic.cpp:47-60). The fork adds anisoward (Ward BRDF) and
a ``normalmap`` parameter on every material.

TPU-native design: at scene build, every material instance is compiled into
rows of a ``MaterialTable`` — SoA parameter arrays plus an explicit **lobe
list** (up to 4 lobe type codes per material, mirroring pbrt's BSDF::Add
calls). At render time the wavefront gathers its per-lane parameters and
evaluates/samples lobes with ``lax.switch`` on the lobe code — pbrt's
"uniformly pick a matching BxDF, f = Σ lobes, pdf = mean of lobes"
semantics (reference: BSDF::Sample_f, core/reflection.cpp:531-600),
vectorized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.bsdf import bxdf
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.utils import pytree_dataclass, static_field

MAX_LOBES = 4

# material kinds (diagnostic / build-time only)
(MATTE, PLASTIC, GLASS, MIRROR, METAL, SHINYMETAL, SUBSTRATE, UBER,
 TRANSLUCENT, ANISOWARD, MEASURED, SUBSURFACE, KDSUBSURFACE, MIXMAT) = range(14)

# lobe type codes (runtime dispatch set)
(L_LAMBERT, L_ORENNAYAR, L_BLINN_DIEL, L_BLINN_COND, L_FRESNEL_BLEND,
 L_SPEC_REFL_DIEL, L_SPEC_REFL_NOOP, L_SPEC_REFL_COND, L_SPEC_TRANS,
 L_WARD, L_LAMBERT_TRANS, L_BLINN_DIEL_TRANS, L_IRREG_MEASURED,
 L_MERL_MEASURED) = range(14)

_DELTA_LOBES = (L_SPEC_REFL_DIEL, L_SPEC_REFL_NOOP, L_SPEC_REFL_COND, L_SPEC_TRANS)
N_LOBE_TYPES = 14


@pytree_dataclass
class MaterialTable:
    """(M, ...) SoA. Spectral params are (M, n_bins).

    ``lobe_type`` holds COMPACT indices into the static ``active_lobes``
    tuple (the set of lobe codes this scene actually uses) — the runtime
    dispatch switches over only those branches, keeping the compiled HLO
    proportional to the scene's material diversity, not the full lobe
    library."""

    kind: jnp.ndarray  # (M,) i32
    n_lobes: jnp.ndarray  # (M,) i32
    lobe_type: jnp.ndarray  # (M, MAX_LOBES) i32 compact, padded with -1
    kd: jnp.ndarray  # (M, S) diffuse
    ks: jnp.ndarray  # (M, S) glossy
    kr: jnp.ndarray  # (M, S) specular reflect
    kt: jnp.ndarray  # (M, S) specular transmit
    sigma: jnp.ndarray  # (M,) oren-nayar degrees
    exp_u: jnp.ndarray  # (M,) blinn/aniso exponent (1/roughness) or ward alpha
    exp_v: jnp.ndarray  # (M,)
    eta: jnp.ndarray  # (M,) dielectric ior
    eta_spec: jnp.ndarray  # (M, S) conductor eta
    k_spec: jnp.ndarray  # (M, S) conductor k
    # texture bindings, -1 = constant (resolved by the texture system)
    kd_tex: jnp.ndarray  # (M,) i32
    ks_tex: jnp.ndarray  # (M,) i32
    sigma_tex: jnp.ndarray  # (M,) i32 (float texture)
    bump_tex: jnp.ndarray  # (M,) i32 (float texture)
    normal_tex: jnp.ndarray  # (M,) i32 (spectrum texture; fork normalmap)
    # measured-BRDF pools (bsdf/measured.py)
    irreg_offset: jnp.ndarray  # (M,)
    irreg_count: jnp.ndarray  # (M,)
    merl_offset: jnp.ndarray  # (M,) -1 = none
    irreg_points: jnp.ndarray  # (P, 3)
    irreg_spectra: jnp.ndarray  # (P, S)
    merl_rgb: jnp.ndarray  # (Q, 3)
    # subsurface scattering parameters (dipole BSSRDF)
    ss_sigma_a: jnp.ndarray  # (M, S)
    ss_sigma_s: jnp.ndarray  # (M, S) reduced scattering σ's
    ss_scale: jnp.ndarray  # (M,)
    # mix material linkage (reference: materials/mix.cpp — BSDF is
    # amount·lobes(m1) + (1−amount)·lobes(m2) via ScaledBxDF)
    mix_m1: jnp.ndarray  # (M,) i32 row of namedmaterial1 (self if not mix)
    mix_m2: jnp.ndarray  # (M,) i32 row of namedmaterial2 (self if not mix)
    mix_amt: jnp.ndarray  # (M, S) amount spectrum (1 for non-mix rows)
    #: packed hot row (built by pack_materials): 6 spectral fields + the 12
    #: scalar dispatch fields in ONE aligned f32 row, so the per-bounce lane
    #: gather is a single row fetch instead of 14 separate gathers (the
    #: wide-BVH row lesson applied to shading; r3 measured gather_lane at
    #: 6.2 ms/wave with separate gathers).
    packed: jnp.ndarray = None  # (M, 6S+16) f32
    active_lobes: tuple = static_field(default=(L_LAMBERT,))
    has_mix: bool = static_field(default=False)
    #: any material carries a bumpmap texture (compile-gates Material::Bump)
    has_bump: bool = static_field(default=False)
    #: max lobes any material in the scene actually uses — bounds the
    #: static per-slot evaluation loops (matte scenes pay 1 slot, not 4)
    max_lobes: int = static_field(default=MAX_LOBES)

    @property
    def count(self) -> int:
        return self.kind.shape[0]


@pytree_dataclass
class LaneMaterial:
    """Per-ray gathered material parameters."""

    n_lobes: jnp.ndarray
    lobe_type: jnp.ndarray  # (R, MAX_LOBES)
    kd: jnp.ndarray
    ks: jnp.ndarray
    kr: jnp.ndarray
    kt: jnp.ndarray
    sigma: jnp.ndarray
    exp_u: jnp.ndarray
    exp_v: jnp.ndarray
    eta: jnp.ndarray
    eta_spec: jnp.ndarray
    k_spec: jnp.ndarray
    irreg_offset: jnp.ndarray
    irreg_count: jnp.ndarray
    merl_offset: jnp.ndarray
    active_lobes: tuple = static_field(default=(L_LAMBERT,))
    max_lobes: int = static_field(default=MAX_LOBES)


@pytree_dataclass
class MixLane:
    """Lane view of a scene containing mix materials: both sub-materials'
    lanes plus the blend amount. For non-mix lanes m1 == m2 == the row
    itself and amt == 1, so every formula degenerates to the plain lane."""

    lm1: LaneMaterial
    lm2: LaneMaterial
    amt: jnp.ndarray  # (R, S)
    m1: jnp.ndarray  # (R,) i32 sub-row indices (for texture binding)
    m2: jnp.ndarray  # (R,)


def pack_materials(mt: MaterialTable) -> MaterialTable:
    """Build the packed hot row (idempotent). Int fields ride as exact small
    f32 (all ≪ 2²⁴)."""
    import dataclasses

    if mt.packed is not None:
        return mt
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    parts = [
        f32(mt.kd), f32(mt.ks), f32(mt.kr), f32(mt.kt),
        f32(mt.eta_spec), f32(mt.k_spec),
        f32(mt.n_lobes)[:, None], f32(mt.lobe_type),
        f32(mt.sigma)[:, None], f32(mt.exp_u)[:, None],
        f32(mt.exp_v)[:, None], f32(mt.eta)[:, None],
        f32(mt.irreg_offset)[:, None], f32(mt.irreg_count)[:, None],
        f32(mt.merl_offset)[:, None],
    ]
    packed = jnp.concatenate(parts, axis=1)
    pad = (-packed.shape[1]) % 8
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
    return dataclasses.replace(mt, packed=packed)


def gather_lane(mt: MaterialTable, idx):
    if mt.has_mix:
        i = jnp.maximum(idx, 0)
        is_mix = mt.kind[i] == MIXMAT
        m1 = jnp.where(is_mix, mt.mix_m1[i], i)
        m2 = jnp.where(is_mix, mt.mix_m2[i], i)
        return MixLane(
            lm1=_gather_plain(mt, m1),
            lm2=_gather_plain(mt, m2),
            amt=jnp.where(is_mix[..., None], mt.mix_amt[i], 1.0),
            m1=m1,
            m2=m2,
        )
    return _gather_plain(mt, jnp.maximum(idx, 0))


def _gather_plain(mt: MaterialTable, i) -> LaneMaterial:
    if mt.packed is None:
        return LaneMaterial(
            n_lobes=mt.n_lobes[i],
            lobe_type=mt.lobe_type[i],
            kd=mt.kd[i],
            ks=mt.ks[i],
            kr=mt.kr[i],
            kt=mt.kt[i],
            sigma=mt.sigma[i],
            exp_u=mt.exp_u[i],
            exp_v=mt.exp_v[i],
            eta=mt.eta[i],
            eta_spec=mt.eta_spec[i],
            k_spec=mt.k_spec[i],
            irreg_offset=mt.irreg_offset[i],
            irreg_count=mt.irreg_count[i],
            merl_offset=mt.merl_offset[i],
            active_lobes=mt.active_lobes,
            max_lobes=mt.max_lobes,
        )
    # one aligned row gather; fields sliced out of the row
    S = mt.kd.shape[-1]
    row = mt.packed[i]
    sl = lambda a, b: row[..., a:b]
    base = 6 * S
    i32 = lambda x: x.astype(jnp.int32)
    return LaneMaterial(
        n_lobes=i32(row[..., base]),
        lobe_type=i32(sl(base + 1, base + 1 + MAX_LOBES)),
        kd=sl(0, S),
        ks=sl(S, 2 * S),
        kr=sl(2 * S, 3 * S),
        kt=sl(3 * S, 4 * S),
        sigma=row[..., base + 1 + MAX_LOBES],
        exp_u=row[..., base + 2 + MAX_LOBES],
        exp_v=row[..., base + 3 + MAX_LOBES],
        eta=row[..., base + 4 + MAX_LOBES],
        eta_spec=sl(4 * S, 5 * S),
        k_spec=sl(5 * S, 6 * S),
        irreg_offset=i32(row[..., base + 5 + MAX_LOBES]),
        irreg_count=i32(row[..., base + 6 + MAX_LOBES]),
        merl_offset=i32(row[..., base + 7 + MAX_LOBES]),
        active_lobes=mt.active_lobes,
        max_lobes=mt.max_lobes,
    )


# ---------------------------------------------------------------------------
# Lobe evaluation / pdf / sampling — local frame (ns = +z)
# ---------------------------------------------------------------------------


def _lobe_f(lobe, lm: LaneMaterial, wo, wi, pools=None, hemi=None):
    """f of one lobe code, per-lane. Delta lobes → 0. ``pools`` carries the
    measured-BRDF arrays unmapped through vmap.

    ``hemi``: the BSDF-level reflection/transmission classification
    (reference: BSDF::f, reflection.cpp:517-529 — reflection lobes apply
    iff Dot(wiW, ng)·Dot(woW, ng) > 0 against the GEOMETRIC normal, while
    the lobes themselves evaluate hemisphere-agnostic via AbsCosTheta).
    None → fall back to the shading-frame hemisphere (ng ≈ ns callers)."""
    s = lm.kd.shape[-1]
    zero = jnp.zeros(wo.shape[:-1] + (s,), wo.dtype)
    refl_ok = bxdf.same_hemisphere(wo, wi) if hemi is None else hemi
    trans_ok = ~refl_ok

    def irreg():
        from pbrt_tpu.bsdf import measured as meas

        pts, spectra, _ = pools
        f_val = meas.irreg_f_one(
            pts, spectra, lm.irreg_offset, lm.irreg_count, wo, wi
        )
        return jnp.where(refl_ok, f_val, 0.0)

    def merl():
        from pbrt_tpu.bsdf import measured as meas

        _, _, merl_rgb = pools
        f_val = meas.merl_f_one(merl_rgb, jnp.maximum(lm.merl_offset, 0), wo, wi, None)
        return jnp.where(refl_ok, f_val, 0.0)

    def lamb():
        return bxdf.lambertian_f(lm.kd, wo, wi) * refl_ok[..., None]

    def oren():
        return bxdf.oren_nayar_f(lm.kd, lm.sigma, wo, wi) * refl_ok[..., None]

    def blinn_diel():
        wh = geom.normalize(wo + wi)
        f_val = bxdf.fresnel_dielectric(geom.dot(wi, wh), 1.0, lm.eta)[..., None]
        return bxdf.microfacet_f(lm.ks, f_val, lm.exp_u, wo, wi) * refl_ok[..., None]

    def blinn_cond():
        wh = geom.normalize(wo + wi)
        f_val = bxdf.fresnel_conductor(geom.dot(wi, wh), lm.eta_spec, lm.k_spec)
        return bxdf.microfacet_f(lm.ks, f_val, lm.exp_u, wo, wi) * refl_ok[..., None]

    def fres_blend():
        return (
            bxdf.fresnel_blend_f(lm.kd, lm.ks, lm.exp_u, lm.exp_v, wo, wi)
            * refl_ok[..., None]
        )

    def ward():
        return bxdf.ward_f(lm.ks, lm.exp_u, lm.exp_v, wo, wi) * refl_ok[..., None]

    def lamb_trans():
        return bxdf.lambertian_f(lm.kt, wo, wi) * trans_ok[..., None]

    def blinn_trans():
        # translucent glossy transmission: evaluate with wi flipped
        wif = wi * jnp.asarray([1.0, 1.0, -1.0])
        wh = geom.normalize(wo + wif)
        f_val = bxdf.fresnel_dielectric(geom.dot(wif, wh), 1.0, lm.eta)[..., None]
        return bxdf.microfacet_f(lm.kr, f_val, lm.exp_u, wo, wif) * trans_ok[..., None]

    def delta():
        return zero

    all_branches = [
        lamb, oren, blinn_diel, blinn_cond, fres_blend,
        delta, delta, delta, delta,
        ward, lamb_trans, blinn_trans, irreg, merl,
    ]
    branches = [all_branches[code] for code in lm.active_lobes]
    if len(branches) == 1:
        return branches[0]()
    return jax.lax.switch(jnp.clip(lobe, 0, len(branches) - 1), branches)


def _lobe_pdf(lobe, lm: LaneMaterial, wo, wi):
    def cos_pdf():
        return bxdf.cosine_pdf(wo, wi)

    def blinn():
        return bxdf.blinn_pdf(lm.exp_u, wo, wi)

    def fres_blend():
        return 0.5 * (bxdf.cosine_pdf(wo, wi) + bxdf.aniso_pdf(lm.exp_u, lm.exp_v, wo, wi))

    def ward():
        return bxdf.ward_pdf(lm.exp_u, lm.exp_v, wo, wi)

    def lamb_trans():
        opposite = ~bxdf.same_hemisphere(wo, wi)
        return jnp.where(opposite, bxdf.abs_cos_theta(wi) * bxdf.INV_PI, 0.0)

    def blinn_trans():
        wif = wi * jnp.asarray([1.0, 1.0, -1.0])
        opposite = ~bxdf.same_hemisphere(wo, wi)
        return jnp.where(opposite, bxdf.blinn_pdf(lm.exp_u, wo, wif), 0.0)

    def zero():
        return jnp.zeros(wo.shape[:-1], wo.dtype)

    all_branches = [
        cos_pdf, cos_pdf, blinn, blinn, fres_blend,
        zero, zero, zero, zero,
        ward, lamb_trans, blinn_trans, cos_pdf, cos_pdf,
    ]
    branches = [all_branches[code] for code in lm.active_lobes]
    if len(branches) == 1:
        return branches[0]()
    return jax.lax.switch(jnp.clip(lobe, 0, len(branches) - 1), branches)


def _lobe_sample(lobe, lm: LaneMaterial, wo, u1, u2):
    """Sample one lobe. Returns (wi, pdf, f_delta, is_delta).

    For delta lobes f_delta is the full weight spectrum F·k/|cosθ| and
    pdf = 1 (pbrt convention, reflection.h:298-343); for others f_delta is
    unused (the caller re-evaluates the full f)."""
    s = lm.kd.shape[-1]
    zero_spec = jnp.zeros(wo.shape[:-1] + (s,), wo.dtype)

    def cos_sample():
        wi, pdf = bxdf.cosine_sample(u1, u2, wo)
        return wi, pdf, zero_spec, jnp.zeros(wo.shape[:-1], bool)

    def blinn_sample():
        wi, pdf = bxdf.blinn_sample_wh(lm.exp_u, wo, u1, u2)
        return wi, pdf, zero_spec, jnp.zeros(wo.shape[:-1], bool)

    def fres_blend_sample():
        use_diff = u1 < 0.5
        u1r = jnp.where(use_diff, u1 * 2.0, (u1 - 0.5) * 2.0)
        wi_d, _ = bxdf.cosine_sample(u1r, u2, wo)
        wi_s, _ = bxdf.aniso_sample_wh(lm.exp_u, lm.exp_v, wo, u1r, u2)
        wi = jnp.where(use_diff[..., None], wi_d, wi_s)
        pdf = 0.5 * (
            bxdf.cosine_pdf(wo, wi) + bxdf.aniso_pdf(lm.exp_u, lm.exp_v, wo, wi)
        )
        return wi, pdf, zero_spec, jnp.zeros(wo.shape[:-1], bool)

    def ward_sample():
        wi, pdf = bxdf.ward_sample(lm.exp_u, lm.exp_v, wo, u1, u2)
        return wi, pdf, zero_spec, jnp.zeros(wo.shape[:-1], bool)

    def spec_refl(fresnel_kind):
        def fn():
            wi = bxdf.specular_reflect_dir(wo)
            ci = bxdf.cos_theta(wi)
            if fresnel_kind == "diel":
                F = bxdf.fresnel_dielectric(ci, 1.0, lm.eta)[..., None]
            elif fresnel_kind == "cond":
                F = bxdf.fresnel_conductor(ci, lm.eta_spec, lm.k_spec)
            else:
                F = 1.0
            f = lm.kr * F / jnp.maximum(bxdf.abs_cos_theta(wi), 1e-8)[..., None]
            return (
                wi,
                jnp.ones(wo.shape[:-1], wo.dtype),
                f,
                jnp.ones(wo.shape[:-1], bool),
            )

        return fn

    def spec_trans():
        wi, valid, eta_ratio = bxdf.specular_transmit_dir(wo, 1.0, lm.eta)
        F = bxdf.fresnel_dielectric(bxdf.cos_theta(wo), 1.0, lm.eta)[..., None]
        # radiance scaling (ei²/et²) for transmission (reflection.cpp:489)
        f = (
            (eta_ratio**2)[..., None]
            * lm.kt
            * (1.0 - F)
            / jnp.maximum(bxdf.abs_cos_theta(wi), 1e-8)[..., None]
        )
        f = jnp.where(valid[..., None], f, 0.0)
        pdf = jnp.where(valid, 1.0, 0.0)
        return wi, pdf, f, jnp.ones(wo.shape[:-1], bool)

    def lamb_trans_sample():
        wi, pdf = bxdf.cosine_sample(u1, u2, wo)
        wi = wi * jnp.asarray([1.0, 1.0, -1.0])  # flip to other hemisphere
        return wi, pdf, zero_spec, jnp.zeros(wo.shape[:-1], bool)

    def blinn_trans_sample():
        wi, pdf = bxdf.blinn_sample_wh(lm.exp_u, wo, u1, u2)
        wi = wi * jnp.asarray([1.0, 1.0, -1.0])
        return wi, pdf, zero_spec, jnp.zeros(wo.shape[:-1], bool)

    all_branches = [
        cos_sample, cos_sample, blinn_sample, blinn_sample, fres_blend_sample,
        spec_refl("diel"), spec_refl("noop"), spec_refl("cond"), spec_trans,
        ward_sample, lamb_trans_sample, blinn_trans_sample,
        cos_sample, cos_sample,
    ]
    branches = [all_branches[code] for code in lm.active_lobes]
    if len(branches) == 1:
        return branches[0]()
    return jax.lax.switch(jnp.clip(lobe, 0, len(branches) - 1), branches)


# ---------------------------------------------------------------------------
# BSDF-level interface (pbrt BSDF::f / Pdf / Sample_f semantics)
# ---------------------------------------------------------------------------


def _bsdf_f_one(lm: LaneMaterial, wo, wi, pools=None, ng_loc=None):
    """Per-lane Σ over the material's lobes. Local frame, wo/wi (3,).
    ``ng_loc``: geometric normal in the shading frame — drives the
    reflection/transmission classification (BSDF::f)."""
    s = lm.kd.shape[-1]
    hemi = None
    if ng_loc is not None:
        hemi = (jnp.sum(wo * ng_loc, -1) * jnp.sum(wi * ng_loc, -1)) > 0.0
    f = jnp.zeros((s,), wo.dtype)
    for slot in range(min(MAX_LOBES, lm.max_lobes)):
        active = slot < lm.n_lobes
        lobe = jnp.maximum(lm.lobe_type[slot], 0)
        f = f + jnp.where(active, _lobe_f(lobe, lm, wo, wi, pools, hemi), 0.0)
    return f


def _bsdf_pdf_one(lm: LaneMaterial, wo, wi):
    pdf = jnp.zeros((), wo.dtype)
    for slot in range(min(MAX_LOBES, lm.max_lobes)):
        active = slot < lm.n_lobes
        lobe = jnp.maximum(lm.lobe_type[slot], 0)
        pdf = pdf + jnp.where(active, _lobe_pdf(lobe, lm, wo, wi), 0.0)
    return pdf / jnp.maximum(lm.n_lobes.astype(wo.dtype), 1.0)


def _bsdf_sample_one(lm: LaneMaterial, wo, u_lobe, u1, u2, pools=None,
                     ng_loc=None):
    n = jnp.maximum(lm.n_lobes, 1)
    slot = jnp.minimum((u_lobe * n.astype(u_lobe.dtype)).astype(jnp.int32), n - 1)
    lobe = jnp.maximum(lm.lobe_type[slot], 0)
    wi, pdf_s, f_delta, is_delta = _lobe_sample(lobe, lm, wo, u1, u2)
    nf = n.astype(wo.dtype)
    # non-delta: recompute f over ALL lobes with the geometric
    # classification (Sample_f's non-specular path, reflection.cpp:576-597;
    # specular keeps the sampled lobe's f unclassified, as the reference)
    f_smooth = _bsdf_f_one(lm, wo, wi, pools, ng_loc)
    pdf_smooth = _bsdf_pdf_one(lm, wo, wi)
    f = jnp.where(is_delta, f_delta, f_smooth)
    pdf = jnp.where(is_delta, pdf_s / nf, pdf_smooth)
    return wi, f, pdf, is_delta


def pools_of(mt: MaterialTable):
    """Measured-BRDF pools threaded unmapped through the vmapped dispatch."""
    return (mt.irreg_points, mt.irreg_spectra, mt.merl_rgb)


def bsdf_f(lm, wo, wi, pools=None, ng_loc=None):
    """Batched Σ over the material's lobes (R, S). Local frame.
    (reference: BSDF::f, core/reflection.cpp:517-529). For MixLane:
    amount·f(m1) + (1−amount)·f(m2) (reference: materials/mix.cpp).
    ``ng_loc``: (R, 3) geometric normal in the shading frame — enables the
    reference's geometric reflection/transmission classification (None →
    shading-hemisphere fallback, exact when ng == ns)."""
    if isinstance(lm, MixLane):
        f1 = bsdf_f(lm.lm1, wo, wi, pools, ng_loc)
        f2 = bsdf_f(lm.lm2, wo, wi, pools, ng_loc)
        return lm.amt * f1 + (1.0 - lm.amt) * f2
    if ng_loc is None:
        return jax.vmap(_bsdf_f_one, in_axes=(0, 0, 0, None))(
            lm, wo, wi, pools
        )
    return jax.vmap(_bsdf_f_one, in_axes=(0, 0, 0, None, 0))(
        lm, wo, wi, pools, ng_loc
    )


def bsdf_pdf(lm, wo, wi):
    """Mean of lobe pdfs (reference: BSDF::Pdf, reflection.cpp:602-612)."""
    if isinstance(lm, MixLane):
        same = (lm.m1 == lm.m2).astype(wo.dtype)
        p1 = bsdf_pdf(lm.lm1, wo, wi)
        p2 = bsdf_pdf(lm.lm2, wo, wi)
        # non-mix lanes: p1 == p2 → p1; mix lanes: half/half selection
        return same * p1 + (1.0 - same) * 0.5 * (p1 + p2)
    return jax.vmap(_bsdf_pdf_one)(lm, wo, wi)


def bsdf_sample(lm, wo, u_lobe, u1, u2, pools=None, ng_loc=None):
    """pbrt BSDF::Sample_f: uniformly pick a lobe, sample it; for non-delta
    lobes re-evaluate f and pdf over ALL lobes
    (reference: core/reflection.cpp:531-600). Returns (wi, f, pdf, is_delta).

    MixLane: pick a sub-material with probability ½ (pure lanes always take
    m1), sample its lobe, then combine f = amt·f1 + (1−amt)·f2 and
    pdf = ½(pdf1+pdf2); delta lobes keep the chosen lane's weight scaled by
    its blend factor."""
    if isinstance(lm, MixLane):
        same = lm.m1 == lm.m2
        chose1 = same | (u_lobe < 0.5)
        u_re = jnp.where(
            same, u_lobe, jnp.where(chose1, u_lobe * 2.0, u_lobe * 2.0 - 1.0)
        )
        wi1, f1s, p1s, d1 = bsdf_sample(lm.lm1, wo, u_re, u1, u2, pools,
                                        ng_loc)
        wi2, f2s, p2s, d2 = bsdf_sample(lm.lm2, wo, u_re, u1, u2, pools,
                                        ng_loc)
        wi = jnp.where(chose1[..., None], wi1, wi2)
        is_delta = jnp.where(chose1, d1, d2)
        # smooth case: full blended f/pdf at the chosen direction
        f_sm = lm.amt * bsdf_f(lm.lm1, wo, wi, pools, ng_loc) + (
            1.0 - lm.amt
        ) * bsdf_f(lm.lm2, wo, wi, pools, ng_loc)
        p_sm_1 = bsdf_pdf(lm.lm1, wo, wi)
        p_sm_2 = bsdf_pdf(lm.lm2, wo, wi)
        p_sm = jnp.where(same, p_sm_1, 0.5 * (p_sm_1 + p_sm_2))
        # delta case: chosen lane's delta weight × blend; selection prob ½
        w_sel = jnp.where(
            same[..., None], 1.0,
            jnp.where(chose1[..., None], lm.amt, 1.0 - lm.amt),
        )
        f_d = w_sel * jnp.where(chose1[..., None], f1s, f2s)
        p_d = jnp.where(same, 1.0, 0.5) * jnp.where(chose1, p1s, p2s)
        f = jnp.where(is_delta[..., None], f_d, f_sm)
        pdf = jnp.where(is_delta, p_d, p_sm)
        return wi, f, pdf, is_delta
    if ng_loc is None:
        return jax.vmap(_bsdf_sample_one, in_axes=(0, 0, 0, 0, 0, None))(
            lm, wo, u_lobe, u1, u2, pools
        )
    return jax.vmap(_bsdf_sample_one, in_axes=(0, 0, 0, 0, 0, None, 0))(
        lm, wo, u_lobe, u1, u2, pools, ng_loc
    )


def has_delta_only(lm):
    """True when every lobe is specular (glass/mirror) — NEE skips these."""
    if isinstance(lm, MixLane):
        return has_delta_only(lm.lm1) & has_delta_only(lm.lm2)
    delta_compact = [
        i for i, code in enumerate(lm.active_lobes) if code in _DELTA_LOBES
    ]
    all_delta = jnp.ones(lm.n_lobes.shape, bool)
    for slot in range(MAX_LOBES):
        active = slot < lm.n_lobes
        lobe = lm.lobe_type[..., slot]
        if delta_compact:
            is_d = jnp.isin(lobe, jnp.asarray(delta_compact))
        else:
            is_d = jnp.zeros(lobe.shape, bool)
        all_delta = all_delta & (is_d | ~active)
    return all_delta


# ---------------------------------------------------------------------------
# Host-side table construction from MaterialRecords
# ---------------------------------------------------------------------------

# Jensen et al. 2001 measured scattering media (σa, σ'_s RGB, mm⁻¹) —
# published values; the reference ships the same media table
# (core/volume.cpp GetVolumeScatteringProperties).
_NAMED_MEDIA = {
    "Marble": ((0.0021, 0.0041, 0.0071), (2.19, 2.62, 3.00)),
    "Skin1": ((0.032, 0.17, 0.48), (0.74, 0.88, 1.01)),
    "Skin2": ((0.013, 0.070, 0.145), (1.09, 1.59, 1.79)),
    "Cream": ((0.0002, 0.0028, 0.0163), (7.38, 5.47, 3.15)),
    "Ketchup": ((0.061, 0.97, 1.45), (0.18, 0.07, 0.03)),
    "Wholemilk": ((0.0011, 0.0024, 0.014), (2.55, 3.21, 3.77)),
    "Skimmilk": ((0.0014, 0.0025, 0.0142), (0.70, 1.22, 1.90)),
    "Spectralon": ((0.00001, 0.00001, 0.00001), (11.6, 20.4, 14.9)),
}


# Approximate copper eta/k (Johnson & Christy 1972 order of magnitude),
# the reference defaults metal to measured copper tables (metal.cpp:30-80).
_COPPER_LAM = [400.0, 450.0, 500.0, 550.0, 600.0, 650.0, 700.0]
_COPPER_N = [1.18, 1.15, 1.12, 0.79, 0.37, 0.23, 0.21]
_COPPER_K = [2.21, 2.40, 2.60, 2.78, 3.27, 3.64, 4.05]


def build_material_table(records, config, texture_index=None) -> MaterialTable:
    """records: list of MaterialRecord (scene/api.py). texture_index: dict
    name → (kind, id) for resolving texture refs (may be None round 1)."""
    from pbrt_tpu.core import spectrum as spec

    S = config.n_bins
    M = max(len(records), 1)
    z = lambda: np.zeros((M, S), np.float32)
    kind = np.zeros(M, np.int32)
    n_lobes = np.zeros(M, np.int32)
    lobe_type = np.full((M, MAX_LOBES), -1, np.int32)
    kd, ks, kr, kt = z(), z(), z(), z()
    sigma = np.zeros(M, np.float32)
    exp_u = np.ones(M, np.float32)
    exp_v = np.ones(M, np.float32)
    eta = np.full(M, 1.5, np.float32)
    eta_spec = np.ones((M, S), np.float32)
    k_spec = np.zeros((M, S), np.float32)
    kd_tex = np.full(M, -1, np.int32)
    ks_tex = np.full(M, -1, np.int32)
    sigma_tex = np.full(M, -1, np.int32)
    bump_tex = np.full(M, -1, np.int32)
    normal_tex = np.full(M, -1, np.int32)
    irreg_offset = np.zeros(M, np.int32)
    irreg_count = np.zeros(M, np.int32)
    merl_offset = np.full(M, -1, np.int32)
    ss_sigma_a = np.zeros((M, S), np.float32)
    ss_sigma_s = np.zeros((M, S), np.float32)
    ss_scale = np.ones(M, np.float32)
    mix_m1 = np.arange(M, dtype=np.int32)
    mix_m2 = np.arange(M, dtype=np.int32)
    mix_amt = np.ones((M, S), np.float32)
    irreg_pts_pool = [np.zeros((1, 3), np.float32)]
    irreg_spec_pool = [np.zeros((1, S), np.float32)]
    merl_pool = [np.zeros((1, 3), np.float32)]

    def tex_id(rec, pname, data_type="spectrum"):
        if texture_index is None:
            return -1
        tname = rec.params.find_texture(pname)
        if tname is None:
            return -1
        return texture_index.get((data_type, tname), -1)

    for i, rec in enumerate(records):
        p = rec.params
        mt = rec.mat_type
        lobes = []
        kd_tex[i] = tex_id(rec, "Kd")
        ks_tex[i] = tex_id(rec, "Ks")
        if texture_index is not None:
            bump_tex[i] = tex_id(rec, "bumpmap", "float")
            normal_tex[i] = tex_id(rec, "normalmap")
        if mt == "matte":
            kind[i] = MATTE
            kd[i] = p.find_one_spectrum("Kd", 0.5)
            sigma[i] = p.find_one_float("sigma", 0.0)
            lobes.append(L_ORENNAYAR if sigma[i] != 0.0 else L_LAMBERT)
        elif mt == "plastic":
            kind[i] = PLASTIC
            kd[i] = p.find_one_spectrum("Kd", 0.25)
            ks[i] = p.find_one_spectrum("Ks", 0.25)
            rough = p.find_one_float("roughness", 0.1)
            exp_u[i] = exp_v[i] = 1.0 / max(rough, 1e-4)
            eta[i] = 1.5
            if kd[i].any() or kd_tex[i] >= 0:
                lobes.append(L_LAMBERT)
            if ks[i].any() or ks_tex[i] >= 0:
                lobes.append(L_BLINN_DIEL)
        elif mt == "glass":
            kind[i] = GLASS
            kr[i] = p.find_one_spectrum("Kr", 1.0)
            kt[i] = p.find_one_spectrum("Kt", 1.0)
            eta[i] = p.find_one_float("index", 1.5)
            if kr[i].any():
                lobes.append(L_SPEC_REFL_DIEL)
            if kt[i].any():
                lobes.append(L_SPEC_TRANS)
        elif mt == "mirror":
            kind[i] = MIRROR
            kr[i] = p.find_one_spectrum("Kr", 0.9)
            if kr[i].any():
                lobes.append(L_SPEC_REFL_NOOP)
        elif mt == "metal":
            kind[i] = METAL
            ks[i] = 1.0
            eta_spec[i] = p.find_one_spectrum(
                "eta", spec.from_sampled(_COPPER_LAM, _COPPER_N, config)
            )
            k_spec[i] = p.find_one_spectrum(
                "k", spec.from_sampled(_COPPER_LAM, _COPPER_K, config)
            )
            rough = p.find_one_float("roughness", 0.01)
            exp_u[i] = exp_v[i] = 1.0 / max(rough, 1e-4)
            lobes.append(L_BLINN_COND)
        elif mt == "shinymetal":
            kind[i] = SHINYMETAL
            ks[i] = p.find_one_spectrum("Ks", 1.0)
            kr[i] = p.find_one_spectrum("Kr", 1.0)
            rough = p.find_one_float("roughness", 0.1)
            exp_u[i] = exp_v[i] = 1.0 / max(rough, 1e-4)
            # FresnelApproxEta: eta = (1+√R)/(1-√R) (reference: reflection.h:70)
            sr = np.sqrt(np.clip(ks[i], 0.0, 0.999))
            eta_spec[i] = (1.0 + sr) / (1.0 - sr)
            k_spec[i] = 0.0
            ksv = ks[i].copy()
            ks[i] = 1.0  # fresnel carries the color
            if ksv.any():
                lobes.append(L_BLINN_COND)
            if kr[i].any():
                lobes.append(L_SPEC_REFL_COND)
        elif mt == "substrate":
            kind[i] = SUBSTRATE
            kd[i] = p.find_one_spectrum("Kd", 0.5)
            ks[i] = p.find_one_spectrum("Ks", 0.5)
            ur = p.find_one_float("uroughness", 0.1)
            vr = p.find_one_float("vroughness", 0.1)
            exp_u[i] = 1.0 / max(ur, 1e-4)
            exp_v[i] = 1.0 / max(vr, 1e-4)
            lobes.append(L_FRESNEL_BLEND)
        elif mt == "uber":
            kind[i] = UBER
            kd[i] = p.find_one_spectrum("Kd", 0.25)
            ks[i] = p.find_one_spectrum("Ks", 0.25)
            kr[i] = p.find_one_spectrum("Kr", 0.0)
            kt_u = p.find_one_spectrum("Kt", 0.0)
            kt[i] = kt_u
            rough = p.find_one_float("roughness", 0.1)
            exp_u[i] = exp_v[i] = 1.0 / max(rough, 1e-4)
            eta[i] = p.find_one_float("index", 1.5)
            if kd[i].any() or kd_tex[i] >= 0:
                lobes.append(L_LAMBERT)
            if ks[i].any() or ks_tex[i] >= 0:
                lobes.append(L_BLINN_DIEL)
            if kr[i].any():
                lobes.append(L_SPEC_REFL_DIEL)
            if kt_u.any():
                lobes.append(L_SPEC_TRANS)
        elif mt == "translucent":
            kind[i] = TRANSLUCENT
            base_kd = p.find_one_spectrum("Kd", 0.25)
            base_ks = p.find_one_spectrum("Ks", 0.25)
            refl = p.find_one_spectrum("reflect", 0.5)
            trans = p.find_one_spectrum("transmit", 0.5)
            rough = p.find_one_float("roughness", 0.1)
            exp_u[i] = exp_v[i] = 1.0 / max(rough, 1e-4)
            kd[i] = base_kd * refl
            ks[i] = base_ks * refl
            kt[i] = base_kd * trans  # diffuse transmission
            kr[i] = base_ks * trans  # glossy transmission (see L_BLINN_DIEL_TRANS)
            if kd[i].any():
                lobes.append(L_LAMBERT)
            if ks[i].any():
                lobes.append(L_BLINN_DIEL)
            if kt[i].any():
                lobes.append(L_LAMBERT_TRANS)
            if kr[i].any():
                lobes.append(L_BLINN_DIEL_TRANS)
        elif mt == "anisoward":
            kind[i] = ANISOWARD
            kd[i] = p.find_one_spectrum("Kd", 0.25)
            ks[i] = p.find_one_spectrum("Ks", 0.25)
            exp_u[i] = p.find_one_float("alphaU", 0.1)
            exp_v[i] = p.find_one_float("alphaV", 0.1)
            lobes.append(L_LAMBERT)
            lobes.append(L_WARD)
        elif mt in ("subsurface", "kdsubsurface"):
            # (reference: materials/subsurface.cpp, kdsubsurface.cpp) —
            # Jensen-style named media or explicit sigma_a/sigma_prime_s.
            kind[i] = SUBSURFACE if mt == "subsurface" else KDSUBSURFACE
            eta[i] = p.find_one_float("index", 1.3)
            ss_scale[i] = p.find_one_float("scale", 1.0)
            named = p.find_one_string("name", "")
            sa_def, sps_def = _NAMED_MEDIA.get(named, ((0.0011, 0.0024, 0.014),
                                                       (2.55, 3.21, 3.77)))
            if mt == "kdsubsurface":
                # kd + meanfreepath parameterization (kdsubsurface.cpp):
                # approximate inversion to sigma_a / sigma_prime_s
                kd_v = p.find_one_spectrum("Kd", 0.5)
                mfp = p.find_one_float("meanfreepath", 1.0)
                sigt = 1.0 / max(mfp, 1e-6)
                ss_sigma_s[i] = np.clip(kd_v, 0.0, 0.999) * sigt
                ss_sigma_a[i] = sigt - ss_sigma_s[i]
            else:
                ss_sigma_a[i] = p.find_one_spectrum("sigma_a", np.asarray(sa_def))
                ss_sigma_s[i] = p.find_one_spectrum(
                    "sigma_prime_s", np.asarray(sps_def)
                )
            # "scale" multiplies the σ coefficients (subsurface.cpp:64-65
            # `BSSRDF(scale*sigma_a, scale*sigma_prime_s, e)`), it is NOT
            # an Li gain
            ss_sigma_a[i] *= ss_scale[i]
            ss_sigma_s[i] *= ss_scale[i]
            kr[i] = p.find_one_spectrum("Kr", 1.0)
            if kr[i].any():
                lobes.append(L_SPEC_REFL_DIEL)
        elif mt == "measured":
            kind[i] = MEASURED
            fn = p.find_one_filename("filename", "")
            loaded = False
            if fn:
                from pbrt_tpu.bsdf import measured as meas

                try:
                    if fn.lower().endswith(".brdf"):
                        pts, spectra = meas.load_irreg_brdf(fn, config)
                        irreg_offset[i] = sum(len(x) for x in irreg_pts_pool)
                        irreg_count[i] = len(pts)
                        irreg_pts_pool.append(pts)
                        irreg_spec_pool.append(spectra)
                        lobes.append(L_IRREG_MEASURED)
                        loaded = True
                    else:
                        rgb = meas.load_merl(fn)
                        merl_offset[i] = sum(len(x) for x in merl_pool)
                        merl_pool.append(rgb)
                        lobes.append(L_MERL_MEASURED)
                        loaded = True
                except Exception as e:
                    import warnings

                    warnings.warn(f"measured BRDF {fn!r}: {e}; matte fallback")
            if not loaded:
                kd[i] = 0.5
                lobes.append(L_LAMBERT)
        elif mt == "mix":
            # (reference: materials/mix.cpp) — sub-rows resolved by the
            # builder into rec.mix_rows; the row's own lobe list is unused
            # (gather_lane dispatches to the sub-rows)
            kind[i] = MIXMAT
            mix_m1[i], mix_m2[i] = getattr(rec, "mix_rows", (i, i))
            mix_amt[i] = p.find_one_spectrum("amount", 0.5)
            lobes.append(L_LAMBERT)
        else:
            # unknown / not-yet-supported:
            # degrade to matte 0.5 like pbrt warns+falls back (api.cpp:373)
            kind[i] = MATTE
            kd[i] = p.find_one_spectrum("Kd", 0.5)
            lobes.append(L_LAMBERT)
        if not lobes:
            lobes.append(L_LAMBERT)
        n_lobes[i] = len(lobes)
        lobe_type[i, : len(lobes)] = lobes

    # compact the lobe code space to the set this scene uses (static)
    active = tuple(
        sorted({int(c) for row in lobe_type for c in row if c >= 0})
    ) or (L_LAMBERT,)
    remap = {code: k for k, code in enumerate(active)}
    for i in range(M):
        for s_ in range(MAX_LOBES):
            if lobe_type[i, s_] >= 0:
                lobe_type[i, s_] = remap[int(lobe_type[i, s_])]

    f = jnp.asarray
    return pack_materials(MaterialTable(
        kind=f(kind), n_lobes=f(n_lobes), lobe_type=f(lobe_type),
        kd=f(kd), ks=f(ks), kr=f(kr), kt=f(kt),
        sigma=f(sigma), exp_u=f(exp_u), exp_v=f(exp_v), eta=f(eta),
        eta_spec=f(eta_spec), k_spec=f(k_spec),
        kd_tex=f(kd_tex), ks_tex=f(ks_tex), sigma_tex=f(sigma_tex),
        bump_tex=f(bump_tex), normal_tex=f(normal_tex),
        irreg_offset=f(irreg_offset), irreg_count=f(irreg_count),
        merl_offset=f(merl_offset),
        irreg_points=jnp.asarray(np.concatenate(irreg_pts_pool)),
        irreg_spectra=jnp.asarray(np.concatenate(irreg_spec_pool)),
        merl_rgb=jnp.asarray(np.concatenate(merl_pool)),
        ss_sigma_a=f(ss_sigma_a), ss_sigma_s=f(ss_sigma_s), ss_scale=f(ss_scale),
        mix_m1=f(mix_m1), mix_m2=f(mix_m2), mix_amt=f(mix_amt),
        active_lobes=active,
        has_mix=bool((kind == MIXMAT).any()),
        has_bump=bool((bump_tex >= 0).any()),
        max_lobes=int(max(n_lobes.max(), 1)) if M else 1,
    ))
