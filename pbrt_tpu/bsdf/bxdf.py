"""BxDF lobes — the reflection library.

Reference: src/core/reflection.{h,cpp} (533+648 LoC): Lambertian (:345),
OrenNayar (:359), Torrance–Sparrow Microfacet (:389) with Blinn (:414) and
Anisotropic/Ashikhmin–Shirley (:430) distributions, FresnelBlend (:453),
Specular{Reflection,Transmission} (:298, :320), Fresnel{Dielectric,
Conductor,NoOp} (:261-296); fork's Ward BRDF (materials/AnisoWardBrdf.cpp).

TPU-native design: no virtual dispatch — each lobe is a pure function over
batched local-frame directions ((..., 3), shading normal = +z) and batched
spectral parameters (..., n_bins). The material layer (materials/table.py)
mixes lobes with per-material weights; everything fuses into the shading
kernel. Delta (specular) lobes follow the pbrt convention: handled only in
sampling, with pdf ≡ 1 and f = F/|cosθ| so weight = f·|cosθ|/pdf.
"""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling as smp

INV_PI = 1.0 / jnp.pi


# ---------------------------------------------------------------------------
# Local-frame helpers (reference: reflection.h:55-93)
# ---------------------------------------------------------------------------


def cos_theta(w):
    return w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin_theta2(w):
    return jnp.maximum(0.0, 1.0 - w[..., 2] * w[..., 2])


def same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0.0


def make_shading_frame(ns, dpdu):
    """Orthonormal (ss, ts, ns) with ss seeded from dpdu
    (reference: BSDF constructor, reflection.h:149-153)."""
    ss = geom.normalize(dpdu - geom.dot(dpdu, ns)[..., None] * ns)
    # fall back to an arbitrary frame when dpdu ∥ ns
    degenerate = geom.length_sq(dpdu - geom.dot(dpdu, ns)[..., None] * ns) < 1e-12
    alt_s, _ = geom.coordinate_system(ns)
    ss = jnp.where(degenerate[..., None], alt_s, ss)
    ts = jnp.cross(ns, ss)
    return ss, ts


def world_to_local(w, ss, ts, ns):
    return jnp.stack(
        [geom.dot(w, ss), geom.dot(w, ts), geom.dot(w, ns)], axis=-1
    )


def local_to_world(w, ss, ts, ns):
    return w[..., 0:1] * ss + w[..., 1:2] * ts + w[..., 2:3] * ns


# ---------------------------------------------------------------------------
# Fresnel (reference: reflection.cpp FrDiel/FrCond, reflection.h:261-296)
# ---------------------------------------------------------------------------


def fresnel_dielectric(cos_i, eta_i, eta_t):
    """Unpolarized dielectric Fresnel; cos_i may be signed (negative =
    exiting). Scalar per lane. Returns reflectance in [0, 1]."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(cos_i)
    sin_t2 = (ei / et) ** 2 * jnp.maximum(0.0, 1.0 - ci * ci)
    tir = sin_t2 >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t2))
    r_par = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-12)
    r_per = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-12)
    f = 0.5 * (r_par * r_par + r_per * r_per)
    return jnp.where(tir, 1.0, f)


def fresnel_conductor(cos_i, eta, k):
    """Conductor Fresnel (reference: reflection.cpp FrCond). eta, k spectral
    (..., n_bins); cos_i (...,). Returns (..., n_bins)."""
    ci = jnp.abs(cos_i)[..., None]
    tmp = (eta * eta + k * k) * ci * ci
    r_par2 = (tmp - 2.0 * eta * ci + 1.0) / jnp.maximum(tmp + 2.0 * eta * ci + 1.0, 1e-12)
    tmp_f = eta * eta + k * k
    r_perp2 = (tmp_f - 2.0 * eta * ci + ci * ci) / jnp.maximum(
        tmp_f + 2.0 * eta * ci + ci * ci, 1e-12
    )
    return 0.5 * (r_par2 + r_perp2)


def schlick_fresnel(rs, cos_i):
    """(reference: FresnelBlend::SchlickFresnel, reflection.h:462-466)."""
    c = jnp.clip(1.0 - cos_i, 0.0, 1.0)[..., None]
    return rs + c**5 * (1.0 - rs)


# ---------------------------------------------------------------------------
# Lambertian + Oren–Nayar (reference: reflection.h:345-376)
# ---------------------------------------------------------------------------


def lambertian_f(kd, wo, wi):
    shape = jnp.broadcast_shapes(wo.shape[:-1], wi.shape[:-1])
    return jnp.broadcast_to(kd * INV_PI, shape + (kd.shape[-1],))


def oren_nayar_f(kd, sigma_deg, wo, wi):
    """(reference: reflection.cpp OrenNayar::f)."""
    sigma = jnp.deg2rad(sigma_deg)
    s2 = sigma * sigma
    A = 1.0 - s2 / (2.0 * (s2 + 0.33))
    B = 0.45 * s2 / (s2 + 0.09)
    sin_ti = jnp.sqrt(sin_theta2(wi))
    sin_to = jnp.sqrt(sin_theta2(wo))
    # max(0, cos(φi − φo)) = cosφi·cosφo + sinφi·sinφo
    safe_i = jnp.maximum(sin_ti, 1e-6)
    safe_o = jnp.maximum(sin_to, 1e-6)
    cos_phi = (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1]) / (safe_i * safe_o)
    max_cos = jnp.where(
        (sin_ti > 1e-4) & (sin_to > 1e-4), jnp.maximum(0.0, cos_phi), 0.0
    )
    aci = abs_cos_theta(wi)
    aco = abs_cos_theta(wo)
    sin_a = jnp.where(aci > aco, sin_to, sin_ti)
    tan_b = jnp.where(
        aci > aco, sin_ti / jnp.maximum(aci, 1e-6), sin_to / jnp.maximum(aco, 1e-6)
    )
    scale = A + B * max_cos * sin_a * tan_b
    return kd * INV_PI * scale[..., None]


def cosine_sample(u1, u2, wo):
    """Cosine-hemisphere sample flipped to wo's hemisphere (pbrt
    BxDF::Sample_f default, reflection.cpp:39-49). Returns (wi, pdf)."""
    wi = smp.cosine_sample_hemisphere(u1, u2)
    wi = wi.at[..., 2].multiply(jnp.sign(wo[..., 2]) + (wo[..., 2] == 0.0))
    pdf = jnp.where(
        same_hemisphere(wo, wi), abs_cos_theta(wi) * INV_PI, 0.0
    )
    return wi, pdf


def cosine_pdf(wo, wi):
    return jnp.where(same_hemisphere(wo, wi), abs_cos_theta(wi) * INV_PI, 0.0)


# ---------------------------------------------------------------------------
# Blinn microfacet distribution (reference: reflection.h:414-428, .cpp)
# ---------------------------------------------------------------------------


def blinn_d(exponent, wh):
    return (exponent + 2.0) * (0.5 * INV_PI) * jnp.power(
        jnp.maximum(abs_cos_theta(wh), 1e-8), exponent
    )


def _microfacet_g(wo, wi, wh):
    ndoth = abs_cos_theta(wh)
    ndoto = abs_cos_theta(wo)
    ndoti = abs_cos_theta(wi)
    wodoth = jnp.maximum(geom.absdot(wo, wh), 1e-8)
    return jnp.minimum(
        1.0, jnp.minimum(2.0 * ndoth * ndoto / wodoth, 2.0 * ndoth * ndoti / wodoth)
    )


def microfacet_f(ks, fresnel_val, exponent, wo, wi):
    """Torrance–Sparrow (reference: Microfacet::f, reflection.cpp:318-333).
    fresnel_val: (..., n_bins) already evaluated at cosθh'."""
    wh = geom.normalize(wo + wi)
    coso = abs_cos_theta(wo)
    cosi = abs_cos_theta(wi)
    d = blinn_d(exponent, wh)
    g = _microfacet_g(wo, wi, wh)
    denom = jnp.maximum(4.0 * coso * cosi, 1e-8)
    f = ks * fresnel_val * (d * g / denom)[..., None]
    # hemisphere-agnostic like the reference (Microfacet::f uses
    # AbsCosTheta with no SameHemisphere check; the geometric-normal
    # reflection/transmission classification happens at the BSDF level,
    # reflection.cpp BSDF::f:517-529)
    ok = (coso > 1e-8) & (cosi > 1e-8)
    return jnp.where(ok[..., None], f, 0.0)


def blinn_sample_wh(exponent, wo, u1, u2):
    """Sample the half vector ∝ D (reference: Blinn::Sample_f,
    reflection.cpp:617-640). Returns (wi, pdf)."""
    ct = jnp.power(u1, 1.0 / (exponent + 1.0))
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    phi = 2.0 * jnp.pi * u2
    wh = geom.spherical_direction(st, ct, phi)
    wh = jnp.where(same_hemisphere(wo, wh)[..., None], wh, -wh)
    wi = -wo + 2.0 * geom.dot(wo, wh)[..., None] * wh
    wodoth = geom.dot(wo, wh)
    pdf = (exponent + 1.0) * jnp.power(jnp.maximum(abs_cos_theta(wh), 1e-8), exponent) / (
        2.0 * jnp.pi * 4.0 * jnp.maximum(wodoth, 1e-8)
    )
    pdf = jnp.where(wodoth > 1e-8, pdf, 0.0)
    return wi, pdf


def blinn_pdf(exponent, wo, wi):
    wh = geom.normalize(wo + wi)
    wodoth = geom.dot(wo, wh)
    pdf = (exponent + 1.0) * jnp.power(jnp.maximum(abs_cos_theta(wh), 1e-8), exponent) / (
        2.0 * jnp.pi * 4.0 * jnp.maximum(wodoth, 1e-8)
    )
    return jnp.where(same_hemisphere(wo, wi) & (wodoth > 1e-8), pdf, 0.0)


# ---------------------------------------------------------------------------
# Anisotropic (Ashikhmin–Shirley) distribution (reference: reflection.h:430)
# ---------------------------------------------------------------------------


def aniso_d(ex, ey, wh):
    costh = abs_cos_theta(wh)
    d = 1.0 - costh * costh
    safe_d = jnp.maximum(d, 1e-8)
    e = (ex * wh[..., 0] * wh[..., 0] + ey * wh[..., 1] * wh[..., 1]) / safe_d
    return jnp.sqrt((ex + 2.0) * (ey + 2.0)) * (0.5 * INV_PI) * jnp.power(
        jnp.maximum(costh, 1e-8), e
    )


def aniso_sample_wh(ex, ey, wo, u1, u2):
    """(reference: Anisotropic::Sample_f, reflection.cpp:645-700).
    First-quadrant sampling remapped to all four quadrants."""
    # map u1 into quadrant + local coordinate
    quad = jnp.floor(u1 * 4.0).astype(jnp.int32)
    u1r = u1 * 4.0 - quad
    phi0 = jnp.arctan(jnp.sqrt((ex + 1.0) / (ey + 1.0)) * jnp.tan(0.5 * jnp.pi * u1r))
    # reflect into quadrant
    phi = jnp.where(
        quad == 0,
        phi0,
        jnp.where(
            quad == 1,
            jnp.pi - phi0,
            jnp.where(quad == 2, jnp.pi + phi0, 2.0 * jnp.pi - phi0),
        ),
    )
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)
    ct = jnp.power(
        u2, 1.0 / (ex * cphi * cphi + ey * sphi * sphi + 1.0)
    )
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    wh = geom.spherical_direction(st, ct, phi)
    wh = jnp.where(same_hemisphere(wo, wh)[..., None], wh, -wh)
    wi = -wo + 2.0 * geom.dot(wo, wh)[..., None] * wh
    pdf = aniso_pdf(ex, ey, wo, wi)
    return wi, pdf


def aniso_pdf(ex, ey, wo, wi):
    wh = geom.normalize(wo + wi)
    wodoth = geom.dot(wo, wh)
    d = aniso_d(ex, ey, wh)
    pdf = d / jnp.maximum(4.0 * wodoth, 1e-8)
    return jnp.where(same_hemisphere(wo, wi) & (wodoth > 1e-8), pdf, 0.0)


# ---------------------------------------------------------------------------
# FresnelBlend (substrate) (reference: reflection.h:453-470, .cpp:395-430)
# ---------------------------------------------------------------------------


def fresnel_blend_f(rd, rs, ex, ey, wo, wi):
    aci = abs_cos_theta(wi)
    aco = abs_cos_theta(wo)
    diffuse = (
        (28.0 / (23.0 * jnp.pi))
        * rd
        * (1.0 - rs)
        * ((1.0 - (1.0 - 0.5 * aci) ** 5) * (1.0 - (1.0 - 0.5 * aco) ** 5))[..., None]
    )
    wh = wo + wi
    wh_len = geom.length(wh)
    wh_n = wh / jnp.maximum(wh_len, 1e-12)[..., None]
    d = aniso_d(ex, ey, wh_n)
    widotwh = geom.dot(wi, wh_n)
    spec = (
        d[..., None]
        / jnp.maximum(4.0 * jnp.abs(widotwh) * jnp.maximum(aci, aco), 1e-8)[..., None]
        * schlick_fresnel(rs, widotwh)
    )
    # no SameHemisphere gate — matches FresnelBlend::f (reflection.cpp:224
    # -236, all AbsCosTheta); hemisphere classification is the BSDF
    # level's geometric-normal job
    ok = wh_len > 1e-9
    return jnp.where(ok[..., None], diffuse + spec, 0.0)


# ---------------------------------------------------------------------------
# Ward anisotropic BRDF (fork: materials/AnisoWardBrdf.cpp)
# ---------------------------------------------------------------------------


def ward_f(ks, ax, ay, wo, wi):
    ci = cos_theta(wi)
    co = cos_theta(wo)
    wh = wo + wi
    hx, hy, hz = wh[..., 0], wh[..., 1], wh[..., 2]
    hz2 = jnp.maximum(hz * hz, 1e-10)
    expo = -((hx / ax) ** 2 + (hy / ay) ** 2) / hz2
    denom = 4.0 * jnp.pi * ax * ay * jnp.sqrt(jnp.maximum(ci * co, 1e-8))
    f = ks * (jnp.exp(expo) / denom)[..., None]
    ok = ci * co > 1e-8
    return jnp.where(ok[..., None], f, 0.0)


def ward_sample(ax, ay, wo, u1, u2):
    """Ward half-vector sampling (Walter 2005 notes)."""
    phi = jnp.arctan2(ay * jnp.sin(2.0 * jnp.pi * u2), ax * jnp.cos(2.0 * jnp.pi * u2))
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)
    denom = (cphi / ax) ** 2 + (sphi / ay) ** 2
    tan2 = -jnp.log(jnp.maximum(u1, 1e-10)) / jnp.maximum(denom, 1e-10)
    ct = 1.0 / jnp.sqrt(1.0 + tan2)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    wh = geom.spherical_direction(st, ct, phi)
    wh = jnp.where(same_hemisphere(wo, wh)[..., None], wh, -wh)
    wi = -wo + 2.0 * geom.dot(wo, wh)[..., None] * wh
    return wi, ward_pdf(ax, ay, wo, wi)


def ward_pdf(ax, ay, wo, wi):
    wh = geom.normalize(wo + wi)
    hx, hy, hz = wh[..., 0], wh[..., 1], wh[..., 2]
    hz2 = jnp.maximum(hz * hz, 1e-10)
    expo = -((hx / ax) ** 2 + (hy / ay) ** 2) / hz2
    ph = jnp.exp(expo) / (
        jnp.pi * ax * ay * hz2 * jnp.maximum(hz, 1e-8)
    )
    wodoth = geom.dot(wo, wh)
    pdf = ph / jnp.maximum(4.0 * wodoth, 1e-8)
    return jnp.where(same_hemisphere(wo, wi) & (wodoth > 1e-8), pdf, 0.0)


# ---------------------------------------------------------------------------
# Specular (delta) lobes (reference: reflection.h:298-343)
# ---------------------------------------------------------------------------


def specular_reflect_dir(wo):
    """Local-frame mirror direction (-wo.x, -wo.y, wo.z)."""
    return jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)


def specular_transmit_dir(wo, eta_i, eta_t):
    """Local-frame refraction. Returns (wi, valid) — valid False on TIR
    (reference: SpecularTransmission::Sample_f, reflection.cpp:464-500)."""
    entering = cos_theta(wo) > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    sini2 = sin_theta2(wo)
    eta = ei / et
    sint2 = eta * eta * sini2
    valid = sint2 < 1.0
    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sint2))
    cost = jnp.where(entering, -cost, cost)
    wi = jnp.stack(
        [eta * -wo[..., 0], eta * -wo[..., 1], cost], axis=-1
    )
    return wi, valid, eta
