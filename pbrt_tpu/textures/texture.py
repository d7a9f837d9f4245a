"""Texture system: SoA texture table + batched evaluation.

Reference: src/textures/ (constant, scale, mix, bilerp, imagemap, uv,
checkerboard, dots, fbm, wrinkled, marble, windy) over the mapping classes
of src/core/texture.{h,cpp} (UVMapping2D :49, SphericalMapping2D :60,
CylindricalMapping, PlanarMapping2D :94, TextureMapping3D :108) and Perlin
``Noise``/``FBm``/``Turbulence`` (texture.h:138+, texture.cpp).

TPU-native design: every texture of a scene is a row in one ``TextureTable``
pytree. Image texels live in one flattened RGB pool (+ one float pool),
per-texture (offset, w, h); evaluation is a fully batched gather + bilinear
+ RGB→spectrum conversion. Nested texture references (e.g. scale of an
imagemap) are evaluated by a fixed-depth substitution loop. Perlin noise
uses a seeded random permutation (same statistics as pbrt's hardcoded
table; patterns differ — documented divergence).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.utils import pytree_dataclass, static_field

# texture kinds
(T_CONSTANT, T_SCALE, T_MIX, T_BILERP, T_IMAGEMAP, T_UV, T_CHECKER2D,
 T_CHECKER3D, T_DOTS, T_FBM, T_WRINKLED, T_MARBLE, T_WINDY) = range(13)

# 2D mappings
(M_UV, M_SPHERICAL, M_CYLINDRICAL, M_PLANAR) = range(4)

MAX_NEST_DEPTH = 4

#: mip pyramid depth cap (covers 8192² level-0 images)
MAX_MIP_LEVELS = 14
#: EWA probes along the footprint's major axis (reference: MIPMap::EWA,
#: mipmap.h:288-372 — a data-dependent scan over the ellipse's texel bbox
#: with Gaussian weightLut). The TPU design needs a static tap count, so
#: the ellipse integral is evaluated Feline-style (McCormack et al. 2000):
#: EWA_TAPS isotropic trilinear probes spaced along the major axis, each
#: weighted by the same truncated Gaussian e^{-2r²}-e^{-2} the reference's
#: weightLut tabulates (mipmap.h:186-192), with the minor axis setting the
#: mip level and the reference's eccentricity clamp applied first
#: (mipmap.h:296-302). Same filter family, fixed VPU cost per lane.
EWA_TAPS = 8
#: reference default (texture "float maxanisotropy" 8)
MAX_ANISOTROPY = 8.0
#: reference Gaussian falloff alpha (mipmap.h:189)
EWA_ALPHA = 2.0


@pytree_dataclass
class TextureTable:
    kind: jnp.ndarray  # (K,)
    mapping: jnp.ndarray  # (K,)
    uv_xform: jnp.ndarray  # (K, 4): su, sv, du, dv
    world_to_tex: jnp.ndarray  # (K, 4, 4) for 3D/spherical mappings
    c1: jnp.ndarray  # (K, S) tex1 constant (value for constants)
    c2: jnp.ndarray  # (K, S) tex2 constant
    f1: jnp.ndarray  # (K,) float param (amount / octaves / variation)
    f2: jnp.ndarray  # (K,) float param (omega / aafalloff)
    ref1: jnp.ndarray  # (K,) nested texture id (-1 = use c1)
    ref2: jnp.ndarray  # (K,)
    img_offset: jnp.ndarray  # (K,) offset into pool rows, -1 = none
    img_w: jnp.ndarray  # (K,) level-0 (pow2-resampled) width
    img_h: jnp.ndarray  # (K,)
    img_level_off: jnp.ndarray  # (K, MAX_MIP_LEVELS) per-level pool offsets
    img_n_levels: jnp.ndarray  # (K,)
    pool_rgb: jnp.ndarray  # (P, 3) linear RGB texels (all mip levels)
    # Perlin permutation (seeded)
    perm: jnp.ndarray  # (512,)

    @property
    def count(self) -> int:
        return self.kind.shape[0]


# ---------------------------------------------------------------------------
# Perlin noise (reference: texture.cpp Noise/FBm/Turbulence)
# ---------------------------------------------------------------------------


def _grad(h, x, y, z):
    h = h & 15
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin_noise(perm, p):
    """Classic 3D Perlin noise, batched over (..., 3)."""
    pi = jnp.floor(p).astype(jnp.int32) & 255
    pf = p - jnp.floor(p)
    u = _fade(pf[..., 0])
    v = _fade(pf[..., 1])
    w = _fade(pf[..., 2])
    ix, iy, iz = pi[..., 0], pi[..., 1], pi[..., 2]
    fx, fy, fz = pf[..., 0], pf[..., 1], pf[..., 2]

    def P(i):
        return perm[i & 511]

    A = P(ix) + iy
    AA = P(A) + iz
    AB = P(A + 1) + iz
    B = P(ix + 1) + iy
    BA = P(B) + iz
    BB = P(B + 1) + iz
    lerp = lambda t, a, b: a + t * (b - a)
    res = lerp(
        w,
        lerp(
            v,
            lerp(u, _grad(P(AA), fx, fy, fz), _grad(P(BA), fx - 1, fy, fz)),
            lerp(u, _grad(P(AB), fx, fy - 1, fz), _grad(P(BB), fx - 1, fy - 1, fz)),
        ),
        lerp(
            v,
            lerp(
                u,
                _grad(P(AA + 1), fx, fy, fz - 1),
                _grad(P(BA + 1), fx - 1, fy, fz - 1),
            ),
            lerp(
                u,
                _grad(P(AB + 1), fx, fy - 1, fz - 1),
                _grad(P(BB + 1), fx - 1, fy - 1, fz - 1),
            ),
        ),
    )
    return res


def fbm(perm, p, octaves: int = 6, omega: float = 0.5):
    """(reference: texture.cpp FBm) — fixed max octaves, smooth via omega."""
    total = jnp.zeros(p.shape[:-1], p.dtype)
    lam = 1.0
    o = 1.0
    for _ in range(octaves):
        total = total + o * perlin_noise(perm, p * lam)
        lam *= 1.99
        o *= omega
    return total


def turbulence(perm, p, octaves: int = 6, omega: float = 0.5):
    total = jnp.zeros(p.shape[:-1], p.dtype)
    lam = 1.0
    o = 1.0
    for _ in range(octaves):
        total = total + o * jnp.abs(perlin_noise(perm, p * lam))
        lam *= 1.99
        o *= omega
    return total


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def _map_uv(tt: TextureTable, tid, si_uv, si_p):
    """2D mapping → (u, v) per lane (reference: texture.cpp mappings)."""
    xf = tt.uv_xform[tid]  # (R, 4)
    m = tt.mapping[tid]
    u_uv = si_uv[..., 0] * xf[..., 0] + xf[..., 2]
    v_uv = si_uv[..., 1] * xf[..., 1] + xf[..., 3]
    # spherical mapping from world position
    w2t = tt.world_to_tex[tid]
    p_t = jnp.einsum("rij,rj->ri", w2t[:, :3, :3], si_p) + w2t[:, :3, 3]
    r = jnp.maximum(jnp.linalg.norm(p_t, axis=-1), 1e-9)
    theta = jnp.arccos(jnp.clip(p_t[..., 2] / r, -1, 1))
    phi = jnp.arctan2(p_t[..., 1], p_t[..., 0])
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    u_sph = theta / jnp.pi * xf[..., 0] + xf[..., 2]
    v_sph = phi / (2 * jnp.pi) * xf[..., 1] + xf[..., 3]
    u_pl = p_t[..., 0] * xf[..., 0] + xf[..., 2]
    v_pl = p_t[..., 1] * xf[..., 1] + xf[..., 3]
    u = jnp.where(m == M_UV, u_uv, jnp.where(m == M_SPHERICAL, u_sph, u_pl))
    v = jnp.where(m == M_UV, v_uv, jnp.where(m == M_SPHERICAL, v_sph, v_pl))
    return u, v


def _bilinear_at_level(tt: TextureTable, tid, u, v, lvl):
    """Bilinear fetch at integer mip level ``lvl`` (per lane).

    Level dims are ``base >> lvl`` (pow-2 level 0 guaranteed by the
    builder's resample); offsets come from ``img_level_off``."""
    w = jnp.maximum(tt.img_w[tid] >> lvl, 1)
    h = jnp.maximum(tt.img_h[tid] >> lvl, 1)
    off = jnp.maximum(tt.img_level_off[tid, lvl], 0)
    # repeat wrap (pbrt TEXTURE_REPEAT default)
    uu = (u % 1.0) * w.astype(u.dtype) - 0.5
    vv = (v % 1.0) * h.astype(v.dtype) - 0.5
    x0 = jnp.floor(uu).astype(jnp.int32)
    y0 = jnp.floor(vv).astype(jnp.int32)
    du = uu - x0
    dv = vv - y0

    def fetch(xi, yi):
        xi = xi % w
        yi = yi % h
        return tt.pool_rgb[off + yi * w + xi]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    du = du[..., None]
    dv = dv[..., None]
    return (
        (1 - du) * (1 - dv) * c00
        + du * (1 - dv) * c10
        + (1 - du) * dv * c01
        + du * dv * c11
    )


def _trilinear(tt: TextureTable, tid, u, v, level_f):
    """Isotropic trilinear mip filtering (reference: mipmap.h:84 triangle
    path / Lookup(width)): lerp of bilinear fetches at the two bracketing
    levels."""
    n_lev = jnp.maximum(tt.img_n_levels[tid], 1)
    lf = jnp.clip(level_f, 0.0, (n_lev - 1).astype(level_f.dtype))
    l0 = jnp.floor(lf).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n_lev - 1)
    frac = (lf - l0.astype(lf.dtype))[..., None]
    c0 = _bilinear_at_level(tt, tid, u, v, l0)
    c1 = _bilinear_at_level(tt, tid, u, v, l1)
    return (1.0 - frac) * c0 + frac * c1


def _image_lookup(tt: TextureTable, tid, u, v, uv_sigma=None, uv_major=None):
    """Filtered image fetch from the flat pool → (R, 3) linear RGB.

    ``uv_sigma``: (R,) isotropic footprint radius in uv units (minor axis);
    ``uv_major``: (R, 2) anisotropic major-axis vector in uv units. With no
    footprint info this is a level-0 bilinear lookup (magnification path).

    Anisotropy is true EWA at static cost (see EWA_TAPS note): reference
    eccentricity clamp (mipmap.h:296-302), minor-axis mip level
    (mipmap.h:312 ``lod = nLevels-1+Log2(minorLength)``), Gaussian
    ``e^{-αr²}-e^{-α}`` probe weights along the major axis
    (mipmap.h:186-192 weightLut), Σw normalization (mipmap.h:371)."""
    res = jnp.maximum(
        jnp.maximum(tt.img_w[tid], tt.img_h[tid]), 1
    ).astype(jnp.float32)
    if uv_sigma is None:
        return _bilinear_at_level(tt, tid, u, v, jnp.zeros_like(tid))
    if uv_major is None:
        width = jnp.maximum(uv_sigma, 1e-8)
        level_f = jnp.maximum(jnp.log2(width * res), 0.0)
        return _trilinear(tt, tid, u, v, level_f)
    # --- EWA (Feline probes) ---
    major_len = jnp.maximum(
        jnp.sqrt(jnp.sum(uv_major * uv_major, axis=-1)), 1e-12
    )
    minor_len = jnp.maximum(uv_sigma, 1e-12)
    # reference clamp: widen the minor axis so ecc <= maxAnisotropy
    minor_len = jnp.maximum(minor_len, major_len / MAX_ANISOTROPY)
    ecc = jnp.maximum(major_len / minor_len, 1.0)
    level_f = jnp.maximum(jnp.log2(minor_len * res), 0.0)
    # probes span the segment of length 2*(major-minor) centred on (u,v)
    # so the extreme probes' minor-radius footprints just reach the
    # ellipse ends; positions in units of the major-axis direction
    half = (ecc - 1.0) / ecc  # (major-minor)/major, in [0, 1)
    du = uv_major[..., 0]
    dv = uv_major[..., 1]
    acc = 0.0
    wsum = 0.0
    for k in range(EWA_TAPS):
        f = ((k + 0.5) / EWA_TAPS - 0.5) * 2.0 * half  # in [-half, half]
        # squared ellipse radius of this probe centre (r=1 at ellipse edge)
        r2 = f * f
        w = jnp.maximum(jnp.exp(-EWA_ALPHA * r2) - np.exp(-EWA_ALPHA), 0.0)
        acc = acc + w[..., None] * _trilinear(
            tt, tid, u + f * du, v + f * dv, level_f
        )
        wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-12)[..., None]


def _eval_base(tt: TextureTable, tid, si_uv, si_p, prev, uv_sigma=None,
               uv_major=None):
    """One substitution pass: evaluate every lane's texture, using ``prev``
    (R, S) as the value of nested refs. Returns (R, S)."""
    S = tt.c1.shape[-1]
    kind = tt.kind[tid]
    c1 = tt.c1[tid]
    c2 = tt.c2[tid]
    r1 = tt.ref1[tid]
    r2 = tt.ref2[tid]
    v1 = jnp.where((r1 >= 0)[..., None], prev[0], c1)
    v2 = jnp.where((r2 >= 0)[..., None], prev[1], c2)
    u, v = _map_uv(tt, tid, si_uv, si_p)
    w2t = tt.world_to_tex[tid]
    p_t = jnp.einsum("rij,rj->ri", w2t[:, :3, :3], si_p) + w2t[:, :3, 3]

    # footprint follows the uv mapping's scale (uscale/vscale)
    xf = tt.uv_xform[tid]
    if uv_sigma is not None:
        uv_sigma = uv_sigma * jnp.maximum(jnp.abs(xf[..., 0]),
                                          jnp.abs(xf[..., 1]))
    if uv_major is not None:
        uv_major = uv_major * xf[..., 0:2]
    img = _image_lookup(tt, tid, u, v, uv_sigma, uv_major)
    img_spec = spec.from_rgb(img) * tt.f1[tid][..., None]  # f1 = scale

    # checkerboard 2D (reference: checkerboard.h Checkerboard2DTexture)
    check2 = (jnp.floor(u) + jnp.floor(v)) % 2.0
    check2_val = jnp.where((check2 == 0)[..., None], v1, v2)
    # checkerboard 3D
    fl = jnp.floor(p_t)
    check3 = (fl[..., 0] + fl[..., 1] + fl[..., 2]) % 2.0
    check3_val = jnp.where((check3 == 0)[..., None], v1, v2)
    # uv debug texture
    uv_val = jnp.zeros((u.shape[0], S)).at[:, : S // 2].set(
        (u % 1.0)[..., None]
    ).at[:, S // 2 :].set((v % 1.0)[..., None])
    # scale / mix / bilerp
    scale_val = v1 * v2
    amt = tt.f1[tid][..., None]
    mix_val = (1.0 - amt) * v1 + amt * v2
    bilerp_val = (
        (1 - u[..., None]) * (1 - v[..., None]) * v1 + u[..., None] * v[..., None] * v2
    )
    # noise family (reference: fbm.h / wrinkled.h / marble.h / windy.h)
    octaves = 6
    fbm_val = fbm(tt.perm, p_t, octaves)[..., None] * jnp.ones((1, S))
    wrink_val = turbulence(tt.perm, p_t, octaves)[..., None] * jnp.ones((1, S))
    # marble: sin pattern displaced by turbulence, between c1/c2
    variation = jnp.maximum(tt.f1[tid], 1e-3)
    marble_t = 0.5 + 0.5 * jnp.sin(
        p_t[..., 1] * variation + 5.0 * turbulence(tt.perm, p_t, octaves)
    )
    marble_val = (1 - marble_t[..., None]) * v1 + marble_t[..., None] * v2
    windy_val = (
        jnp.abs(fbm(tt.perm, p_t * 0.1, 3))
        * fbm(tt.perm, p_t, octaves)
    )[..., None] * jnp.ones((1, S))
    # dots (reference: dots.h): poisson-ish dots via per-cell noise
    cell_u = jnp.floor(u + 0.5)
    cell_v = jnp.floor(v + 0.5)
    cell_p = jnp.stack([cell_u + 0.5, cell_v + 0.5, jnp.zeros_like(u)], -1)
    has_dot = perlin_noise(tt.perm, cell_p) > 0.0
    cx = cell_u + 0.35 * perlin_noise(tt.perm, cell_p + 1.5)
    cy = cell_v + 0.35 * perlin_noise(tt.perm, cell_p + 4.5)
    inside = ((u - cx) ** 2 + (v - cy) ** 2) < 0.35 * 0.35
    dots_val = jnp.where((has_dot & inside)[..., None], v1, v2)

    vals = [
        v1,  # constant
        scale_val, mix_val, bilerp_val, img_spec, uv_val,
        check2_val, check3_val, dots_val,
        fbm_val, wrink_val, marble_val, windy_val,
    ]
    out = v1
    for k, val in enumerate(vals):
        out = jnp.where((kind == k)[..., None], val, out)
    return out


def eval_spectrum(tt: TextureTable, tex_id, si_uv, si_p, uv_sigma=None,
                  uv_major=None):
    """Evaluate spectrum textures for the wavefront. tex_id (R,) (-1 lanes
    get zeros). Fixed-depth substitution handles nesting. ``uv_sigma`` /
    ``uv_major``: optional texture-space footprint (minor radius, major
    axis vector) for mip filtering — see ``_image_lookup``."""
    S = tt.c1.shape[-1]
    R = tex_id.shape[0]
    tid = jnp.maximum(tex_id, 0)
    zero = jnp.zeros((R, S))
    # depth-1 nesting: evaluate referenced textures with their constants,
    # then the top-level texture with those values substituted (deeper
    # nesting degrades gracefully to the refs' constant parameters)
    r1 = jnp.maximum(tt.ref1[tid], 0)
    r2 = jnp.maximum(tt.ref2[tid], 0)
    v_r1 = _eval_base(tt, r1, si_uv, si_p, (zero, zero), uv_sigma, uv_major)
    v_r2 = _eval_base(tt, r2, si_uv, si_p, (zero, zero), uv_sigma, uv_major)
    out = _eval_base(tt, tid, si_uv, si_p, (v_r1, v_r2), uv_sigma, uv_major)
    return jnp.where((tex_id >= 0)[..., None], out, 0.0)


def eval_float(tt: TextureTable, tex_id, si_uv, si_p, uv_sigma=None,
               uv_major=None):
    """Float textures = mean of the spectral evaluation (float textures are
    stored as flat spectra)."""
    return eval_spectrum(tt, tex_id, si_uv, si_p, uv_sigma, uv_major).mean(
        axis=-1
    )


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _lanczos_weights(n_out: int, n_in: int, tau: float = 2.0):
    """Separable Lanczos-2 resample weights, 4 taps per output texel
    (reference: mipmap.h:59-140 resampleWeights / Lanczos)."""
    x_out = (np.arange(n_out) + 0.5) * n_in / n_out
    first = np.floor(x_out - 2.0 + 0.5).astype(np.int64)
    offs = first[:, None] + np.arange(4)[None, :]  # (n_out, 4)
    d = (offs + 0.5 - x_out[:, None]) / tau
    w = np.sinc(d) * np.sinc(d / tau) * (np.abs(d) < 1.0)
    s = w.sum(axis=1, keepdims=True)
    w = np.where(s != 0, w / np.maximum(s, 1e-9), 0.25)
    return np.clip(offs, 0, n_in - 1), w.astype(np.float32)


def _resample_pow2(img: np.ndarray) -> np.ndarray:
    """Resample (H, W, C) up to the next power-of-two dims (Lanczos)."""
    H, W = img.shape[:2]
    H2, W2 = _next_pow2(H), _next_pow2(W)
    if H2 != H:
        offs, w = _lanczos_weights(H2, H)
        img = np.einsum("okwc,ok->owc", img[offs], w)
    if W2 != W:
        offs, w = _lanczos_weights(W2, W)
        img = np.einsum("hokc,ok->hoc", img[:, offs], w)
    return np.ascontiguousarray(img, dtype=np.float32)


def _build_pyramid(img: np.ndarray) -> list:
    """Pow-2 resample + 2×2 box-filtered mip chain down to 1×1
    (reference: mipmap.h pyramid; box instead of Lanczos per level —
    documented divergence, sub-level-0 filtering only)."""
    img = _resample_pow2(img)
    levels = [img]
    while img.shape[0] > 1 or img.shape[1] > 1:
        H, W = img.shape[:2]
        h2, w2 = max(H // 2, 1), max(W // 2, 1)
        if H > 1 and W > 1:
            img = img.reshape(h2, 2, w2, 2, -1).mean(axis=(1, 3))
        elif H > 1:
            img = img.reshape(h2, 2, 1, -1).mean(axis=1)
        else:
            img = img.reshape(1, w2, 2, -1).mean(axis=2)
        levels.append(np.ascontiguousarray(img, np.float32))
    return levels[:MAX_MIP_LEVELS]


def build_texture_table(records: dict, config) -> tuple:
    """records: {name: TextureRecord}. Returns (TextureTable, index) where
    index maps (data_type, name) → row id."""
    S = config.n_bins
    names = list(records.keys())
    index = {}
    rows = []
    pool = [np.zeros((1, 3), np.float32)]
    pool_off = 1

    kind_map = {
        "constant": T_CONSTANT, "scale": T_SCALE, "mix": T_MIX,
        "bilerp": T_BILERP, "imagemap": T_IMAGEMAP, "uv": T_UV,
        "checkerboard": T_CHECKER2D, "dots": T_DOTS, "fbm": T_FBM,
        "wrinkled": T_WRINKLED, "marble": T_MARBLE, "windy": T_WINDY,
    }

    def row_for(name, rec):
        p = rec.params
        kind = kind_map.get(rec.tex_class, T_CONSTANT)
        if rec.tex_class == "checkerboard" and p.find_one_int("dimension", 2) == 3:
            kind = T_CHECKER3D
        r = dict(
            kind=kind,
            mapping={"uv": M_UV, "spherical": M_SPHERICAL,
                     "cylindrical": M_CYLINDRICAL, "planar": M_PLANAR}.get(
                p.find_one_string("mapping", "uv"), M_UV),
            uv_xform=[p.find_one_float("uscale", 1.0),
                      p.find_one_float("vscale", 1.0),
                      p.find_one_float("udelta", 0.0),
                      p.find_one_float("vdelta", 0.0)],
            world_to_tex=np.linalg.inv(rec.tex_to_world),
            c1=np.zeros(S, np.float32), c2=np.zeros(S, np.float32),
            f1=1.0, f2=0.5, ref1=-1, ref2=-1,
            img_offset=-1, img_w=0, img_h=0,
            img_level_off=[-1] * MAX_MIP_LEVELS, img_n_levels=0,
        )
        if rec.tex_class == "constant":
            r["c1"] = p.find_one_spectrum("value", 1.0)
        elif rec.tex_class in ("scale", "mix", "checkerboard", "dots", "marble",
                               "bilerp"):
            for slot, pname in (("1", "tex1"), ("2", "tex2")):
                tex_ref = p.find_texture(pname)
                if tex_ref is not None and tex_ref in index_by_name:
                    r[f"ref{slot}"] = index_by_name[tex_ref]
                else:
                    default = 1.0 if (rec.tex_class == "scale") else (
                        0.0 if slot == "2" else 1.0)
                    r[f"c{slot}"] = p.find_one_spectrum(pname, default)
            if rec.tex_class == "mix":
                r["f1"] = p.find_one_float("amount", 0.5)
            if rec.tex_class == "marble":
                r["f1"] = p.find_one_float("variation", 0.2)
        elif rec.tex_class == "imagemap":
            fn = p.find_one_filename("filename", "")
            r["f1"] = p.find_one_float("scale", 1.0)
            if fn:
                try:
                    from pbrt_tpu.film.imageio import read_image

                    img = np.asarray(read_image(fn), np.float32)
                    if img.shape[-1] == 1:
                        img = np.repeat(img, 3, -1)
                    img = img[..., :3]
                    gamma = p.find_one_bool("gamma", False)
                    if gamma:
                        img = img ** 2.2
                    levels = _build_pyramid(img)
                    H, W = levels[0].shape[:2]
                    offs = []
                    for lv in levels:
                        offs.append(sum(len(x) for x in pool))
                        pool.append(lv.reshape(-1, 3))
                    r["img_offset"] = offs[0]
                    r["img_w"] = W
                    r["img_h"] = H
                    r["img_n_levels"] = len(offs)
                    # clamp missing tail levels to the last (1×1) level
                    offs = offs + [offs[-1]] * (MAX_MIP_LEVELS - len(offs))
                    r["img_level_off"] = offs
                except Exception as e:
                    import warnings

                    warnings.warn(f"imagemap {fn!r}: {e}; black texture")
        return r

    index_by_name = {}
    for i, name in enumerate(names):
        index_by_name[name] = i
    for name in names:
        rec = records[name]
        rows.append(row_for(name, rec))
        index[(rec.data_type, name)] = len(rows) - 1
        index[("any", name)] = len(rows) - 1

    K = max(len(rows), 1)
    if not rows:
        rows = [dict(kind=T_CONSTANT, mapping=M_UV, uv_xform=[1, 1, 0, 0],
                     world_to_tex=np.eye(4), c1=np.zeros(S, np.float32),
                     c2=np.zeros(S, np.float32), f1=1.0, f2=0.5, ref1=-1,
                     ref2=-1, img_offset=-1, img_w=0, img_h=0,
                     img_level_off=[-1] * MAX_MIP_LEVELS, img_n_levels=0)]
    rng = np.random.default_rng(1234)
    perm256 = rng.permutation(256)
    perm = np.concatenate([perm256, perm256]).astype(np.int32)
    f32 = lambda key: jnp.asarray(np.asarray([r[key] for r in rows], np.float32))
    i32 = lambda key: jnp.asarray(np.asarray([r[key] for r in rows], np.int32))
    tt = TextureTable(
        kind=i32("kind"),
        mapping=i32("mapping"),
        uv_xform=f32("uv_xform"),
        world_to_tex=f32("world_to_tex"),
        c1=f32("c1"),
        c2=f32("c2"),
        f1=f32("f1"),
        f2=f32("f2"),
        ref1=i32("ref1"),
        ref2=i32("ref2"),
        img_offset=i32("img_offset"),
        img_w=i32("img_w"),
        img_h=i32("img_h"),
        img_level_off=i32("img_level_off"),
        img_n_levels=i32("img_n_levels"),
        pool_rgb=jnp.asarray(np.concatenate(pool, axis=0)),
        perm=jnp.asarray(perm),
    )
    return tt, index
