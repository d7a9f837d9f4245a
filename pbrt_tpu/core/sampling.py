"""Monte Carlo sampling library.

Reference: src/core/montecarlo.{h,cpp} — Distribution1D/2D, warps
(concentric disk, cosine hemisphere, uniform sphere/triangle/cone), MIS
heuristics, and the low-discrepancy machinery (radical inverse, van der
Corput, Sobol', (0,2)-sequence) used by the default ``lowdiscrepancy``
sampler (src/samplers/lowdiscrepancy.{h,cpp}).

TPU-native design: everything is batched jnp. Distributions are pytrees of
(cdf, func) arrays built with cumsum (differentiable, jit-safe); inversion
is ``searchsorted`` which XLA lowers to vectorized binary search. The
(0,2)-sequence generators are branch-free uint32 bit kernels (VPU-friendly),
replacing the reference's sequential loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pbrt_tpu.utils import pytree_dataclass
from pbrt_tpu.core import geometry as geom

import numpy as _np_host

# computed on the HOST (numpy): a jnp call here would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize (it must
# run before any backend touch — multi-host startup imports this module)
ONE_MINUS_EPS = float(_np_host.nextafter(_np_host.float32(1.0),
                                         _np_host.float32(0.0)))

# ---------------------------------------------------------------------------
# Distribution1D / Distribution2D  (reference: montecarlo.h:46-158)
# ---------------------------------------------------------------------------


@pytree_dataclass
class Distribution1D:
    """Piecewise-constant 1D distribution over [0,1).

    func: (..., n) nonneg values; cdf: (..., n+1); func_int: (...)."""

    func: jnp.ndarray
    cdf: jnp.ndarray
    func_int: jnp.ndarray

    @staticmethod
    def build(f) -> "Distribution1D":
        f = jnp.asarray(f)
        n = f.shape[-1]
        cdf = jnp.cumsum(f, axis=-1) / n
        func_int = cdf[..., -1]
        zero = jnp.zeros_like(func_int)[..., None]
        safe = jnp.maximum(func_int, 1e-20)[..., None]
        cdf_n = jnp.concatenate([zero, cdf], axis=-1) / safe
        # degenerate (all-zero) distribution → uniform cdf
        uniform = jnp.linspace(0.0, 1.0, n + 1, dtype=f.dtype)
        cdf_n = jnp.where(func_int[..., None] > 0.0, cdf_n, uniform)
        return Distribution1D(func=f, cdf=cdf_n, func_int=func_int)

    @property
    def count(self) -> int:
        return self.func.shape[-1]

    def sample_continuous(self, u):
        """u (...,) → (x in [0,1), pdf, offset). (montecarlo.h:58-79)."""
        n = self.count
        off = jnp.clip(
            jnp.searchsorted(self.cdf, u, side="right") - 1, 0, n - 1
        )
        c0 = jnp.take(self.cdf, off)
        c1 = jnp.take(self.cdf, off + 1)
        du = (u - c0) / jnp.maximum(c1 - c0, 1e-20)
        x = (off + du) / n
        fi = jnp.maximum(self.func_int, 1e-20)
        pdf = jnp.take(self.func, off) / fi
        return x, pdf, off

    def sample_discrete(self, u):
        """u (...,) → (index, pmf). (montecarlo.h:81-92)."""
        n = self.count
        off = jnp.clip(jnp.searchsorted(self.cdf, u, side="right") - 1, 0, n - 1)
        fi = jnp.maximum(self.func_int, 1e-20)
        pmf = jnp.take(self.func, off) / (fi * n)
        return off, pmf

    def discrete_pdf(self, index):
        fi = jnp.maximum(self.func_int, 1e-20)
        return jnp.take(self.func, index) / (fi * self.count)


@pytree_dataclass
class Distribution2D:
    """Product distribution over the unit square (montecarlo.h:134-158).

    conditional: cdfs over x per row; marginal: cdf over y.
    func: (ny, nx)."""

    func: jnp.ndarray  # (ny, nx)
    cond_cdf: jnp.ndarray  # (ny, nx+1)
    cond_int: jnp.ndarray  # (ny,)
    marg_func: jnp.ndarray  # (ny,)
    marg_cdf: jnp.ndarray  # (ny+1,)
    marg_int: jnp.ndarray  # ()

    @staticmethod
    def build(f) -> "Distribution2D":
        f = jnp.asarray(f)
        cond = Distribution1D.build(f)  # batched over rows
        marg = Distribution1D.build(cond.func_int)
        return Distribution2D(
            func=f,
            cond_cdf=cond.cdf,
            cond_int=cond.func_int,
            marg_func=marg.func,
            marg_cdf=marg.cdf,
            marg_int=marg.func_int,
        )

    def sample_continuous(self, u0, u1):
        """(u0, u1) (...,) → ((u, v), pdf)."""
        ny, nx = self.func.shape
        # sample marginal (v / row)
        oy = jnp.clip(jnp.searchsorted(self.marg_cdf, u1, side="right") - 1, 0, ny - 1)
        c0 = jnp.take(self.marg_cdf, oy)
        c1 = jnp.take(self.marg_cdf, oy + 1)
        dv = (u1 - c0) / jnp.maximum(c1 - c0, 1e-20)
        v = (oy + dv) / ny
        pdf_y = jnp.take(self.marg_func, oy) / jnp.maximum(self.marg_int, 1e-20)
        # sample conditional (u / column) for the chosen rows
        row_cdf = self.cond_cdf[oy]  # (..., nx+1)
        ox = jnp.clip(
            jnp.sum((row_cdf <= u0[..., None]).astype(jnp.int32), axis=-1) - 1, 0, nx - 1
        )
        r0 = jnp.take_along_axis(row_cdf, ox[..., None], -1)[..., 0]
        r1 = jnp.take_along_axis(row_cdf, (ox + 1)[..., None], -1)[..., 0]
        du = (u0 - r0) / jnp.maximum(r1 - r0, 1e-20)
        u = (ox + du) / nx
        ci = jnp.maximum(self.cond_int[oy], 1e-20)
        pdf_x = self.func[oy, ox] / ci
        return (u, v), pdf_x * pdf_y

    def pdf(self, u, v):
        """(montecarlo.cpp Distribution2D::Pdf)."""
        ny, nx = self.func.shape
        iu = jnp.clip((u * nx).astype(jnp.int32), 0, nx - 1)
        iv = jnp.clip((v * ny).astype(jnp.int32), 0, ny - 1)
        return self.func[iv, iu] / jnp.maximum(self.marg_int, 1e-20)


# ---------------------------------------------------------------------------
# Warps (reference: montecarlo.cpp)
# ---------------------------------------------------------------------------


def uniform_sample_hemisphere(u1, u2):
    z = u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def uniform_sample_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


UNIFORM_HEMISPHERE_PDF = 1.0 / (2.0 * jnp.pi)
UNIFORM_SPHERE_PDF = 1.0 / (4.0 * jnp.pi)


def concentric_sample_disk(u1, u2):
    """Shirley–Chiu concentric map, branch-free (montecarlo.cpp:195-240)."""
    sx = 2.0 * u1 - 1.0
    sy = 2.0 * u2 - 1.0
    r_big = jnp.where(jnp.abs(sx) > jnp.abs(sy), sx, sy)
    r = jnp.abs(r_big)
    safe = lambda a, b: a / jnp.where(jnp.abs(b) < 1e-12, 1.0, b)
    theta = jnp.where(
        jnp.abs(sx) > jnp.abs(sy),
        jnp.where(sx >= 0, safe(sy, sx), 4.0 + safe(sy, sx)),
        jnp.where(sy >= 0, 2.0 - safe(sx, sy), 6.0 - safe(sx, sy)),
    )
    theta = theta * (jnp.pi / 4.0)
    zero = (sx == 0.0) & (sy == 0.0)
    dx = jnp.where(zero, 0.0, r * jnp.cos(theta))
    dy = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return dx, dy


def cosine_sample_hemisphere(u1, u2):
    """(montecarlo.h:119-127): concentric disk lifted to hemisphere."""
    x, y = concentric_sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], -1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta / jnp.pi


def uniform_sample_triangle(u1, u2):
    """Barycentric (b0, b1) (montecarlo.cpp:242-247)."""
    su1 = jnp.sqrt(u1)
    return 1.0 - su1, u2 * su1


def uniform_sample_cone(u1, u2, cos_theta_max):
    """(montecarlo.cpp:260-268)."""
    cos_theta = (1.0 - u1) + u1 * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u2
    return geom.spherical_direction(sin_theta, cos_theta, phi)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * jnp.pi * jnp.maximum(1.0 - cos_theta_max, 1e-9))


def sample_hg(w, g, u1, u2):
    """Henyey–Greenstein phase sampling (montecarlo.cpp:270-287)."""
    g = jnp.asarray(g)
    safe_g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
    cos_theta_hg = (1.0 + g * g - sqr * sqr) / (2.0 * safe_g)
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * u1, cos_theta_hg)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u2
    t, b = geom.coordinate_system(w)
    return geom.spherical_direction_basis(sin_theta, cos_theta, phi, t, b, w)


def hg_pdf(cos_theta, g):
    """Phase function value = pdf (montecarlo.h PhaseHG)."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return (1.0 - g * g) / (4.0 * jnp.pi * denom * jnp.sqrt(jnp.maximum(denom, 1e-12)))


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    """(montecarlo.h:249-252)."""
    return (nf * f_pdf) / jnp.maximum(nf * f_pdf + ng * g_pdf, 1e-20)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """β=2 power heuristic (montecarlo.h:254-258)."""
    f = nf * f_pdf
    g = ng * g_pdf
    return (f * f) / jnp.maximum(f * f + g * g, 1e-20)


# ---------------------------------------------------------------------------
# Low-discrepancy sequences (reference: montecarlo.h:177-244)
# Branch-free uint32 bit kernels; vectorized over sample index arrays.
# ---------------------------------------------------------------------------


def reverse_bits32(n):
    n = jnp.asarray(n, jnp.uint32)
    n = (n << 16) | (n >> 16)
    n = ((n & jnp.uint32(0x00FF00FF)) << 8) | ((n & jnp.uint32(0xFF00FF00)) >> 8)
    n = ((n & jnp.uint32(0x0F0F0F0F)) << 4) | ((n & jnp.uint32(0xF0F0F0F0)) >> 4)
    n = ((n & jnp.uint32(0x33333333)) << 2) | ((n & jnp.uint32(0xCCCCCCCC)) >> 2)
    n = ((n & jnp.uint32(0x55555555)) << 1) | ((n & jnp.uint32(0xAAAAAAAA)) >> 1)
    return n


def van_der_corput(n, scramble=0):
    """Base-2 radical inverse with XOR scramble (montecarlo.h:201-210).
    n and scramble broadcast against each other."""
    bits = reverse_bits32(n) ^ jnp.asarray(scramble, jnp.uint32)
    return jnp.minimum(
        bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10), ONE_MINUS_EPS
    )


def sobol2(n, scramble=0):
    """Second Sobol' dimension (montecarlo.h:212-222), vectorized.

    Direction numbers v_i = pattern generated by v ^= v >> 1 recurrence; the
    classic loop is unrolled to 32 static iterations (jit-friendly).
    n and scramble broadcast against each other.
    """
    scramble = jnp.asarray(scramble, jnp.uint32)
    shape = jnp.broadcast_shapes(jnp.shape(n), scramble.shape)
    n = jnp.broadcast_to(jnp.asarray(n, jnp.uint32), shape)
    result = jnp.broadcast_to(scramble, shape).astype(jnp.uint32)
    v = jnp.uint32(1 << 31)
    for i in range(32):
        take = ((n >> jnp.uint32(i)) & jnp.uint32(1)).astype(jnp.bool_)
        result = jnp.where(take, result ^ v, result)
        v = v ^ (v >> jnp.uint32(1))
    return jnp.minimum(
        result.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10), ONE_MINUS_EPS
    )


def sample02(n, scramble2):
    """(0,2)-sequence sample n with 2 scramble words (montecarlo.h:177-181).

    scramble2: (..., 2) uint32. Returns (..., 2) floats."""
    return jnp.stack(
        [van_der_corput(n, scramble2[..., 0]), sobol2(n, scramble2[..., 1])], -1
    )


def radical_inverse(n, base: int):
    """General radical inverse for Halton (montecarlo.h:183-194).

    Static base; fixed iteration count covering uint32 range in that base."""
    n = jnp.asarray(n, jnp.uint32)
    import math

    iters = max(1, int(math.ceil(32.0 / math.log2(base))))
    inv_base = jnp.float32(1.0 / base)
    val = jnp.zeros(n.shape, jnp.float32)
    inv_bi = inv_base
    for _ in range(iters):
        d = (n % jnp.uint32(base)).astype(jnp.float32)
        val = val + d * inv_bi
        n = n // jnp.uint32(base)
        inv_bi = inv_bi * inv_base
    return jnp.minimum(val, ONE_MINUS_EPS)


# First 32 primes for Halton dimensions.
PRIMES = [
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
    59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131,
]


import functools

import numpy as _np


@functools.lru_cache(maxsize=16)
def best_candidate_table(n: int, seed: int = 0) -> "_np.ndarray":
    """(n, 2) Poisson-disk-like 2D point set via Mitchell's best-candidate
    dart throwing with toroidal metric (host-side, cached per spp).

    Reference: samplers/bestcandidate.cpp:40-120 consumes a precomputed
    table generated offline by tools/samplepat.cpp (also dart throwing).
    TPU redesign: one table per sample count, built at trace time and baked
    into the wave kernel as a constant; every pixel applies its own threefry
    toroidal shift, preserving the blue-noise structure within the pixel
    while decorrelating across pixels. Incremental construction means every
    prefix of the table is itself well distributed (progressive rendering).
    """
    rng = _np.random.default_rng(seed)
    pts = _np.empty((max(n, 1), 2))
    pts[0] = rng.uniform(0, 1, 2)
    for i in range(1, n):
        k = min(20 * i, 512)
        cands = rng.uniform(0, 1, (k, 2))
        d = _np.abs(pts[None, :i, :] - cands[:, None, :])
        d = _np.minimum(d, 1.0 - d)  # toroidal distance
        dist2 = (d * d).sum(-1).min(1)
        pts[i] = cands[_np.argmax(dist2)]
    return pts.astype(_np.float32)


def stratified_1d(key, n: int, jitter: bool = True):
    """(reference: montecarlo.cpp StratifiedSample1D)."""
    offs = (jnp.arange(n) + (jax.random.uniform(key, (n,)) if jitter else 0.5)) / n
    return jnp.minimum(offs, ONE_MINUS_EPS)


def stratified_2d(key, nx: int, ny: int, jitter: bool = True):
    """Returns (nx*ny, 2) (reference: montecarlo.cpp StratifiedSample2D)."""
    u = jax.random.uniform(key, (ny, nx, 2)) if jitter else jnp.full((ny, nx, 2), 0.5)
    ix = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float32)[None, :], (ny, nx))
    iy = jnp.broadcast_to(jnp.arange(ny, dtype=jnp.float32)[:, None], (ny, nx))
    pts = (jnp.stack([ix, iy], -1) + u) / jnp.asarray([nx, ny], jnp.float32)
    return jnp.minimum(pts.reshape(nx * ny, 2), ONE_MINUS_EPS)
