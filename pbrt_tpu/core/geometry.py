"""Geometry: vectors, rays, bounding boxes — batched SoA style.

The reference defines Vector/Point/Normal/Ray/RayDifferential/BBox value
classes (reference: src/core/geometry.h). TPU-native design: points and
directions are plain ``(..., 3)`` arrays; a batch of rays is one pytree of
arrays (``Ray``), so a whole wavefront is a single SoA structure that jit /
vmap / shard_map operate on directly.

``Ray`` carries the fork's per-ray ``wavelength`` field
(reference: geometry.h:338, "Andy added") so lens cameras can refract
chromatically, plus ``time`` for motion blur and ``tmax`` (``maxt``) which
the spectral film uses as the depth channel (reference:
film/spectralImage.cpp:147).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from pbrt_tpu.utils import pytree_dataclass

INF = jnp.inf
#: Matches the reference's ray-offset epsilon regime; actual per-hit epsilons
#: are computed as 1e-3 * hit_t like Shape::Intersect does.
RAY_EPSILON = 1e-3


# ---------------------------------------------------------------------------
# (..., 3) vector helpers
# ---------------------------------------------------------------------------


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    return jnp.cross(a, b)


def length_sq(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_sq(v))


def normalize(v, eps: float = 1e-20):
    """Safe normalize: returns v/|v|, zero vectors pass through scaled by 0."""
    return v / jnp.maximum(length(v), eps)[..., None]


def distance(a, b):
    return length(a - b)


def face_forward(n, v):
    """Flip n to lie in the hemisphere of v (reference: geometry.h:502)."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def coordinate_system(v):
    """Build an orthonormal basis around unit v (reference: geometry.h:428).

    Returns (t, b) with (t, b, v) right-handed. Branch-free variant
    (Duff et al. 2017) — well-conditioned for all v, no jnp.where on
    near-degenerate axes.
    """
    s = jnp.where(v[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + v[..., 2])
    b = v[..., 0] * v[..., 1] * a
    t1 = jnp.stack(
        [1.0 + s * v[..., 0] * v[..., 0] * a, s * b, -s * v[..., 0]], axis=-1
    )
    t2 = jnp.stack([b, s + v[..., 1] * v[..., 1] * a, -v[..., 1]], axis=-1)
    return t1, t2


def spherical_direction(sin_theta, cos_theta, phi):
    """(θ, φ) → unit vector in standard frame (reference: geometry.h:528)."""
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def spherical_direction_basis(sin_theta, cos_theta, phi, x, y, z):
    """Spherical direction in the frame (x, y, z) (reference: geometry.h:535)."""
    return (
        (sin_theta * jnp.cos(phi))[..., None] * x
        + (sin_theta * jnp.sin(phi))[..., None] * y
        + cos_theta[..., None] * z
    )


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * jnp.pi, p)


def lerp(t, a, b):
    return a + t * (b - a)


# ---------------------------------------------------------------------------
# Rays
# ---------------------------------------------------------------------------


@pytree_dataclass
class Ray:
    """A batch of rays, SoA. All fields broadcast over leading batch dims.

    origin/direction: (..., 3). tmin/tmax/time/wavelength: (...,).
    ``wavelength`` is 0.0 when the ray is panchromatic (carries the full
    spectrum) — same convention as the reference's default
    (geometry.h:317: wavelength = 0).
    """

    origin: jnp.ndarray
    direction: jnp.ndarray
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    time: jnp.ndarray
    wavelength: jnp.ndarray

    @staticmethod
    def make(origin, direction, tmin=None, tmax=None, time=None, wavelength=None):
        origin = jnp.asarray(origin)
        batch = origin.shape[:-1]

        def fill(x, default):
            if x is None:
                return jnp.full(batch, default, dtype=origin.dtype)
            return jnp.broadcast_to(jnp.asarray(x, dtype=origin.dtype), batch)

        return Ray(
            origin=origin,
            direction=jnp.broadcast_to(jnp.asarray(direction, origin.dtype), batch + (3,)),
            tmin=fill(tmin, 0.0),
            tmax=fill(tmax, jnp.inf),
            time=fill(time, 0.0),
            wavelength=fill(wavelength, 0.0),
        )

    def at(self, t):
        """Point along the ray: o + t*d."""
        return self.origin + jnp.asarray(t)[..., None] * self.direction

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@pytree_dataclass
class RayDifferential:
    """Main ray + x/y offset rays for texture filtering.

    (reference: geometry.h:360-375). ``has_differentials`` is per-ray;
    ``scale_differentials`` implements RayDifferential::ScaleDifferentials
    for spp-dependent footprint scaling.
    """

    ray: Ray
    rx_origin: jnp.ndarray
    rx_direction: jnp.ndarray
    ry_origin: jnp.ndarray
    ry_direction: jnp.ndarray
    has_differentials: jnp.ndarray  # (...,) bool

    def scale_differentials(self, s):
        r = self.ray
        return dataclasses.replace(
            self,
            rx_origin=r.origin + (self.rx_origin - r.origin) * s,
            ry_origin=r.origin + (self.ry_origin - r.origin) * s,
            rx_direction=r.direction + (self.rx_direction - r.direction) * s,
            ry_direction=r.direction + (self.ry_direction - r.direction) * s,
        )


# ---------------------------------------------------------------------------
# Axis-aligned bounding boxes: pairs of (..., 3) arrays
# ---------------------------------------------------------------------------


@pytree_dataclass
class BBox:
    lo: jnp.ndarray  # (..., 3)
    hi: jnp.ndarray  # (..., 3)

    @staticmethod
    def empty(batch=()):
        return BBox(
            lo=jnp.full(batch + (3,), jnp.inf),
            hi=jnp.full(batch + (3,), -jnp.inf),
        )

    def union(self, other: "BBox") -> "BBox":
        return BBox(jnp.minimum(self.lo, other.lo), jnp.maximum(self.hi, other.hi))

    def union_point(self, p) -> "BBox":
        return BBox(jnp.minimum(self.lo, p), jnp.maximum(self.hi, p))

    def diagonal(self):
        return self.hi - self.lo

    def surface_area(self):
        d = jnp.maximum(self.diagonal(), 0.0)
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])

    def centroid(self):
        return 0.5 * (self.lo + self.hi)

    def bounding_sphere(self):
        c = self.centroid()
        return c, distance(c, self.hi)


def ray_bbox_intersect(o, inv_d, tmin, tmax, lo, hi):
    """Slab test. All args broadcast; returns hit mask.

    Same structure as the reference's precomputed-invDir slab test
    (accelerators/bvh.cpp:118-130) but vectorized over rays×boxes.
    """
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tnear = jnp.minimum(t0, t1)
    tfar = jnp.maximum(t0, t1)
    t_enter = jnp.maximum(jnp.max(tnear, axis=-1), tmin)
    t_exit = jnp.minimum(jnp.min(tfar, axis=-1), tmax)
    return t_enter <= t_exit
