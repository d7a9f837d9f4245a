"""Transforms: 4x4 matrices, quaternions, animated transforms.

Reference: src/core/transform.{h,cpp} (Matrix4x4, Transform,
AnimatedTransform with Decompose/Interpolate/MotionBounds) and
src/core/quaternion.{h,cpp} (slerp).

TPU-native design: a transform is a pair of (4,4) arrays (m, m_inv) — or a
batch (..., 4, 4) of them — manipulated functionally. Scene-build-time
composition happens on host in float64 numpy for robustness; per-ray
animated interpolation (motion blur) is jnp so it runs inside the ray-gen
kernel, vectorized over the time axis of the wavefront.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.utils import pytree_dataclass, static_field


# ---------------------------------------------------------------------------
# Host-side matrix constructors (numpy float64; reference transform.cpp)
# ---------------------------------------------------------------------------


def identity() -> np.ndarray:
    return np.eye(4, dtype=np.float64)


def translate(delta) -> np.ndarray:
    m = identity()
    m[:3, 3] = delta
    return m


def scale(sx, sy, sz) -> np.ndarray:
    m = identity()
    m[0, 0], m[1, 1], m[2, 2] = sx, sy, sz
    return m


def rotate_x(deg) -> np.ndarray:
    return rotate(deg, (1.0, 0.0, 0.0))


def rotate_y(deg) -> np.ndarray:
    return rotate(deg, (0.0, 1.0, 0.0))


def rotate_z(deg) -> np.ndarray:
    return rotate(deg, (0.0, 0.0, 1.0))


def rotate(deg, axis) -> np.ndarray:
    """Rotation about arbitrary axis (reference: transform.cpp:180-210)."""
    a = np.asarray(axis, dtype=np.float64)
    a = a / np.linalg.norm(a)
    s = np.sin(np.deg2rad(deg))
    c = np.cos(np.deg2rad(deg))
    m = identity()
    m[0, 0] = a[0] * a[0] + (1 - a[0] * a[0]) * c
    m[0, 1] = a[0] * a[1] * (1 - c) - a[2] * s
    m[0, 2] = a[0] * a[2] * (1 - c) + a[1] * s
    m[1, 0] = a[0] * a[1] * (1 - c) + a[2] * s
    m[1, 1] = a[1] * a[1] + (1 - a[1] * a[1]) * c
    m[1, 2] = a[1] * a[2] * (1 - c) - a[0] * s
    m[2, 0] = a[0] * a[2] * (1 - c) - a[1] * s
    m[2, 1] = a[1] * a[2] * (1 - c) + a[0] * s
    m[2, 2] = a[2] * a[2] + (1 - a[2] * a[2]) * c
    return m


def look_at(eye, look, up) -> np.ndarray:
    """camera-to-world (reference: transform.cpp:212-242)."""
    eye = np.asarray(eye, np.float64)
    look = np.asarray(look, np.float64)
    up = np.asarray(up, np.float64)
    d = look - eye
    d = d / np.linalg.norm(d)
    left = np.cross(up / np.linalg.norm(up), d)
    nl = np.linalg.norm(left)
    if nl < 1e-12:
        # up parallel to viewing direction — pick an arbitrary orthogonal up
        # (the reference raises Error here, transform.cpp:230)
        alt = np.array([1.0, 0.0, 0.0]) if abs(d[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
        left = np.cross(alt, d)
        nl = np.linalg.norm(left)
    left /= nl
    new_up = np.cross(d, left)
    m = identity()
    m[:3, 0] = left
    m[:3, 1] = new_up
    m[:3, 2] = d
    m[:3, 3] = eye
    return m


def perspective(fov_deg, znear, zfar) -> np.ndarray:
    """Projective camera matrix (reference: transform.cpp:395-409)."""
    persp = np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, zfar / (zfar - znear), -zfar * znear / (zfar - znear)],
            [0, 0, 1, 0],
        ],
        dtype=np.float64,
    )
    inv_tan = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    return scale(inv_tan, inv_tan, 1.0) @ persp


def orthographic(znear, zfar) -> np.ndarray:
    """(reference: orthographic.cpp Orthographic())."""
    return scale(1.0, 1.0, 1.0 / (zfar - znear)) @ translate((0.0, 0.0, -znear))


def inverse(m: np.ndarray) -> np.ndarray:
    return np.linalg.inv(m)


def swaps_handedness(m: np.ndarray) -> bool:
    """(reference: transform.h:241-249) det of upper 3x3 < 0."""
    return bool(np.linalg.det(np.asarray(m)[:3, :3]) < 0.0)


# ---------------------------------------------------------------------------
# Device-side application (jnp; m can be (4,4) or batched (...,4,4))
# ---------------------------------------------------------------------------


def apply_point(m, p):
    """Transform points (..., 3) by m ((4,4) or batched (..., 4, 4));
    handles the homogeneous divide."""
    m = jnp.asarray(m, p.dtype)
    r = jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]
    w = jnp.einsum("...j,...j->...", m[..., 3, :3], p) + m[..., 3, 3]
    return r / w[..., None]


def apply_vector(m, v):
    m = jnp.asarray(m, v.dtype)
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)


def apply_normal(m_inv, n):
    """Normals transform by the inverse transpose (reference: transform.h:262)."""
    m_inv = jnp.asarray(m_inv, n.dtype)
    return jnp.einsum("...ji,...j->...i", m_inv[..., :3, :3], n)


def apply_ray(m, ray):
    return ray.replace(
        origin=apply_point(m, ray.origin), direction=apply_vector(m, ray.direction)
    )


def apply_bbox(m: np.ndarray, lo, hi):
    """Transform an AABB: transform the 8 corners, rebound (host, numpy)."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    pts = np.array(
        [
            [x, y, z]
            for x in (lo[0], hi[0])
            for y in (lo[1], hi[1])
            for z in (lo[2], hi[2])
        ]
    )
    tp = pts @ np.asarray(m)[:3, :3].T + np.asarray(m)[:3, 3]
    return tp.min(axis=0), tp.max(axis=0)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z order) — host + device
# ---------------------------------------------------------------------------


def quat_from_matrix(m: np.ndarray) -> np.ndarray:
    """Rotation matrix → unit quaternion (reference: quaternion.cpp:63-107)."""
    m = np.asarray(m, np.float64)
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    if tr > 0.0:
        s = np.sqrt(tr + 1.0)
        w = s / 2.0
        s = 0.5 / s
        return np.array(
            [w, (m[2, 1] - m[1, 2]) * s, (m[0, 2] - m[2, 0]) * s, (m[1, 0] - m[0, 1]) * s]
        )
    # find largest diagonal element
    i = int(np.argmax([m[0, 0], m[1, 1], m[2, 2]]))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(m[i, i] - (m[j, j] + m[k, k]) + 1.0, 0.0))
    q = np.zeros(4)
    q[1 + i] = s * 0.5
    if s != 0.0:
        s = 0.5 / s
    q[0] = (m[k, j] - m[j, k]) * s
    q[1 + j] = (m[j, i] + m[i, j]) * s
    q[1 + k] = (m[k, i] + m[i, k]) * s
    return q


def quat_to_matrix(q) -> jnp.ndarray:
    """Unit quaternion (..., 4) → rotation matrix (..., 4, 4) (jnp)."""
    q = jnp.asarray(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1
    )
    r = jnp.stack([row0, row1, row2], -2)
    batch = q.shape[:-1]
    m = jnp.zeros(batch + (4, 4), q.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., 3, 3].set(1.0)
    return m


def slerp(t, q0, q1):
    """Spherical linear interpolation (reference: quaternion.cpp:47-60). jnp."""
    q0 = jnp.asarray(q0)
    q1 = jnp.asarray(q1)
    cos_theta = jnp.sum(q0 * q1, axis=-1)
    # take shorter arc
    q1 = jnp.where(cos_theta[..., None] < 0.0, -q1, q1)
    cos_theta = jnp.abs(cos_theta)

    def near(args):
        q0, q1, t = args
        q = q0 + t[..., None] * (q1 - q0)
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    safe_sin = jnp.where(sin_theta < 1e-6, 1.0, sin_theta)
    w0 = jnp.sin((1.0 - t) * theta) / safe_sin
    w1 = jnp.sin(t * theta) / safe_sin
    q_slerp = w0[..., None] * q0 + w1[..., None] * q1
    q_lerp = near((q0, q1, jnp.asarray(t)))
    return jnp.where(cos_theta[..., None] > 0.9995, q_lerp, q_slerp)


# ---------------------------------------------------------------------------
# Animated transforms (reference: transform.h:291-319, transform.cpp:478-600)
# ---------------------------------------------------------------------------


def decompose(m: np.ndarray):
    """M → (T, R-quaternion, S) via polar decomposition iteration
    (reference: AnimatedTransform::Decompose, transform.cpp:496-538)."""
    m = np.asarray(m, np.float64)
    T = m[:3, 3].copy()
    M3 = m[:3, :3].copy()
    R = M3.copy()
    for _ in range(100):
        Rnext = 0.5 * (R + np.linalg.inv(R.T))
        if np.abs(Rnext - R).max() < 1e-7:
            R = Rnext
            break
        R = Rnext
    S = np.linalg.inv(R) @ M3
    Rm = identity()
    Rm[:3, :3] = R
    return T, quat_from_matrix(Rm), S


@pytree_dataclass
class AnimatedTransform:
    """Two-keyframe rigid+scale interpolated transform.

    Static payload for ray generation / instancing: translation (2,3),
    rotation quats (2,4), scale mats (2,3,3), times (2,). When
    ``actually_animated`` is False, interpolation short-circuits to m[0].
    """

    T: jnp.ndarray  # (2, 3)
    R: jnp.ndarray  # (2, 4) quaternions
    S: jnp.ndarray  # (2, 3, 3)
    times: jnp.ndarray  # (2,)
    m_start: jnp.ndarray  # (4, 4) full matrices for endpoints
    m_end: jnp.ndarray
    #: build-time static: identical keyframes skip the per-ray
    #: slerp+compose entirely (a static camera was paying ~5 ms per 32k
    #: rays in lane-padded (R,4,4) quaternion math)
    is_static: bool = static_field(default=False)

    @staticmethod
    def from_matrices(m0: np.ndarray, m1: np.ndarray, t0: float, t1: float):
        T0, R0, S0 = decompose(m0)
        T1, R1, S1 = decompose(m1)
        # pick shortest rotation arc (reference: transform.cpp:489-493)
        if np.dot(R0, R1) < 0.0:
            R1 = -R1
        f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
        return AnimatedTransform(
            T=f32(np.stack([T0, T1])),
            R=f32(np.stack([R0, R1])),
            S=f32(np.stack([S0, S1])),
            times=f32(np.array([t0, t1])),
            m_start=f32(m0),
            m_end=f32(m1),
            is_static=bool(np.allclose(m0, m1, atol=1e-12)),
        )

    @property
    def actually_animated(self) -> jnp.ndarray:
        return jnp.any(self.m_start != self.m_end)

    def interpolate(self, time):
        """time (...,) → matrices (..., 4, 4). jnp, jit-safe.

        Static transforms (is_static) return the single (4, 4) keyframe —
        it broadcasts through apply_point/apply_vector without the
        per-lane slerp/compose."""
        if self.is_static:
            return self.m_start
        t0, t1 = self.times[0], self.times[1]
        dt = jnp.clip((time - t0) / jnp.maximum(t1 - t0, 1e-20), 0.0, 1.0)
        trans = (1.0 - dt)[..., None] * self.T[0] + dt[..., None] * self.T[1]
        rot = slerp(dt, self.R[0], self.R[1])
        sc = (1.0 - dt)[..., None, None] * self.S[0] + dt[..., None, None] * self.S[1]
        m = quat_to_matrix(rot)
        m3 = m[..., :3, :3] @ sc
        out = jnp.zeros(jnp.shape(dt) + (4, 4), m.dtype)
        out = out.at[..., :3, :3].set(m3)
        out = out.at[..., :3, 3].set(trans)
        out = out.at[..., 3, 3].set(1.0)
        # not-animated fast path handled by data (m_start == m_end ⇒ same result)
        return out
