"""Dipole subsurface scattering (BSSRDF) integrator.

Reference: src/integrators/dipolesubsurface.{h,cpp} (351 LoC) — two-phase:
Preprocess drives FindPoissonPointDistribution (renderers/
surfacepoints.cpp dart-throwing) to distribute points over scene surfaces,
computes irradiance at each via light sampling, builds a SubsurfaceOctree
for hierarchical Mo(pt) evaluation with the Jensen–Buhler
DiffusionReflectance Rd(d²); Li adds (1/π)·Ft·Mo plus specular recursion.

TPU-native design:
  - surface points are sampled **directly area-weighted** on the
    subsurface-material triangles (vectorized bulk sampling replaces
    sequential dart throwing; spacing from ``minsampledistance``);
  - irradiance at all points is one batched NEE pass (shadow rays through
    the standard traversal);
  - the octree gather becomes a **dense chunked Rd-weighted reduction**
    over all points (exact — no ``maxerror`` approximation needed; the
    N-body-style reduction is MXU/VPU-friendly).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.lights import table as lights_mod
from pbrt_tpu.utils import pytree_dataclass, static_field

MAX_POINTS = 4096
#: point-chunk size for the dense Mo reduction — bounds the (R, CHUNK, S)
#: intermediate to ~R·8KB
CHUNK = 64


@pytree_dataclass
class SubsurfaceData:
    """Irradiance point cloud (the octree's payload, flattened)."""

    points: jnp.ndarray  # (N, 3)
    normals: jnp.ndarray  # (N, 3)
    areas: jnp.ndarray  # (N,)
    E: jnp.ndarray  # (N, S) irradiance
    material: jnp.ndarray  # (N,) material row of each point


def diffusion_rd(d2, sigma_a, sigma_prime_s, eta):
    """Jensen dipole diffuse reflectance Rd(d²)
    (reference: DiffusionReflectance, dipolesubsurface.cpp:59-88).
    d2 (...,); spectral params (..., S). Returns (..., S)."""
    sigmap_t = sigma_a + sigma_prime_s
    sigmap_t = jnp.maximum(sigmap_t, 1e-6)
    alphap = sigma_prime_s / sigmap_t
    sigma_tr = jnp.sqrt(3.0 * sigma_a * sigmap_t)
    fdr = -1.440 / (eta * eta) + 0.710 / eta + 0.668 + 0.0636 * eta
    A = (1.0 + fdr) / (1.0 - fdr)
    zpos = 1.0 / sigmap_t
    zneg = -zpos * (1.0 + (4.0 / 3.0) * A)
    d2e = d2[..., None]
    dpos = jnp.sqrt(d2e + zpos * zpos)
    dneg = jnp.sqrt(d2e + zneg * zneg)
    rd = (alphap / (4.0 * jnp.pi)) * (
        (zpos * (dpos * sigma_tr + 1.0) * jnp.exp(-sigma_tr * dpos))
        / jnp.maximum(sigmap_t * dpos**3, 1e-12)
        - (zneg * (dneg * sigma_tr + 1.0) * jnp.exp(-sigma_tr * dneg))
        / jnp.maximum(sigmap_t * dneg**3, 1e-12)
    )
    return jnp.maximum(rd, 0.0)


def sample_surface_points(built, n_points=MAX_POINTS, seed=0):
    """Area-weighted point distribution over subsurface-material triangles
    (host). Returns arrays or None if the scene has no subsurface
    materials."""
    from pbrt_tpu.materials.table import SUBSURFACE, KDSUBSURFACE

    g = built.scene.geometry
    kinds = np.asarray(built.scene.materials.kind)
    tri_mat = np.asarray(g.tri_material)
    is_ss = np.isin(kinds[tri_mat], [SUBSURFACE, KDSUBSURFACE])
    if not is_ss.any():
        return None
    idx = np.nonzero(is_ss)[0]
    v0 = np.asarray(g.tri_v0)[idx]
    e1 = np.asarray(g.tri_e1)[idx]
    e2 = np.asarray(g.tri_e2)[idx]
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    total_area = float(areas.sum())
    rng = np.random.default_rng(seed)
    probs = areas / max(areas.sum(), 1e-20)
    pick = rng.choice(len(idx), n_points, p=probs)
    u1 = rng.uniform(0, 1, n_points)
    u2 = rng.uniform(0, 1, n_points)
    su = np.sqrt(u1)
    b0 = 1.0 - su
    b1 = u2 * su
    pts = v0[pick] + b0[:, None] * e1[pick] + b1[:, None] * e2[pick]
    n = np.cross(e1[pick], e2[pick])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    pt_area = np.full(n_points, total_area / n_points, np.float32)
    mat = tri_mat[idx][pick]
    return (
        pts.astype(np.float32),
        n.astype(np.float32),
        pt_area,
        mat.astype(np.int32),
    )


def compute_irradiance(built, points, normals, seed=0, n_samples=4):
    """Batched direct-light irradiance at the surface points
    (reference: dipolesubsurface.cpp:210-247). One NEE pass per sample."""
    from pbrt_tpu.integrators.path import _shadow_unoccluded

    scene = built.scene
    lt = scene.lights
    N = points.shape[0]
    S = scene.materials.kd.shape[-1]
    p = jnp.asarray(points)
    n = jnp.asarray(normals)
    keys = rngmod.pixel_sample_key(
        rngmod.root_key(seed + 31), jnp.arange(N), jnp.zeros(N, jnp.int32)
    )
    n_lights = max(lt.count, 1)
    E = jnp.zeros((N, S))
    for s in range(n_samples):
        k = rngmod.bounce_key(keys, s, rngmod.LIGHT_SAMPLE)
        u = rngmod.uniform_per(k, 3)
        li = jnp.minimum((u[:, 0] * n_lights).astype(jnp.int32), n_lights - 1)
        ls = lights_mod.sample_li(lt, scene.geometry, li, p, u[:, 1], u[:, 2])
        # |cosθ|: light entering either side feeds the diffusion dipole
        # (the reference's dart-thrown points get normals faceforwarded to
        # the arrival direction — same effect)
        cos_i = jnp.abs(geom.dot(ls.wi, n))
        vis = _shadow_unoccluded(
            scene.geometry, p, geom.face_forward(n, ls.wi), ls.wi, ls.dist,
            jnp.full((N,), 1e-3),
        )
        contrib = ls.L * (cos_i * vis / jnp.maximum(ls.pdf, 1e-12))[:, None]
        E = E + jnp.where((ls.pdf > 0)[:, None], contrib, 0.0) * n_lights
    return E / n_samples


def prepare_subsurface(built, seed=0, pointsfile: str | None = None):
    """Full preprocess (the reference's Preprocess phase). Returns
    SubsurfaceData or None.

    ``pointsfile``: reuse a point set written by Renderer "surfacepoints"
    instead of sampling (reference: dipolesubsurface.cpp reads the
    ``pointsfile`` param through FindPoissonPointDistribution's cache)."""
    import os

    if pointsfile and os.path.exists(pointsfile):
        from pbrt_tpu.renderers.surface_points import read_points_file

        pts, normals, areas, _eps = read_points_file(pointsfile)
        if len(pts) == 0:
            return None
        mat = np.zeros(len(pts), np.int32)
        E = compute_irradiance(built, pts, normals, seed=seed)
        return SubsurfaceData(
            points=jnp.asarray(pts),
            normals=jnp.asarray(normals),
            areas=jnp.asarray(areas),
            E=jnp.asarray(E),
            material=jnp.asarray(mat),
        )
    sampled = sample_surface_points(built, seed=seed)
    if sampled is None:
        return None
    pts, normals, areas, mat = sampled
    E = compute_irradiance(built, pts, normals, seed=seed)
    return SubsurfaceData(
        points=jnp.asarray(pts),
        normals=jnp.asarray(normals),
        areas=jnp.asarray(areas),
        E=jnp.asarray(E),
        material=jnp.asarray(mat),
    )


def mo_gather(ss: SubsurfaceData, mt, p, mat_idx):
    """Mo(p) = Σ_i Rd(|p−p_i|²)·E_i·A_i — dense chunked reduction
    (replaces SubsurfaceOctreeNode::Mo, dipolesubsurface.cpp:41-131).

    p: (R, 3) shading points; mat_idx (R,) for per-lane scattering params.
    Returns (R, S)."""
    R = p.shape[0]
    S = ss.E.shape[-1]
    mi = jnp.maximum(mat_idx, 0)
    sigma_a = mt.ss_sigma_a[mi]
    sigma_s = mt.ss_sigma_s[mi]
    eta = mt.eta[mi][:, None]
    N = ss.points.shape[0]
    n_chunks = (N + CHUNK - 1) // CHUNK

    def chunk_body(c, acc):
        start = c * CHUNK
        pts = jax.lax.dynamic_slice_in_dim(ss.points, start, CHUNK, 0)
        E = jax.lax.dynamic_slice_in_dim(ss.E, start, CHUNK, 0)
        A = jax.lax.dynamic_slice_in_dim(ss.areas, start, CHUNK, 0)
        idx = start + jnp.arange(CHUNK)
        valid = (idx < N).astype(jnp.float32)
        # (R, C) squared distances
        d2 = (
            jnp.sum(p * p, -1, keepdims=True)
            - 2.0 * p @ pts.T
            + jnp.sum(pts * pts, -1)[None, :]
        )
        d2 = jnp.maximum(d2, 0.0)
        # Rd per (lane, point, bin): too big — use per-lane params with the
        # chunk distance matrix, contracting over points per bin
        rd = diffusion_rd(
            d2, sigma_a[:, None, :], sigma_s[:, None, :], eta[:, None, :]
        )  # (R, C, S)
        contrib = jnp.einsum("rcs,cs->rs", rd, E * (A * valid)[:, None])
        return acc + contrib

    acc = jnp.zeros((R, S))
    acc = jax.lax.fori_loop(0, n_chunks, chunk_body, acc)
    return acc
