"""Participating media: volume regions + the volume integrators.

Reference: src/volumes/ — homogeneous, exponential density, volumegrid
(trilinear 3D float grid), and the fork's water volume (absorption/
scattering curves from files, water.h:20, registered api.cpp:542-543) —
over the VolumeRegion interface (core/volume.{h,cpp}: sigma_a/sigma_s/
sigma_t/Lve/p/tau) and the volume integrators src/integrators/
{emission,single}.cpp (ray-marched tau and single scattering).

TPU-native design: all regions live in one ``VolumeTable``; densities are
evaluated batched; ``tau`` is a fixed-step ray march (lax-friendly static
step count) — the reference marches with user ``stepsize`` + jittered
offset (emission.cpp:49-66), we match that with a per-ray jitter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.utils import pytree_dataclass, static_field

HOMOGENEOUS, EXPONENTIAL, VOLUMEGRID, WATER = range(4)

TAU_STEPS = 32  # fixed march steps per segment


@pytree_dataclass
class VolumeTable:
    kind: jnp.ndarray  # (V,)
    w2v: jnp.ndarray  # (V, 4, 4) world → volume space
    lo: jnp.ndarray  # (V, 3) volume-space bounds
    hi: jnp.ndarray  # (V, 3)
    sigma_a: jnp.ndarray  # (V, S)
    sigma_s: jnp.ndarray  # (V, S)
    le: jnp.ndarray  # (V, S) emission
    g: jnp.ndarray  # (V,) HG asymmetry
    # exponential: d(p) = a·e^(−b·h), h = height along updir (exponential.h)
    exp_a: jnp.ndarray  # (V,)
    exp_b: jnp.ndarray  # (V,)
    updir: jnp.ndarray  # (V, 3)
    # grid densities in one pool
    grid_offset: jnp.ndarray  # (V,) -1 = none
    grid_n: jnp.ndarray  # (V, 3) nx, ny, nz
    pool: jnp.ndarray  # (P,) density values

    @property
    def count(self) -> int:
        return self.kind.shape[0]


def _density_one(vt: VolumeTable, v, p_world):
    """Density multiplier at world point p for region v (scalar lane)."""
    w2v = vt.w2v[v]
    p = p_world @ w2v[:3, :3].T + w2v[:3, 3]
    inside = jnp.all((p >= vt.lo[v]) & (p <= vt.hi[v]))

    def homog():
        return jnp.float32(1.0)

    def expo():
        h = jnp.dot(p - vt.lo[v], vt.updir[v])
        return vt.exp_a[v] * jnp.exp(-vt.exp_b[v] * h)

    def grid():
        n = vt.grid_n[v]
        ext = jnp.maximum(vt.hi[v] - vt.lo[v], 1e-9)
        q = (p - vt.lo[v]) / ext * n.astype(p.dtype) - 0.5
        qi = jnp.floor(q).astype(jnp.int32)
        d = q - qi
        off = jnp.maximum(vt.grid_offset[v], 0)

        def at(ix, iy, iz):
            ix = jnp.clip(ix, 0, n[0] - 1)
            iy = jnp.clip(iy, 0, n[1] - 1)
            iz = jnp.clip(iz, 0, n[2] - 1)
            return vt.pool[off + (iz * n[1] + iy) * n[0] + ix]

        x0, y0, z0 = qi[0], qi[1], qi[2]
        c = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = (
                        (d[0] if dx else 1 - d[0])
                        * (d[1] if dy else 1 - d[1])
                        * (d[2] if dz else 1 - d[2])
                    )
                    c = c + w * at(x0 + dx, y0 + dy, z0 + dz)
        return c

    dens = jax.lax.switch(
        jnp.clip(vt.kind[v], 0, 3), [homog, expo, grid, homog]
    )
    return jnp.where(inside, dens, 0.0)


def sigma_t(vt: VolumeTable, p_world):
    """Σ over regions of (σa+σs)·density at p. p_world (R, 3) → (R, S)."""
    S = vt.sigma_a.shape[-1]
    R = p_world.shape[0]
    total = jnp.zeros((R, S))
    for v in range(vt.count):
        dens = jax.vmap(lambda p: _density_one(vt, v, p))(p_world)
        total = total + dens[:, None] * (vt.sigma_a[v] + vt.sigma_s[v])
    return total


def sigma_s_at(vt: VolumeTable, p_world):
    S = vt.sigma_a.shape[-1]
    R = p_world.shape[0]
    total = jnp.zeros((R, S))
    for v in range(vt.count):
        dens = jax.vmap(lambda p: _density_one(vt, v, p))(p_world)
        total = total + dens[:, None] * vt.sigma_s[v]
    return total


def emission_at(vt: VolumeTable, p_world):
    S = vt.sigma_a.shape[-1]
    R = p_world.shape[0]
    total = jnp.zeros((R, S))
    for v in range(vt.count):
        dens = jax.vmap(lambda p: _density_one(vt, v, p))(p_world)
        total = total + dens[:, None] * vt.le[v]
    return total


def tau(vt: VolumeTable, o, d, t0, t1, u_jitter):
    """Optical thickness along [t0, t1] of ray (o, d): fixed-step march with
    jittered offset (reference: VolumeRegion::tau via emission.cpp:49-66).
    Returns (R, S)."""
    seg = jnp.maximum(t1 - t0, 0.0)
    dt = seg / TAU_STEPS
    S = vt.sigma_a.shape[-1]
    R = o.shape[0]
    total = jnp.zeros((R, S))
    for k in range(TAU_STEPS):
        t = t0 + (k + u_jitter) * dt
        p = o + t[:, None] * d
        total = total + sigma_t(vt, p) * dt[:, None]
    return total


def transmittance(vt: VolumeTable, o, d, t0, t1, u_jitter):
    """e^{−τ} (reference: EmissionIntegrator::Transmittance)."""
    if vt.count == 0:
        R = o.shape[0]
        return jnp.ones((R, vt.sigma_a.shape[-1]))
    return jnp.exp(-tau(vt, o, d, t0, t1, u_jitter))


def integrate_emission(vt: VolumeTable, o, d, t0, t1, u_jitter):
    """Emission-only volume integrator: ∫ Tr·(Lve) dt
    (reference: integrators/emission.cpp:68-115). Returns (Lv (R,S), Tr)."""
    S = vt.sigma_a.shape[-1]
    R = o.shape[0]
    if vt.count == 0:
        return jnp.zeros((R, S)), jnp.ones((R, S))
    seg = jnp.maximum(t1 - t0, 0.0)
    dt = seg / TAU_STEPS
    Lv = jnp.zeros((R, S))
    tr = jnp.ones((R, S))
    for k in range(TAU_STEPS):
        t = t0 + (k + u_jitter) * dt
        p = o + t[:, None] * d
        st = sigma_t(vt, p)
        tr = tr * jnp.exp(-st * dt[:, None])
        Lv = Lv + tr * emission_at(vt, p) * dt[:, None]
    return Lv, tr


def integrate_single_scattering(
    vt: VolumeTable, scene, o, d, t0, t1, keys, bounce
):
    """Single scattering: emission + in-scattered direct light with the HG
    phase function (reference: integrators/single.cpp:70-160).
    Returns (Lv (R,S), Tr (R,S))."""
    from pbrt_tpu.core import rng as rngmod
    from pbrt_tpu.lights import table as lights_mod
    from pbrt_tpu.integrators.path import _shadow_unoccluded

    S = vt.sigma_a.shape[-1]
    R = o.shape[0]
    if vt.count == 0:
        return jnp.zeros((R, S)), jnp.ones((R, S))
    lt = scene.lights
    n_lights = max(lt.count, 1)
    k_v = rngmod.bounce_key(keys, bounce, rngmod.VOLUME)
    u = rngmod.uniform_per(k_v, 3)
    u_jitter = u[:, 0]
    seg = jnp.maximum(t1 - t0, 0.0)
    dt = seg / TAU_STEPS
    Lv = jnp.zeros((R, S))
    tr = jnp.ones((R, S))
    g_mean = vt.g.mean()
    for k in range(TAU_STEPS):
        t = t0 + (k + u_jitter) * dt
        p = o + t[:, None] * d
        st = sigma_t(vt, p)
        tr = tr * jnp.exp(-st * dt[:, None])
        Lv = Lv + tr * emission_at(vt, p) * dt[:, None]
        # in-scattering: one light sample per step (reference single.cpp:118)
        if lt.count > 0:
            k_s = rngmod.bounce_key(k_v, k, rngmod.LIGHT_SAMPLE)
            us = rngmod.uniform_per(k_s, 3)
            li = jnp.minimum((us[:, 0] * n_lights).astype(jnp.int32), n_lights - 1)
            ls = lights_mod.sample_li(lt, scene.geometry, li, p, us[:, 1], us[:, 2])
            vis = _shadow_unoccluded(
                scene.geometry, p, -d, ls.wi, ls.dist,
                jnp.full((R,), 1e-4),
            )
            cos_theta = geom.dot(-d, ls.wi)
            phase = smp.hg_pdf(cos_theta, g_mean)
            ss = sigma_s_at(vt, p)
            contrib = (
                ss * ls.L * tr
                * (phase * vis / jnp.maximum(ls.pdf, 1e-12))[:, None]
                * dt[:, None] * n_lights
            )
            Lv = Lv + jnp.where(jnp.any(ss > 0, -1)[:, None], contrib, 0.0)
    return Lv, tr


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------


def build_volume_table(volume_records, config) -> VolumeTable:
    """From scene VolumeRecords (reference: Create*VolumeRegion factories)."""
    S = config.n_bins
    V = len(volume_records)
    rows = []
    pool = [np.zeros(1, np.float32)]
    for rec in volume_records:
        p = rec.params
        kind = {
            "homogeneous": HOMOGENEOUS,
            "exponential": EXPONENTIAL,
            "volumegrid": VOLUMEGRID,
            "water": WATER,
        }.get(rec.volume_type, HOMOGENEOUS)
        row = dict(
            kind=kind,
            w2v=np.linalg.inv(rec.volume_to_world),
            lo=p.find_one_point("p0", (0, 0, 0)),
            hi=p.find_one_point("p1", (1, 1, 1)),
            sigma_a=p.find_one_spectrum("sigma_a", 1.0),
            sigma_s=p.find_one_spectrum("sigma_s", 1.0),
            le=p.find_one_spectrum("Le", 0.0),
            g=p.find_one_float("g", 0.0),
            exp_a=p.find_one_float("a", 1.0),
            exp_b=p.find_one_float("b", 1.0),
            updir=p.find_one_vector("updir", (0, 1, 0)),
            grid_offset=-1,
            grid_n=(0, 0, 0),
        )
        if kind == WATER:
            # fork water volume: absorption/scattering curves from files
            absf = p.find_one_filename("absorptionCurveFile", "")
            vsf = p.find_one_filename("phaseFunctionFile", "")
            if absf:
                from pbrt_tpu.scene.paramset import load_spd

                try:
                    row["sigma_a"] = load_spd(absf, config)
                except Exception:
                    pass
        if kind == VOLUMEGRID:
            dens = p.find_floats("density")
            nx = p.find_one_int("nx", 1)
            ny = p.find_one_int("ny", 1)
            nz = p.find_one_int("nz", 1)
            if dens is not None and len(dens) == nx * ny * nz:
                row["grid_offset"] = sum(len(x) for x in pool)
                row["grid_n"] = (nx, ny, nz)
                pool.append(np.asarray(dens, np.float32))
        rows.append(row)
    if not rows:
        rows = [dict(kind=HOMOGENEOUS, w2v=np.eye(4), lo=(0, 0, 0), hi=(-1, -1, -1),
                     sigma_a=np.zeros(S), sigma_s=np.zeros(S), le=np.zeros(S),
                     g=0.0, exp_a=0.0, exp_b=0.0, updir=(0, 1, 0),
                     grid_offset=-1, grid_n=(0, 0, 0))]
        V = 0
    f32 = lambda k2: jnp.asarray(np.asarray([r[k2] for r in rows], np.float32))
    i32 = lambda k2: jnp.asarray(np.asarray([r[k2] for r in rows], np.int32))
    vt = VolumeTable(
        kind=i32("kind"), w2v=f32("w2v"), lo=f32("lo"), hi=f32("hi"),
        sigma_a=f32("sigma_a"), sigma_s=f32("sigma_s"), le=f32("le"),
        g=f32("g"), exp_a=f32("exp_a"), exp_b=f32("exp_b"), updir=f32("updir"),
        grid_offset=i32("grid_offset"), grid_n=i32("grid_n"),
        pool=jnp.asarray(np.concatenate(pool)),
    )
    # store actual region count via a shape trick: empty scenes get V=0 rows
    if V == 0:
        import dataclasses

        vt = dataclasses.replace(
            vt, kind=vt.kind[:0], w2v=vt.w2v[:0], lo=vt.lo[:0], hi=vt.hi[:0],
            sigma_a=vt.sigma_a[:0], sigma_s=vt.sigma_s[:0], le=vt.le[:0],
            g=vt.g[:0], exp_a=vt.exp_a[:0], exp_b=vt.exp_b[:0],
            updir=vt.updir[:0], grid_offset=vt.grid_offset[:0],
            grid_n=vt.grid_n[:0],
        )
    return vt
