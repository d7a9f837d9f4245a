"""Radiance probes: CreateRadianceProbes renderer + useprobes integrator
support.

Reference: src/renderers/createprobes.{h,cpp} (336 LoC) — renders SH
incident-radiance probes on a 3D grid over the scene bbox and writes a text
probe file; src/integrators/useprobes.{h,cpp} interpolates them trilinearly
at shading points and dots with the cosine-convolved BSDF.

TPU-native design: all probe positions × directions are one batched
radiance evaluation (trace_radiance wavefront) followed by one SH
projection matmul.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.core import sh as sh_mod
from pbrt_tpu.core.geometry import Ray
from pbrt_tpu.integrators.path import trace_radiance


def create_probes(built, lmax=4, nprobes=(4, 4, 4), nindir=64, seed=0,
                  filename=None, verbose=True):
    """Render the probe grid and optionally write the probe file
    (reference: CreateRadProbes::Render, createprobes.cpp)."""
    scene = built.scene
    g = scene.geometry
    lo = np.asarray(g.world_lo)
    hi = np.asarray(g.world_hi)
    nx, ny, nz = nprobes
    xs = lo[0] + (np.arange(nx) + 0.5) / nx * (hi[0] - lo[0])
    ys = lo[1] + (np.arange(ny) + 0.5) / ny * (hi[1] - lo[1])
    zs = lo[2] + (np.arange(nz) + 0.5) / nz * (hi[2] - lo[2])
    centers = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3)
    P = len(centers)
    # directions: shared uniform-sphere set per probe
    rngk = rngmod.root_key(seed)
    import jax

    u = jax.random.uniform(rngk, (nindir, 2))
    w = smp.uniform_sample_sphere(u[:, 0], u[:, 1])  # (D, 3)
    origins = jnp.repeat(jnp.asarray(centers, jnp.float32), nindir, axis=0)
    dirs = jnp.tile(w, (P, 1))
    rays = Ray.make(origins, dirs)
    keys = rngmod.pixel_sample_key(
        rngmod.root_key(seed + 5), jnp.arange(P * nindir),
        jnp.zeros(P * nindir, jnp.int32),
    )
    L, _ = trace_radiance(scene, rays, keys, built.integrator)
    S = L.shape[-1]
    terms = sh_mod.sh_terms(lmax)
    coeffs = np.zeros((P, terms, S), np.float32)
    basis = sh_mod.sh_evaluate(w, lmax)  # (D, terms)
    Lr = np.asarray(L).reshape(P, nindir, S)
    for p in range(P):
        coeffs[p] = np.asarray(
            basis.T @ jnp.asarray(Lr[p]) * (4.0 * np.pi / nindir)
        )
    if filename:
        with open(filename, "w") as f:
            # text format mirroring the reference's probe file: lmax,
            # includeDirect/Indirect flags, bbox, grid dims, then coeffs
            f.write(f"{lmax} 1 1\n")
            f.write(" ".join(str(v) for v in lo) + " "
                    + " ".join(str(v) for v in hi) + "\n")
            f.write(f"{nx} {ny} {nz}\n")
            for p in range(P):
                for t in range(terms):
                    f.write(" ".join(f"{v:g}" for v in coeffs[p, t]) + "\n")
    return centers, coeffs


def read_probe_file(path: str, n_bins: int):
    with open(path) as f:
        lmax, _, _ = (int(x) for x in f.readline().split())
        bounds = [float(x) for x in f.readline().split()]
        nx, ny, nz = (int(x) for x in f.readline().split())
        terms = sh_mod.sh_terms(lmax)
        P = nx * ny * nz
        coeffs = np.zeros((P, terms, n_bins), np.float32)
        for p in range(P):
            for t in range(terms):
                coeffs[p, t] = [float(x) for x in f.readline().split()]
    return lmax, np.asarray(bounds[:3]), np.asarray(bounds[3:]), (nx, ny, nz), coeffs
