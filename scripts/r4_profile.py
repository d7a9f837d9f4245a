"""Round-4 perf triage: trustworthy (fetch-synced) timings of the bench
hot path — coherent vs incoherent traversal, shading stages, loop costs."""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.tpu_timing import tbench, rtt
from pbrt_tpu.scene.api import load_scene
from pbrt_tpu.scene.builder import build
from pbrt_tpu.accel.intersect import intersect
from pbrt_tpu.integrators.path import trace_radiance, IntegratorConfig
from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core import geometry as geom

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"
R = 1 << 15


def main():
    print("rtt:", rtt() * 1e3, "ms", flush=True)

    # sanity: MXU matmul with real sync (v5e peak ~197 TFLOP/s bf16)
    a = jnp.asarray(np.random.default_rng(0).random((4096, 4096)), jnp.bfloat16)
    f_mm = jax.jit(lambda a: (a @ a).astype(jnp.float32))
    t = tbench(f_mm, a, label="4096^3 bf16 matmul")
    print(f"  -> {2*4096**3/t/1e12:.1f} TFLOP/s")

    built = build(load_scene(KILLEROO))
    built.integrator = IntegratorConfig(kind="path", max_depth=5, n_bins=32)
    scene = built.scene
    g = scene.geometry
    print("tris:", g.num_triangles, "wide rows:", g.wide_rows.shape)
    cam = built.camera
    res = 512
    idx = np.arange(R, dtype=np.int32) % (res * res)
    ys, xs = np.divmod(idx, res)
    xs, ys = jnp.asarray(xs), jnp.asarray(ys)
    root = rngmod.root_key(0)
    keys = rngmod.pixel_sample_key(root, ys * res + xs, jnp.int32(0))
    u = rngmod.uniform_per(keys, 5)
    rays = cam.generate_rays(xs.astype(jnp.float32) + u[:, 0],
                             ys.astype(jnp.float32) + u[:, 1],
                             u[:, 2], u[:, 3], u[:, 4], keys=keys)

    f_closest = jax.jit(lambda g, r: intersect(g, r, any_hit=False).t.sum())
    tbench(f_closest, g, rays, label="intersect coherent(primary)")

    # incoherent rays: origins at hit points, directions uniform-sphere
    hit = intersect(g, rays)
    p = rays.origin + hit.t[:, None] * rays.direction
    rng = np.random.default_rng(0)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays_inc = geom.Ray(
        origin=jnp.where(hit.valid[:, None], p, rays.origin),
        direction=jnp.asarray(d),
        tmin=jnp.full((R,), 1e-3, jnp.float32),
        tmax=jnp.full((R,), 1e30, jnp.float32),
        time=rays.time, wavelength=rays.wavelength,
    )
    tbench(f_closest, g, rays_inc, label="intersect incoherent")
    f_any = jax.jit(lambda g, r: intersect(g, r, any_hit=True).t.sum())
    tbench(f_any, g, rays_inc, label="intersect any incoherent")

    for depth in (1, 2, 5):
        icfg = dataclasses.replace(built.integrator, max_depth=depth)
        f = jax.jit(lambda s, r, k: trace_radiance(s, r, k, icfg)[0].sum())
        tbench(f, scene, rays, keys, label=f"trace_radiance depth={depth}")


if __name__ == "__main__":
    main()
