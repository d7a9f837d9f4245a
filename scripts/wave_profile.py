"""Decompose one render wave of the killeroo bench into component costs."""

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
from pbrt_tpu.film import film as film_mod

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"
R = 1 << 15


def main():
    print("rtt:", rtt() * 1e3, "ms", flush=True)
    built = build(load_scene(KILLEROO))
    built.integrator = IntegratorConfig(kind="path", max_depth=5, n_bins=32)
    scene = built.scene
    cam = built.camera
    res = 512
    idx = np.arange(R, dtype=np.int32) % (res * res)
    ys, xs = np.divmod(idx, res)
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    root = rngmod.root_key(0)
    keys = rngmod.pixel_sample_key(root, ys * res + xs, jnp.int32(0))
    u = rngmod.uniform_per(keys, 5)

    gen = jax.jit(lambda xs, ys, u: cam.generate_rays(
        xs.astype(jnp.float32) + u[:, 0], ys.astype(jnp.float32) + u[:, 1],
        u[:, 2], u[:, 3], u[:, 4]))
    t = tbench(gen, xs, ys, u, label="camera ray gen")
    rays = gen(xs, ys, u)

    f_closest = jax.jit(lambda g, r: intersect(g, r, any_hit=False))
    tbench(f_closest, scene.geometry, rays, label="intersect closest x1")
    f_any = jax.jit(lambda g, r: intersect(g, r, any_hit=True))
    tbench(f_any, scene.geometry, rays, label="intersect any x1")

    for depth in (1, 2, 5):
        icfg = dataclasses.replace(built.integrator, max_depth=depth)
        f = jax.jit(lambda s, r, k: trace_radiance(s, r, k, icfg))
        tbench(f, scene, rays, keys, label=f"trace_radiance depth={depth}")

    # film add
    cfg = dataclasses.replace(built.film_config, xres=res, yres=res)
    state = film_mod.init_film(cfg)
    table = jnp.asarray(built.filter_table)
    L = jnp.ones((R, 32), jnp.float32)
    px = xs.astype(jnp.float32)
    py = ys.astype(jnp.float32)
    f_film = jax.jit(lambda st, px, py, L: film_mod.add_samples(
        st, cfg, px, py, L, jnp.zeros(R), table))
    tbench(f_film, state, px, py, L, label="film add_samples")


if __name__ == "__main__":
    main()
