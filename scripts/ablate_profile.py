"""Ablation timing of the bounce loop: what does each stage really cost
in the fused wave (not as isolated dispatches)?"""
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
from pbrt_tpu.integrators.path import trace_radiance, IntegratorConfig
from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.integrators import path as path_mod

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"
R = 1 << 15


def main():
    print("rtt:", rtt() * 1e3, "ms", flush=True)
    built = build(load_scene(KILLEROO))
    icfg = IntegratorConfig(kind="path", max_depth=5, n_bins=32)
    scene = built.scene
    cam = built.camera
    res = 512
    idx = np.arange(R, dtype=np.int32) % (res * res)
    ys, xs = np.divmod(idx, res)
    root = rngmod.root_key(0)
    keys = rngmod.pixel_sample_key(root, jnp.asarray(ys * res + xs), jnp.int32(0))
    u = rngmod.uniform_per(keys, 5)
    rays = cam.generate_rays(jnp.asarray(xs, jnp.float32) + u[:, 0],
                             jnp.asarray(ys, jnp.float32) + u[:, 1],
                             u[:, 2], u[:, 3], u[:, 4])

    f = jax.jit(lambda s, r, k: trace_radiance(s, r, k, icfg))
    t_full = tbench(f, scene, rays, keys, label="full depth=5")

    # ablate NEE (monkeypatch)
    orig_nee = path_mod._nee_one_light
    path_mod._nee_one_light = lambda *a, **k: jnp.zeros(
        (R, 32), jnp.float32
    )
    f2 = jax.jit(lambda s, r, k: trace_radiance(s, r, k, icfg))
    t_nonee = tbench(f2, scene, rays, keys, label="no NEE (no shadow/light)")
    path_mod._nee_one_light = orig_nee

    # ablate shadow ray only
    orig_sh = path_mod._shadow_unoccluded
    path_mod._shadow_unoccluded = lambda g, p, n, w, d, e: jnp.ones(
        p.shape[:-1], bool
    )
    f3 = jax.jit(lambda s, r, k: trace_radiance(s, r, k, icfg))
    t_nosh = tbench(f3, scene, rays, keys, label="no shadow traversal")
    path_mod._shadow_unoccluded = orig_sh

    print(f"NEE total (incl shadow): {(t_full-t_nonee)*1e3:.2f} ms")
    print(f"shadow traversal only  : {(t_full-t_nosh)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
