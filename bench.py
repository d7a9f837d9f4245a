"""Benchmark: rays/sec/chip on the BASELINE north-star config —
killeroo-simple at 512², path integrator, 32-bin spectral accumulation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is vs. the value recorded in BASELINE_LOCAL (our own best
previous measurement; the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

# Previous-round local baseline (camera paths/sec/chip); update as perf improves.
BASELINE_LOCAL = 1.0e6

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"


def main():
    import jax

    # persistent compile cache: TPU (remote) compiles of the full wavefront
    # kernel are slow; cache them across bench runs
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pbrt_tpu.film import film as film_mod
    from pbrt_tpu.renderers.sampler import _render_wave_jit
    from pbrt_tpu.core import rng as rngmod
    from pbrt_tpu.scene.api import load_scene
    from pbrt_tpu.scene.builder import build
    import numpy as np

    res = int(os.environ.get("BENCH_RES", "512"))
    waves = int(os.environ.get("BENCH_WAVES", "4"))

    desc = load_scene(KILLEROO)
    # north-star config: path integrator at 512²
    from pbrt_tpu.integrators.path import IntegratorConfig

    built = build(desc)
    built.film_config = dataclasses.replace(
        built.film_config, xres=res, yres=res
    )
    built.integrator = IntegratorConfig(kind="path", max_depth=5, n_bins=32)

    cfg = built.film_config
    # 1<<16-ray waves exceed the axon backend's per-program memory envelope
    # (worker hard-crash); 1<<15 is the validated maximum
    chunk = int(os.environ.get("BENCH_CHUNK", str(1 << 15)))
    ys, xs = np.divmod(np.arange(res * res, dtype=np.int32), res)
    root = rngmod.root_key(0)
    table = jnp.asarray(built.filter_table)
    film_state = film_mod.init_film(cfg)
    n_chunks = max(1, (res * res) // chunk)
    chunk = res * res // n_chunks

    def wave(state, s):
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            state = _render_wave_jit(
                state, built.scene, built.camera, table,
                jnp.asarray(xs[sl]), jnp.asarray(ys[sl]),
                jnp.int32(s), root, built.integrator, built.sampler_name,
                waves, cfg,
            )
        return state

    # warmup / compile
    film_state = wave(film_state, 0)
    jax.block_until_ready(film_state.pixels)
    t0 = time.perf_counter()
    for s in range(1, waves + 1):
        film_state = wave(film_state, s)
    jax.block_until_ready(film_state.pixels)
    dt = time.perf_counter() - t0

    paths_per_sec = res * res * waves / dt
    print(
        json.dumps(
            {
                "metric": "camera_paths_per_sec_per_chip_killeroo512_path_spectral32",
                "value": round(paths_per_sec, 1),
                "unit": "paths/s",
                "vs_baseline": round(paths_per_sec / BASELINE_LOCAL, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
