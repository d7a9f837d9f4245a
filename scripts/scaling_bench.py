"""Multi-device scaling efficiency on the virtual CPU mesh.

SURVEY §2.8 / BASELINE north-star: 1→N device scaling efficiency of the
sharded render step (>80% target). Real multi-chip hardware is not
available in this environment, so the mesh is
``xla_force_host_platform_device_count`` virtual CPU devices — this
measures the sharding/collective structure (shard_map + psum film merge),
not ICI bandwidth; compute scales with the host's cores, so the meaningful
check on a 2-core box is that per-device WORK divides (the wave is evenly
sharded and the psum merge stays a constant overhead), reported as
work-scaling below. Run on a pod for wall-clock efficiency.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/scaling_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.film import film as film_mod
from pbrt_tpu.parallel.shard import make_mesh, _render_wave_sharded_jit
from pbrt_tpu.integrators.path import IntegratorConfig
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build


def scene_text(res):
    return f"""
    LookAt 0 1.5 -5  0 0 0  0 1 0
    Camera "perspective" "float fov" [45]
    Film "image" "integer xresolution" [{res}] "integer yresolution" [{res}]
    Sampler "lowdiscrepancy" "integer pixelsamples" [2]
    SurfaceIntegrator "path" "integer maxdepth" [4]
    WorldBegin
    AttributeBegin
      Translate 0 4 0
      AreaLightSource "area" "rgb L" [12 12 12]
      Material "matte" "color Kd" [0 0 0]
      Shape "sphere" "float radius" [.6]
    AttributeEnd
    Material "matte" "color Kd" [.6 .6 .6]
    Shape "trianglemesh" "point P" [-20 -1 -20  20 -1 -20  20 -1 20  -20 -1 20]
      "integer indices" [0 1 2 2 3 0]
    AttributeBegin
      Material "plastic" "color Kd" [.4 .2 .2] "color Ks" [.5 .5 .5]
        "float roughness" [.05]
      Shape "sphere" "float radius" [1]
    AttributeEnd
    WorldEnd
    """


def main():
    res = int(os.environ.get("SCALE_RES", "64"))
    built = build(load_scene_string(scene_text(res)))
    built.integrator = IntegratorConfig(kind="path", max_depth=4, n_bins=32)
    cfg = built.film_config
    table = jnp.asarray(built.filter_table)
    root = rngmod.root_key(0)
    ys, xs = np.divmod(np.arange(res * res, dtype=np.int32), res)
    n_cores = os.cpu_count()
    print(f"devices={len(jax.devices())} host_cores={n_cores} res={res}")
    results = {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        film = film_mod.init_film(cfg)
        args = (
            film, built.scene, built.camera, table,
            jnp.asarray(xs), jnp.asarray(ys),
            jnp.int32(0), root, built.integrator, built.sampler_name,
            2, cfg, jnp.ones((res * res,), jnp.float32),
        )
        out = _render_wave_sharded_jit(mesh, *args)
        jax.block_until_ready(out.pixels)
        t0 = time.perf_counter()
        reps = 3
        for k in range(reps):
            out = _render_wave_sharded_jit(mesh, *args)
        jax.block_until_ready(out.pixels)
        dt = (time.perf_counter() - t0) / reps
        results[n] = dt
        print(f"n={n}: {dt*1e3:8.1f} ms/wave")
    t1 = results[1]
    print("\nwall-clock speedup vs 1 device (virtual mesh on "
          f"{n_cores} physical cores — compute-bound above n={n_cores}):")
    for n, dt in results.items():
        su = t1 / dt
        print(f"  n={n}: speedup {su:4.2f}  efficiency {su/min(n, n_cores)*100:5.1f}%"
              f" (vs min(n, cores))")


if __name__ == "__main__":
    main()
