"""Op-level profile of one full bench wave: trace with jax.profiler, then
parse the xplane proto for the top device ops by self time."""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import dataclasses

from pbrt_tpu.scene.api import load_scene
from pbrt_tpu.scene.builder import build
from pbrt_tpu.integrators.path import trace_radiance, IntegratorConfig
from pbrt_tpu.core import rng as rngmod

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"
R = 1 << 15
TRACE_DIR = "/tmp/jaxtrace"


def main():
    built = build(load_scene(KILLEROO))
    built.integrator = IntegratorConfig(kind="path", max_depth=5, n_bins=32)
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
    f = jax.jit(lambda s, r, k: trace_radiance(s, r, k, built.integrator))
    out = f(scene, rays, keys)
    jax.block_until_ready(out)
    np.asarray(out[0])[:1]

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            out = f(scene, rays, keys)
        jax.block_until_ready(out)
        np.asarray(out[0])[:1]

    # parse xplane directly (XSpace proto)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(files[0], "rb").read())
    from collections import defaultdict

    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = defaultdict(int)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps
                cnt[name] += 1
        items = sorted(tot.items(), key=lambda kv: -kv[1])
        total = sum(tot.values())
        print(f"\n=== plane {plane.name}: total {total/1e12*1e3:.2f} ms over "
              f"{len(items)} distinct ops ===")
        shown = 0
        for name, t in items:
            if "copy-start" in name or "copy-done" in name:
                continue
            print(f"{t/1e12*1e3/3:9.3f} ms  x{cnt[name]:<5d} {name[:130]}")
            shown += 1
            if shown >= 45:
                break


if __name__ == "__main__":
    main()
