import sys, time, dataclasses
import numpy as np, jax, jax.numpy as jnp

mode = sys.argv[1] if len(sys.argv) > 1 else "killeroo"
from pbrt_tpu.accel.intersect import intersect
from pbrt_tpu.core import geometry as geom

if mode == "soup":
    # synthetic 45k-tri soup, no materials — pure traversal
    from tests.test_intersect import make_geometry
    rng = np.random.default_rng(1)
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 45000
    centers = rng.uniform(-1, 1, (n, 1, 3))
    tris = centers + rng.uniform(-0.03, 0.03, (n, 3, 3))
    g = make_geometry(tris=tris)
    o = rng.uniform(-2, 2, (1024, 3)).astype(np.float32)
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = geom.Ray.make(jnp.asarray(o), jnp.asarray(d))
    print("compile+run intersect...", flush=True)
    t0 = time.time()
    h = intersect(g, ray)
    jax.block_until_ready(h.t)
    print("OK", time.time()-t0, "s; hits:", int(h.valid.sum()), flush=True)
else:
    from pbrt_tpu.scene.api import load_scene
    from pbrt_tpu.scene.builder import build
    desc = load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    built = build(desc)
    g = built.scene.geometry
    print("scene:", g.num_triangles, "tris", g.num_quadrics, "quads", flush=True)
    rng = np.random.default_rng(1)
    # rays from the camera position toward the scene
    o = np.tile(np.array([[150., 120., 20.]], np.float32), (1024, 1))
    tgt = rng.uniform(-100, 100, (1024, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = geom.Ray.make(jnp.asarray(o), jnp.asarray(d))
    print("compile+run intersect only...", flush=True)
    t0 = time.time()
    h = intersect(g, ray)
    jax.block_until_ready(h.t)
    print("intersect OK", time.time()-t0, "s; hits:", int(h.valid.sum()), flush=True)
    print("now full trace_radiance...", flush=True)
    from pbrt_tpu.integrators.path import trace_radiance
    from pbrt_tpu.core import rng as rngmod
    keys = rngmod.pixel_sample_key(rngmod.root_key(0), jnp.arange(1024), jnp.zeros(1024, jnp.int32))
    t0 = time.time()
    L, _ = jax.jit(lambda r, k: trace_radiance(built.scene, r, k, built.integrator))(ray, keys)
    jax.block_until_ready(L)
    print("trace OK", time.time()-t0, "s; mean L:", float(L.mean()), flush=True)
