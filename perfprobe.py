import time, dataclasses
import numpy as np, jax, jax.numpy as jnp
from pbrt_tpu.scene.api import load_scene
from pbrt_tpu.scene.builder import build
from pbrt_tpu.accel.intersect import intersect
from pbrt_tpu.integrators.path import trace_radiance, IntegratorConfig
from pbrt_tpu.core import geometry as geom, rng as rngmod

desc = load_scene("/root/reference/scenes/killeroo-simple.pbrt")
built = build(desc)
g = built.scene.geometry
R = 32768
rng = np.random.default_rng(1)
# camera-like rays: from one point toward scene bbox
lo, hi = np.asarray(g.world_lo), np.asarray(g.world_hi)
o = np.tile(np.array([[400., 20., 30.]], np.float32), (R, 1))
tgt = rng.uniform(lo, hi, (R, 3)).astype(np.float32)
d = tgt - o; d /= np.linalg.norm(d, axis=-1, keepdims=True)
ray = geom.Ray.make(jnp.asarray(o), jnp.asarray(d))
keys = rngmod.pixel_sample_key(rngmod.root_key(0), jnp.arange(R), jnp.zeros(R, jnp.int32))

def timeit(name, f, *a):
    r = f(*a); jax.block_until_ready(r)   # compile+run
    t0 = time.time(); n = 3
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.time()-t0)/n
    print(f"{name}: {dt*1e3:.1f} ms -> {R/dt/1e3:.1f}k rays/s", flush=True)

isect = jax.jit(lambda r: intersect(g, r))
timeit("closest-hit intersect", isect, ray)
isect_any = jax.jit(lambda r: intersect(g, r, True))
timeit("any-hit intersect", isect_any, ray)
for depth in (1, 5):
    cfg = dataclasses.replace(built.integrator, kind="path", max_depth=depth)
    tr = jax.jit(lambda r, k: trace_radiance(built.scene, r, k, cfg))
    timeit(f"path depth={depth}", tr, ray, keys)
