import time, dataclasses
import numpy as np, jax
from pbrt_tpu.scene.api import load_scene
from pbrt_tpu.scene.builder import build
from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.integrators.path import IntegratorConfig
import sys
res = int(sys.argv[1]); chunk = int(sys.argv[2])
desc = load_scene("/root/reference/scenes/killeroo-simple.pbrt")
built = build(desc)
built.film_config = dataclasses.replace(built.film_config, xres=res, yres=res)
built.integrator = IntegratorConfig(kind="path", max_depth=5, n_bins=32)
t0 = time.time()
state = render(built, spp=1, chunk_pixels=chunk, verbose=True)
jax.block_until_ready(state.pixels)
print("render OK", round(time.time()-t0,1), "s", flush=True)
