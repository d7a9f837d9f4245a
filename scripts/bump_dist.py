"""Dump our bump-chain tilt distribution on the metal floor, matching the
instrumented reference probes (BUMPDIAG): per camera-pixel first hit on the
bump-mapped floor, report du/dv, displacement values and the perturbed
normal's |ny|, binned by camera distance.

Run on CPU: python scripts/bump_dist.py [step]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from pbrt_tpu.scene.api import load_scene  # noqa: E402
from pbrt_tpu.scene.builder import build  # noqa: E402
from pbrt_tpu.accel.intersect import intersect  # noqa: E402
from pbrt_tpu.core.interaction import surface_interaction  # noqa: E402
from pbrt_tpu.integrators.path import apply_textures  # noqa: E402
from pbrt_tpu.materials import table as mat_mod  # noqa: E402

step = int(sys.argv[1]) if len(sys.argv) > 1 else 4

desc = load_scene(os.path.join(REPO, "goldens", "metal.pbrt"))
built = build(desc)
scene = built.scene
cam = built.camera

ys, xs = np.meshgrid(
    np.arange(0, 256, step), np.arange(0, 256, step), indexing="ij"
)
px = jnp.asarray(xs.ravel() + 0.5, jnp.float32)
py = jnp.asarray(ys.ravel() + 0.5, jnp.float32)
R = px.shape[0]
z = jnp.zeros((R,), jnp.float32)
rays = cam.generate_rays(px, py, z, z, z)
rx_o, rx_d, ry_o, ry_d = cam.ray_differentials(px, py, rays)
# golden is 16 spp -> ScaleDifferentials(1/4)
s = 0.25
o0, d0 = rays.origin, rays.direction
diffs = (
    o0 + (rx_o - o0) * s, d0 + (rx_d - d0) * s,
    o0 + (ry_o - o0) * s, d0 + (ry_d - d0) * s,
)
hit = intersect(scene.geometry, rays)
si = surface_interaction(scene.geometry, rays, hit, diffs=diffs)
lm = mat_mod.gather_lane(scene.materials, si.material)
si2, lm2 = apply_textures(scene, si, lm)

# floor = material with a bump texture bound
mi = np.maximum(np.asarray(si.material), 0)
has_bump = np.asarray(scene.materials.bump_tex)[mi] >= 0
valid = np.asarray(si.valid) & has_bump
ny = np.abs(np.asarray(si2.ns)[:, 1])
du = 0.5 * (np.abs(np.asarray(si.duvdx)[:, 0]) + np.abs(np.asarray(si.duvdy)[:, 0]))
p = np.asarray(si.p)
dist = np.sqrt((p[:, 0] - 18) ** 2 + 5.5**2 + (p[:, 2] - 2) ** 2)

print(f"floor first-hit lanes: {valid.sum()} / {R}")
for lo, hi in [(0, 10), (10, 20), (20, 40), (40, 80), (80, 300)]:
    m = valid & (dist >= lo) & (dist < hi)
    if m.sum() == 0:
        continue
    t = ny[m]
    print(
        f"dist {lo:3d}-{hi:3d}: n={m.sum():5d} du_med={np.median(du[m]):.3g} "
        f"|ny|_med={np.median(t):.3f} |ny|<0.7%={100*(t<0.7).mean():.1f} "
        f"|ny|<0.95%={100*(t<0.95).mean():.1f}"
    )
