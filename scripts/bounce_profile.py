"""Time each sub-stage of one path bounce on the killeroo bench scene."""

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
from pbrt_tpu.core.interaction import surface_interaction
from pbrt_tpu.integrators import path as path_mod
from pbrt_tpu.integrators.path import IntegratorConfig, _nee_one_light, KeySource
from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.bsdf import bxdf
from pbrt_tpu.materials import table as mat_mod
from pbrt_tpu.lights import table as lights_mod

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"
R = 1 << 15


def main():
    print("rtt:", rtt() * 1e3, "ms", flush=True)
    built = build(load_scene(KILLEROO))
    built.integrator = IntegratorConfig(kind="path", max_depth=5, n_bins=32)
    scene = built.scene
    print("active_lobes:", scene.materials.active_lobes,
          "has_mix:", scene.materials.has_mix,
          "n_lights:", scene.lights.count,
          "has_textures:", scene.has_textures, flush=True)
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
    hit = intersect(scene.geometry, rays)

    f_si = jax.jit(lambda g, r, h: surface_interaction(g, r, h))
    tbench(f_si, scene.geometry, rays, hit, label="surface_interaction")
    si = f_si(scene.geometry, rays, hit)

    f_gl = jax.jit(lambda mt, m: mat_mod.gather_lane(mt, m))
    tbench(f_gl, scene.materials, si.material, label="gather_lane")
    lm = f_gl(scene.materials, si.material)

    ss, ts = bxdf.make_shading_frame(si.ns, si.dpdu)
    frame = (ss, ts, si.ns)
    wo_local = bxdf.world_to_local(si.wo, ss, ts, si.ns)
    pools = mat_mod.pools_of(scene.materials)
    wi_local = wo_local * jnp.asarray([-1.0, -1.0, 1.0])

    f_f = jax.jit(lambda lm, wo, wi: mat_mod.bsdf_f(lm, wo, wi, pools))
    tbench(f_f, lm, wo_local, wi_local, label="bsdf_f")

    f_pdf = jax.jit(lambda lm, wo, wi: mat_mod.bsdf_pdf(lm, wo, wi))
    tbench(f_pdf, lm, wo_local, wi_local, label="bsdf_pdf")

    ub = rngmod.uniform_per(keys, 3)
    f_smp = jax.jit(lambda lm, wo, u: mat_mod.bsdf_sample(
        lm, wo, u[:, 0], u[:, 1], u[:, 2], pools))
    tbench(f_smp, lm, wo_local, ub, label="bsdf_sample")

    u2 = rngmod.uniform_per(keys, 2)
    li = jnp.zeros((R,), jnp.int32)
    f_sli = jax.jit(lambda lt, g, li, p, u: lights_mod.sample_li(
        lt, g, li, p, u[:, 0], u[:, 1]))
    tbench(f_sli, scene.lights, scene.geometry, li, si.p, u2, label="sample_li")
    ls = f_sli(scene.lights, scene.geometry, li, si.p, u2)

    f_pli = jax.jit(lambda lt, g, li, p, w: lights_mod.pdf_li(lt, g, li, p, w))
    tbench(f_pli, scene.lights, scene.geometry, li, si.p, ls.wi, label="pdf_li")

    f_plih = jax.jit(lambda lt, g, al, o, d, t, n: lights_mod.pdf_li_hit(
        lt, g, al, o, d, t, n))
    tbench(f_plih, scene.lights, scene.geometry, si.area_light, rays.origin,
           geom.normalize(rays.direction), hit.t, si.ng, label="pdf_li_hit")

    f_le = jax.jit(lambda lt, d: lights_mod.le_escaped(lt, d))
    tbench(f_le, scene.lights, rays.direction, label="le_escaped")

    f_er = jax.jit(lambda lt, al, ng, wo: lights_mod.emitted_radiance(
        lt, al, ng, wo))
    tbench(f_er, scene.lights, si.area_light, si.ng, si.wo,
           label="emitted_radiance")

    src = KeySource(keys)
    f_nee = jax.jit(lambda scene, si, lm, wo: _nee_one_light(
        scene, si, lm, wo, frame, src, keys, 0,
        jnp.ones((R,), bool)))
    tbench(f_nee, scene, si, lm, wo_local, label="NEE total")


if __name__ == "__main__":
    main()
