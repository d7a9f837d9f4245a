"""Differentiable rendering: finite-difference validation of parameter
gradients (BASELINE north-star requirement; no reference analogue)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.integrators import grad as grad_mod
from pbrt_tpu.integrators.path import trace_radiance
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build

SCENE = """
LookAt 0 2 0  0 0 0  0 0 1
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
SurfaceIntegrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "point" "rgb I" [4 4 4] "point from" [1 1 0]
Material "matte" "spectrum Kd" [395 .5 715 .5]
Shape "trianglemesh" "point P" [-10 0 -10  10 0 -10  10 0 10  -10 0 10]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def setup():
    built = build(load_scene_string(SCENE))
    n = 64
    ys, xs = np.divmod(np.arange(n, dtype=np.int32), 8)
    keys = rngmod.pixel_sample_key(
        rngmod.root_key(0), jnp.asarray(ys * 8 + xs), jnp.zeros(n, jnp.int32)
    )
    u = rngmod.uniform_per(keys, 5)
    px = jnp.asarray(xs, jnp.float32) + u[:, 0]
    py = jnp.asarray(ys, jnp.float32) + u[:, 1]
    rays = built.camera.generate_rays(px, py, u[:, 2], u[:, 3], u[:, 4])
    return built, rays, keys


def test_kd_gradient_matches_finite_difference():
    built, rays, keys = setup()
    scene = built.scene
    cfg = built.integrator

    def loss_of_kd(kd):
        # must rebuild the packed hot row, or the stale copy is gathered
        mats = grad_mod.replace_material_spectra(scene.materials, kd=kd)
        s = dataclasses.replace(scene, materials=mats)
        L, _ = trace_radiance(s, rays, keys, cfg)
        return L.mean()

    kd0 = scene.materials.kd
    g = jax.grad(loss_of_kd)(kd0)
    # finite differences on a few bins of the (only real) material
    mat_row = int(np.argmax(np.asarray(kd0).sum(axis=1)))
    eps = 1e-3
    for b in (0, 15, 31):
        kd_p = kd0.at[mat_row, b].add(eps)
        kd_m = kd0.at[mat_row, b].add(-eps)
        fd = (float(loss_of_kd(kd_p)) - float(loss_of_kd(kd_m))) / (2 * eps)
        an = float(g[mat_row, b])
        assert fd != 0.0
        np.testing.assert_allclose(an, fd, rtol=5e-2, atol=1e-7)


def test_emission_gradient_matches_finite_difference():
    built, rays, keys = setup()
    scene = built.scene
    cfg = built.integrator

    def loss_of_emit(emit):
        lights = dataclasses.replace(scene.lights, emit=emit)
        s = dataclasses.replace(scene, lights=lights)
        L, _ = trace_radiance(s, rays, keys, cfg)
        return L.mean()

    e0 = scene.lights.emit
    g = jax.grad(loss_of_emit)(e0)
    eps = 1e-3
    b = 16
    e_p = e0.at[0, b].add(eps)
    e_m = e0.at[0, b].add(-eps)
    fd = (float(loss_of_emit(e_p)) - float(loss_of_emit(e_m))) / (2 * eps)
    an = float(g[0, b])
    assert fd != 0.0
    np.testing.assert_allclose(an, fd, rtol=5e-2, atol=1e-7)
    # emission gradient of a lambertian scene is linear: g ≈ L/emit
    assert an > 0


def test_grad_api_helpers():
    built, rays, keys = setup()
    g = grad_mod.grad_wrt_materials(built.scene, rays, keys, built.integrator)
    assert g["kd"].shape == built.scene.materials.kd.shape
    assert float(jnp.abs(g["kd"]).sum()) > 0
    val, grads = grad_mod.value_and_grads(
        built.scene, rays, keys, built.integrator
    )
    assert float(val) > 0
    assert float(jnp.abs(grads["emit"]).sum()) > 0


def test_gradient_jittable():
    built, rays, keys = setup()
    scene = built.scene
    cfg = built.integrator

    @jax.jit
    def g_fn(kd):
        def loss(kd):
            mats = dataclasses.replace(scene.materials, kd=kd)
            s = dataclasses.replace(scene, materials=mats)
            L, _ = trace_radiance(s, rays, keys, cfg)
            return L.mean()

        return jax.grad(loss)(kd)

    g = g_fn(scene.materials.kd)
    assert np.isfinite(np.asarray(g)).all()


TEX_SCENE = """
LookAt 0 2 0  0 0 0  0 0 1
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
SurfaceIntegrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "point" "rgb I" [4 4 4] "point from" [1 1 0]
Texture "c" "color" "constant" "rgb value" [.6 .4 .3]
Material "matte" "texture Kd" "c"
Shape "trianglemesh" "point P" [-10 0 -10  10 0 -10  10 0 10  -10 0 10]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def test_texture_gradient_matches_finite_difference():
    """North-star 'spectral-texture parameters': d loss / d constant-texture
    value, FD-validated (grad_wrt_textures)."""
    built = build(load_scene_string(TEX_SCENE))
    n = 64
    ys, xs = np.divmod(np.arange(n, dtype=np.int32), 8)
    keys = rngmod.pixel_sample_key(
        rngmod.root_key(0), jnp.asarray(ys * 8 + xs), jnp.zeros(n, jnp.int32)
    )
    u = rngmod.uniform_per(keys, 5)
    rays = built.camera.generate_rays(
        jnp.asarray(xs, jnp.float32) + u[:, 0],
        jnp.asarray(ys, jnp.float32) + u[:, 1],
        u[:, 2], u[:, 3], u[:, 4],
    )
    scene = built.scene
    # depth 1 keeps the reverse-mode compile tractable on a 2-core box
    # (the gradient surface under test — texture eval at the first hit —
    # is fully exercised)
    cfg = dataclasses.replace(built.integrator, max_depth=1)
    g = grad_mod.grad_wrt_textures(scene, rays, keys, cfg)
    gc1 = np.asarray(g["c1"])
    assert np.isfinite(gc1).all()
    assert np.abs(gc1).max() > 0, "no gradient flow to texture spectra"

    # FD check on the largest-|g| texture bin
    ti, si_ = np.unravel_index(np.abs(gc1).argmax(), gc1.shape)
    eps = 1e-3

    def loss_with(delta):
        c1 = scene.textures.c1.at[ti, si_].add(delta)
        t2 = dataclasses.replace(scene.textures, c1=c1)
        s = dataclasses.replace(scene, textures=t2)
        L, _ = trace_radiance(s, rays, keys, cfg)
        return float(L.mean())

    fd = (loss_with(eps) - loss_with(-eps)) / (2 * eps)
    rel = abs(fd - gc1[ti, si_]) / max(abs(fd), 1e-9)
    assert rel < 0.05, (fd, float(gc1[ti, si_]))
