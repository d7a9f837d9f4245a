import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

from pbrt_tpu.film import film as film_mod
from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build
from pbrt_tpu.media import volumes as vol


def test_homogeneous_transmittance_beer_lambert():
    """Tr through homogeneous slab = e^{−σt·L} (Beer–Lambert)."""
    built = build(load_scene_string(
        """
        WorldBegin
        Volume "homogeneous" "point p0" [0 0 0] "point p1" [1 1 2]
          "spectrum sigma_a" [395 .5 715 .5] "spectrum sigma_s" [395 0 715 0]
        Shape "sphere" "float radius" [.01]
        WorldEnd
        """
    ))
    vt = built.scene.volumes
    assert vt.count == 1
    o = jnp.asarray([[0.5, 0.5, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    # segment [0, 4] crosses the slab thickness 2 → τ = 0.5·2 = 1
    tr = vol.transmittance(vt, o, d, jnp.zeros(1), jnp.full((1,), 4.0),
                           jnp.full((1,), 0.5))
    np.testing.assert_allclose(np.asarray(tr)[0], np.exp(-1.0), rtol=0.05)


def test_emission_integrator_energy():
    """Emission-only: Lv = Le/σt (1−e^{−σt L}) for uniform emissive slab."""
    built = build(load_scene_string(
        """
        WorldBegin
        Volume "homogeneous" "point p0" [0 0 0] "point p1" [1 1 1]
          "spectrum sigma_a" [395 1 715 1] "spectrum sigma_s" [395 0 715 0]
          "spectrum Le" [395 2 715 2]
        Shape "sphere" "float radius" [.01]
        WorldEnd
        """
    ))
    vt = built.scene.volumes
    o = jnp.asarray([[0.5, 0.5, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    Lv, tr = vol.integrate_emission(
        vt, o, d, jnp.zeros(1), jnp.full((1,), 3.0), jnp.full((1,), 0.5)
    )
    # analytic: ∫0^1 e^{-σ t} Le dt = Le (1-e^-1)/σ = 2(1−e⁻¹) ≈ 1.264.
    # fixed-step marching quantizes the slab boundary (same class of error
    # as the reference's user-stepsize march) → ~10% tolerance at 32 steps
    np.testing.assert_allclose(
        np.asarray(Lv)[0], 2 * (1 - np.exp(-1)), rtol=0.12
    )
    np.testing.assert_allclose(np.asarray(tr)[0], np.exp(-1.0), rtol=0.12)


def test_exponential_density_falls_off():
    built = build(load_scene_string(
        """
        WorldBegin
        Volume "exponential" "point p0" [0 0 0] "point p1" [10 10 10]
          "float a" [1] "float b" [1] "vector updir" [0 1 0]
          "spectrum sigma_a" [395 1 715 1]
        Shape "sphere" "float radius" [.01]
        WorldEnd
        """
    ))
    vt = built.scene.volumes
    lo_p = jnp.asarray([[5.0, 0.5, 5.0]])
    hi_p = jnp.asarray([[5.0, 8.0, 5.0]])
    s_lo = vol.sigma_t(vt, lo_p)
    s_hi = vol.sigma_t(vt, hi_p)
    assert float(s_lo.mean()) > 5.0 * float(s_hi.mean())


def test_volumegrid_trilinear():
    built = build(load_scene_string(
        """
        WorldBegin
        Volume "volumegrid" "point p0" [0 0 0] "point p1" [1 1 1]
          "integer nx" [2] "integer ny" [1] "integer nz" [1]
          "float density" [0 1]
          "spectrum sigma_a" [395 1 715 1]
        Shape "sphere" "float radius" [.01]
        WorldEnd
        """
    ))
    vt = built.scene.volumes
    left = vol.sigma_t(vt, jnp.asarray([[0.25, 0.5, 0.5]]))
    right = vol.sigma_t(vt, jnp.asarray([[0.75, 0.5, 0.5]]))
    assert float(right.mean()) > float(left.mean())


def test_render_with_fog():
    """Camera in fog: distant surface dimmed, fog glows with emission."""
    built = build(load_scene_string(
        """
        LookAt 0 0 -3  0 0 0  0 1 0
        Camera "perspective" "float fov" [40]
        Film "image" "integer xresolution" [6] "integer yresolution" [6]
        Sampler "lowdiscrepancy" "integer pixelsamples" [2]
        SurfaceIntegrator "directlighting"
        VolumeIntegrator "emission"
        WorldBegin
        LightSource "distant" "rgb L" [2 2 2] "point from" [0 0 -5] "point to" [0 0 0]
        Volume "homogeneous" "point p0" [-5 -5 -5] "point p1" [5 5 5]
          "spectrum sigma_a" [395 .3 715 .3]
        Material "matte" "spectrum Kd" [395 .8 715 .8]
        Shape "trianglemesh" "point P" [-10 -10 2  10 -10 2  10 10 2  -10 10 2]
          "integer indices" [0 1 2 2 3 0]
        WorldEnd
        """
    ))
    state = render(built, verbose=False)
    spect = np.asarray(state.pixels) / np.maximum(
        np.asarray(state.weight)[..., None], 1e-9
    )
    assert np.isfinite(spect).all()
    # without fog the wall would be brighter; σ=0.3 over 5 units → Tr≈0.22
    # the wall's lit radiance ~ (2·cos)·0.8/π; with fog ≪ that
    assert spect.mean() < 0.3
    assert spect.mean() > 0.0
