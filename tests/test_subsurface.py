"""Dipole BSSRDF: Rd properties + end-to-end subsurface render."""

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.film import film as film_mod
from pbrt_tpu.integrators import dipole as dip
from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build


def test_rd_decreasing_and_positive():
    d2 = jnp.asarray([0.0, 0.01, 0.1, 1.0, 10.0])
    sa = jnp.full((5, 4), 0.05)
    sps = jnp.full((5, 4), 3.0)
    rd = dip.diffusion_rd(d2, sa, sps, jnp.full((5, 1), 1.3))
    v = np.asarray(rd)[:, 0]
    assert (v >= 0).all()
    assert (np.diff(v) <= 1e-9).all()  # monotone decreasing in distance
    assert v[0] > 10 * v[-1]


def test_subsurface_scene_end_to_end():
    built = build(load_scene_string(
        """
        LookAt 0 0 -3  0 0 0  0 1 0
        Camera "perspective" "float fov" [40]
        Film "image" "integer xresolution" [8] "integer yresolution" [8]
        Sampler "lowdiscrepancy" "integer pixelsamples" [2]
        SurfaceIntegrator "dipolesubsurface"
        WorldBegin
        LightSource "distant" "rgb L" [5 5 5] "point from" [0 0 -5] "point to" [0 0 0]
        Material "subsurface" "color sigma_a" [.05 .05 .05]
          "color sigma_prime_s" [3 3 3]
        Shape "trianglemesh" "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
          "integer indices" [0 1 2 2 3 0]
        WorldEnd
        """
    ))
    assert built.scene.has_subsurface
    ss = built.scene.subsurface
    assert ss.points.shape[1] == 3
    assert float(jnp.max(ss.E)) > 0  # lit points have irradiance
    state = render(built, verbose=False)
    spect = np.asarray(state.pixels) / np.maximum(
        np.asarray(state.weight)[..., None], 1e-9
    )
    assert np.isfinite(spect).all()
    # center pixels (the slab) glow from diffusion
    assert spect[3:5, 3:5].mean() > 0.0
