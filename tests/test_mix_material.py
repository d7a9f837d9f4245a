"""Mix material correctness (reference: src/materials/mix.cpp —
BSDF = amount·lobes(m1) + (1−amount)·lobes(m2))."""

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

import numpy as np

from pbrt_tpu.film import film as film_mod
from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build

LUM = np.array([0.212671, 0.715160, 0.072169])

HEAD = """
LookAt 0 2 0  0 0 0  0 0 1
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [9] "integer yresolution" [9]
Sampler "lowdiscrepancy" "integer pixelsamples" [8]
SurfaceIntegrator "directlighting"
WorldBegin
LightSource "point" "rgb I" [2 2 2] "point from" [0 1 0]
"""

PLANE = """
Shape "trianglemesh" "point P" [-50 0 -50  50 0 -50  50 0 50  -50 0 50]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def center_lum(text):
    built = build(load_scene_string(text))
    state = render(built, verbose=False)
    rgb = film_mod.to_rgb_image(state, built.film_config)
    return rgb[4, 4] @ LUM


def test_mix_of_two_mattes_blends_kd():
    """mix(matte .8, matte .2, amount .25) ≡ matte with Kd = .35."""
    mixed = center_lum(
        HEAD
        + """
    MakeNamedMaterial "bright" "string type" ["matte"] "color Kd" [.8 .8 .8]
    MakeNamedMaterial "dark" "string type" ["matte"] "color Kd" [.2 .2 .2]
    Material "mix" "string namedmaterial1" ["bright"]
      "string namedmaterial2" ["dark"] "color amount" [.25 .25 .25]
    """
        + PLANE
    )
    expected = (0.25 * 0.8 + 0.75 * 0.2) / np.pi * 2.0
    np.testing.assert_allclose(mixed, expected, rtol=0.03)


def test_mix_amount_one_is_first_material():
    """amount=1 reproduces namedmaterial1 exactly."""
    mixed = center_lum(
        HEAD
        + """
    MakeNamedMaterial "bright" "string type" ["matte"] "color Kd" [.8 .8 .8]
    MakeNamedMaterial "dark" "string type" ["matte"] "color Kd" [.2 .2 .2]
    Material "mix" "string namedmaterial1" ["bright"]
      "string namedmaterial2" ["dark"] "spectrum amount" [395 1 715 1]
    """
        + PLANE
    )
    plain = center_lum(
        HEAD + 'Material "matte" "color Kd" [.8 .8 .8]\n' + PLANE
    )
    np.testing.assert_allclose(mixed, plain, rtol=1e-3)


def test_non_mix_scenes_unaffected():
    """A scene without mix renders identically through the plain lane path
    (regression guard on the MixLane dispatch)."""
    plain = center_lum(
        HEAD + 'Material "matte" "color Kd" [.5 .5 .5]\n' + PLANE
    )
    np.testing.assert_allclose(plain, 0.5 / np.pi * 2.0, rtol=0.03)
