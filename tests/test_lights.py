"""Projection and goniometric light correctness (reference:
src/lights/projection.cpp, src/lights/goniometric.cpp)."""

import numpy as np

from pbrt_tpu.film import film as film_mod
from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build

LUM = np.array([0.212671, 0.715160, 0.072169])


def render_scene(text, **kw):
    built = build(load_scene_string(text))
    state = render(built, verbose=False, **kw)
    return state, built


PLANE = """
Material "matte" "color Kd" [.5 .5 .5]
Shape "trianglemesh" "point P" [-50 0 -50  50 0 -50  50 0 50  -50 0 50]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def test_goniometric_no_map_matches_point():
    """Gonio light with a constant (absent) map is exactly a point light."""
    head = """
    LookAt 0 2 0  0 0 0  0 0 1
    Camera "perspective" "float fov" [40]
    Film "image" "integer xresolution" [9] "integer yresolution" [9]
    Sampler "lowdiscrepancy" "integer pixelsamples" [4]
    SurfaceIntegrator "directlighting"
    WorldBegin
    TransformBegin
    Translate 0 1 0
    LightSource "goniometric" "rgb I" [2 2 2]
    TransformEnd
    """
    state, built = render_scene(head + PLANE)
    rgb = film_mod.to_rgb_image(state, built.film_config)
    lum = rgb[4, 4] @ LUM
    np.testing.assert_allclose(lum, 0.5 / np.pi * 2.0, rtol=0.03)


def test_projection_cone_limits():
    """Projection light illuminates only inside its fov window; the center
    texel behaves like a point light (constant map)."""
    head = """
    LookAt 0 2 0  0 0 0  0 0 1
    Camera "perspective" "float fov" [40]
    Film "image" "integer xresolution" [9] "integer yresolution" [9]
    Sampler "lowdiscrepancy" "integer pixelsamples" [4]
    SurfaceIntegrator "directlighting"
    WorldBegin
    TransformBegin
    Translate 0 1 0
    Rotate 90 1 0 0
    LightSource "projection" "rgb I" [2 2 2] "float fov" [30]
    TransformEnd
    """
    state, built = render_scene(head + PLANE)
    rgb = film_mod.to_rgb_image(state, built.film_config)
    lum = rgb @ LUM
    # straight below the light: same as a point light
    np.testing.assert_allclose(lum[4, 4], 0.5 / np.pi * 2.0, rtol=0.03)
    # footprint half-width at distance 1 is tan(15 deg) ~ 0.27; the image
    # corners look at plane points ~0.7 away -> outside the window, dark
    assert lum[0, 0] < 1e-4
    assert lum[8, 8] < 1e-4
    assert lum[0, 8] < 1e-4
