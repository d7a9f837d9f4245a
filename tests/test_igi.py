"""IGI virtual-point-light integrator: indirect bounce light appears."""

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

import numpy as np

from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build

SCENE = """
LookAt 0 1 -4  0 1 0  0 1 0
Camera "perspective" "float fov" [55]
Film "image" "integer xresolution" [12] "integer yresolution" [12]
Sampler "lowdiscrepancy" "integer pixelsamples" [4]
SurfaceIntegrator "igi" "integer nlights" [64]
WorldBegin
AttributeBegin
  Translate 0 3.5 0
  AreaLightSource "area" "rgb L" [30 30 30]
  Material "matte" "color Kd" [0 0 0]
  Shape "sphere" "float radius" [.4]
AttributeEnd
Material "matte" "color Kd" [.7 .7 .7]
Shape "trianglemesh" "point P" [-4 0 -4  4 0 -4  4 0 4  -4 0 4]
  "integer indices" [0 1 2 2 3 0]
Material "matte" "color Kd" [.8 .2 .2]
Shape "trianglemesh" "point P" [-4 0 3  4 0 3  4 4 3  -4 4 3]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def test_igi_renders_with_indirect():
    built = build(load_scene_string(SCENE))
    assert built.scene.has_vpls
    assert int(np.asarray(built.scene.vpls.valid).sum()) > 10
    state = render(built, verbose=False)
    img = np.asarray(state.pixels) / np.maximum(
        np.asarray(state.weight)[..., None], 1e-9
    )
    assert np.isfinite(img).all()
    assert img.mean() > 0.0
