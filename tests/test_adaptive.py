"""Adaptive sampler supersampling (reference: src/samplers/adaptive.{h,cpp})."""

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

import numpy as np

from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build

SCENE = """
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [12] "integer yresolution" [12]
Sampler "adaptive" "integer minsamples" [2] "integer maxsamples" [8]
  "string method" ["%s"]
SurfaceIntegrator "directlighting"
WorldBegin
LightSource "point" "rgb I" [40 40 40] "point from" [0 0 -3]
Material "matte" "color Kd" [.7 .7 .7]
# small quad covering the center of the view, edges inside the frame
Shape "trianglemesh" "point P" [-.4 -.4 0  .4 -.4 0  .4 .4 0  -.4 .4 0]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def _weights(method):
    built = build(load_scene_string(SCENE % method))
    state = render(built, verbose=False)
    return np.asarray(state.weight)


def test_shapeid_supersamples_silhouette():
    w = _weights("shapeid")
    # interior pixels (all samples hit) and background stay at minsamples;
    # silhouette pixels get up to maxsamples
    assert w.min() >= 2.0 - 1e-4
    assert w.max() >= 4.0  # silhouette pixels got extra samples
    # strictly more weight along the edge than in the far corner
    assert w.max() > w[0, 0] + 1.0


def test_contrast_supersamples_edges():
    w = _weights("contrast")
    assert w.max() > w.min() + 1.0  # some pixels supersampled, not all
