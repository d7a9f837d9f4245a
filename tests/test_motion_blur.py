"""Object motion blur: animated TransformedPrimitive equivalent
(reference: core/primitive.h:89 TransformedPrimitive + AnimatedTransform;
api.cpp:1071-1105). TPU design: shutter-end vertex deltas lerped by ray
time inside traversal."""

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

import numpy as np

from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build

SCENE = """
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [45] "float shutteropen" [%s]
  "float shutterclose" [%s]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "random" "integer pixelsamples" [32]
SurfaceIntegrator "directlighting"
WorldBegin
LightSource "distant" "rgb L" [3 3 3] "point from" [0 0 -5] "point to" [0 0 0]
Material "matte" "color Kd" [.7 .7 .7]
TransformBegin
ActiveTransform StartTime
Translate -1.2 0 0
ActiveTransform EndTime
Translate 1.2 0 0
ActiveTransform All
Shape "trianglemesh" "point P" [-.35 -.35 0  .35 -.35 0  .35 .35 0  -.35 .35 0]
  "integer indices" [0 1 2 2 3 0]
TransformEnd
WorldEnd
"""


def _img(so, sc):
    built = build(load_scene_string(SCENE % (so, sc)))
    assert built.scene.geometry.has_motion
    state = render(built, verbose=False)
    w = np.maximum(np.asarray(state.weight), 1e-9)
    return np.asarray(state.pixels).mean(axis=-1) / w


def test_shutter_pinned_at_start():
    """Zero-length shutter at t=0 → quad sharp at the start position."""
    img = _img(0.0, 0.0)
    left = img[:, :8].sum()
    right = img[:, 8:].sum()
    assert left > 10 * max(right, 1e-9)


def test_shutter_pinned_at_end():
    img = _img(1.0, 1.0)
    left = img[:, :8].sum()
    right = img[:, 8:].sum()
    assert right > 10 * max(left, 1e-9)


def test_open_shutter_smears_both_sides():
    """Full shutter → energy on both sides, and mid positions exposed with
    partial coverage (the motion streak)."""
    img = _img(0.0, 1.0)
    left = img[:, :8].sum()
    right = img[:, 8:].sum()
    assert left > 0.1 and right > 0.1
    assert 0.3 < left / right < 3.0
    # center column catches the quad mid-sweep: partial exposure
    mid = img[8, 7:9].max()
    peak = img.max()
    assert 0.05 * peak < mid < 0.95 * peak
