"""Parallel-chain PSSMLT converges to the path-tracing estimate."""

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

import numpy as np

from pbrt_tpu.film import film as film_mod
from pbrt_tpu.renderers.metropolis import render_metropolis
from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build

SCENE = """
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "lowdiscrepancy" "integer pixelsamples" [32]
SurfaceIntegrator "path" "integer maxdepth" [3]
Renderer "metropolis" "integer samplesperpixel" [64] %s
WorldBegin
AttributeBegin
  Material "matte" "color Kd" [0 0 0]
  Translate 0 3 0
  AreaLightSource "area" "rgb L" [20 20 20]
  Shape "sphere" "float radius" [.5]
AttributeEnd
Material "matte" "color Kd" [.7 .7 .7]
Shape "trianglemesh" "point P" [-2 -1 2  2 -1 2  2 -1 -6  -2 -1 -6]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def _run_mlt(bidir: str):
    built = build(load_scene_string(SCENE % f'"bool bidirectional" ["{bidir}"]'))
    state_mlt = render_metropolis(built, verbose=False, n_chains=4096)
    mlt_img = np.asarray(state_mlt.pixels).mean(-1)
    state_pt = render(built, verbose=False)
    pt = np.asarray(state_pt.pixels) / np.maximum(
        np.asarray(state_pt.weight)[..., None], 1e-9
    )
    pt_img = pt.mean(-1)
    return mlt_img, pt_img


def test_mlt_matches_path_tracing():
    mlt_img, pt_img = _run_mlt("false")
    ratio = mlt_img.mean() / max(pt_img.mean(), 1e-9)
    assert 0.85 < ratio < 1.15
    corr = np.corrcoef(mlt_img.ravel(), pt_img.ravel())[0, 1]
    assert corr > 0.9


def test_bidirectional_mlt_matches_path_tracing():
    """The bidirectional estimator (reference default, metropolis.cpp:513)
    targets the same radiance — parallel-chain MLT over it must converge
    to the path-traced image."""
    mlt_img, pt_img = _run_mlt("true")
    ratio = mlt_img.mean() / max(pt_img.mean(), 1e-9)
    assert 0.8 < ratio < 1.25
    corr = np.corrcoef(mlt_img.ravel(), pt_img.ravel())[0, 1]
    assert corr > 0.85
