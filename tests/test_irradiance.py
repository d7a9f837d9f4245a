"""Irradiance-cache-equivalent gather and probe integrators."""

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

import numpy as np

from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build

BOX = """
LookAt 0 1 -4  0 1 0  0 1 0
Camera "perspective" "float fov" [55]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Sampler "lowdiscrepancy" "integer pixelsamples" [2]
SurfaceIntegrator "irradiancecache" "integer nsamples" [4]
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


def test_irradiance_cache_adds_indirect():
    built = build(load_scene_string(BOX))
    state = render(built, verbose=False)
    ic = np.asarray(state.pixels) / np.maximum(
        np.asarray(state.weight)[..., None], 1e-9
    )
    # compare to directlighting only: irradiancecache adds energy
    built_d = build(load_scene_string(BOX.replace(
        '"irradiancecache" "integer nsamples" [4]', '"directlighting"'
    )))
    state_d = render(built_d, verbose=False)
    dl = np.asarray(state_d.pixels) / np.maximum(
        np.asarray(state_d.weight)[..., None], 1e-9
    )
    assert np.isfinite(ic).all()
    assert ic.mean() > dl.mean() * 1.02  # indirect bounce adds light


def test_useprobes_roundtrip(tmp_path):
    from pbrt_tpu.renderers.probes import create_probes

    scene_txt = BOX.replace(
        '"irradiancecache" "integer nsamples" [4]', '"directlighting"'
    )
    built = build(load_scene_string(scene_txt))
    probe_file = str(tmp_path / "probes.out")
    create_probes(built, lmax=2, nprobes=(2, 2, 2), nindir=32,
                  filename=probe_file, verbose=False)
    scene2 = BOX.replace(
        '"irradiancecache" "integer nsamples" [4]',
        f'"useprobes" "string filename" ["{probe_file}"]',
    )
    built2 = build(load_scene_string(scene2))
    state = render(built2, verbose=False)
    img = np.asarray(state.pixels)
    assert np.isfinite(img).all()
    assert img.mean() > 0
