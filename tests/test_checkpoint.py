"""Checkpoint/resume: interrupted renders resume bit-identically."""

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

import numpy as np

from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build

SCENE = """
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Sampler "lowdiscrepancy" "integer pixelsamples" [4]
SurfaceIntegrator "path"
WorldBegin
LightSource "infinite" "rgb L" [.6 .6 .6]
Material "matte" "color Kd" [.5 .5 .5]
Shape "sphere" "float radius" [1]
WorldEnd
"""


def test_resume_bit_identical(tmp_path):
    built = build(load_scene_string(SCENE))
    ck = str(tmp_path / "ck.npz")
    # full uninterrupted render
    full = render(built, verbose=False)
    # "interrupted": render 2 waves with checkpointing
    render(built, spp=2, verbose=False, checkpoint_path=ck, checkpoint_every=2)
    # fake the checkpoint as a mid-run save of the 4-wave render (waves 0-1
    # are identical because keys are structural), then resume to 4
    resumed = render(built, spp=4, verbose=False, checkpoint_path=ck,
                     checkpoint_every=2)
    np.testing.assert_allclose(
        np.asarray(full.pixels), np.asarray(resumed.pixels), atol=1e-6
    )


def test_stats_counters():
    from pbrt_tpu.utils import stats

    stats.incr("test/counter", 3)
    with stats.timed("test/phase"):
        pass
    rep = stats.report()
    assert "test/counter" in rep and "test/phase" in rep
