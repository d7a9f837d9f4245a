"""Memory-shared instancing (TLAS/BLAS) vs flattened geometry.

Reference: TransformedPrimitive (primitive.h:89) + pbrtObjectInstance
(api.cpp:1159-1212): instances share ONE copy of the object's geometry.
The builder routes ≥2 static uses of a mesh-only object through the
instance table; these tests pin (1) the memory bound, (2) hit parity with
the flattened equivalent, and (3) per-instance metadata ids.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.accel.intersect import intersect
from pbrt_tpu.renderers.sampler import render
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build

# a little two-triangle wedge, instanced at three spots (one rotated)
HEADER = """
LookAt 0 6 -10  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "lowdiscrepancy" "integer pixelsamples" [2]
SurfaceIntegrator "directlighting"
WorldBegin
LightSource "distant" "rgb L" [3 3 3] "point from" [2 5 -4] "point to" [0 0 0]
Material "matte" "rgb Kd" [.6 .5 .4]
"""

OBJ = """
ObjectBegin "wedge"
Shape "trianglemesh" "point P" [-1 0 0  1 0 0  0 1.5 0  0 0 -1]
  "integer indices" [0 1 2 0 3 2]
ObjectEnd
"""

USES = """
TransformBegin
  Translate -2.5 0 0
  ObjectInstance "wedge"
TransformEnd
TransformBegin
  Translate 2.5 0 0
  Rotate 40 0 1 0
  ObjectInstance "wedge"
TransformEnd
TransformBegin
  Translate 0 0 2
  ObjectInstance "wedge"
TransformEnd
"""

# the same three wedges written out longhand (what expansion produces)
FLAT = """
TransformBegin
  Translate -2.5 0 0
  Shape "trianglemesh" "point P" [-1 0 0  1 0 0  0 1.5 0  0 0 -1]
    "integer indices" [0 1 2 0 3 2]
TransformEnd
TransformBegin
  Translate 2.5 0 0
  Rotate 40 0 1 0
  Shape "trianglemesh" "point P" [-1 0 0  1 0 0  0 1.5 0  0 0 -1]
    "integer indices" [0 1 2 0 3 2]
TransformEnd
TransformBegin
  Translate 0 0 2
  Shape "trianglemesh" "point P" [-1 0 0  1 0 0  0 1.5 0  0 0 -1]
    "integer indices" [0 1 2 0 3 2]
TransformEnd
"""

FOOTER = """
Shape "trianglemesh" "point P" [-30 0 -30  30 0 -30  30 0 30  -30 0 30]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def _rand_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 4.0, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return geom.Ray.make(jnp.asarray(o), jnp.asarray(d))


def test_instancing_memory_shared():
    built = build(load_scene_string(HEADER + OBJ + USES + FOOTER))
    g = built.scene.geometry
    assert g.inst_rows is not None
    assert g.inst_root.shape[0] == 3
    # one shared object copy (2 tris) + the ground (2 tris): NOT 3 copies
    assert g.num_triangles == 4
    flat = build(load_scene_string(HEADER + FLAT + FOOTER)).scene.geometry
    assert flat.inst_rows is None
    assert flat.num_triangles == 8


def test_instancing_hit_parity_fuzz():
    """Random rays hit the same surfaces at the same t through the TLAS
    as through flattened world-space geometry."""
    gi = build(load_scene_string(HEADER + OBJ + USES + FOOTER)).scene.geometry
    gf = build(load_scene_string(HEADER + FLAT + FOOTER)).scene.geometry
    rays = _rand_rays(512)
    hi = intersect(gi, rays)
    hf = intersect(gf, rays)
    assert bool(jnp.all(hi.valid == hf.valid))
    np.testing.assert_allclose(
        np.where(hi.valid, hi.t, 0.0), np.where(hf.valid, hf.t, 0.0),
        rtol=2e-4, atol=2e-4,
    )
    # any-hit agrees on occlusion
    ha_i = intersect(gi, rays, any_hit=True)
    ha_f = intersect(gf, rays, any_hit=True)
    assert bool(jnp.all(ha_i.valid == ha_f.valid))


def test_instancing_render_matches_flattened():
    """Full renders agree (same sampler/keys; geometry identical up to the
    instance-space round trip)."""
    bi = build(load_scene_string(HEADER + OBJ + USES + FOOTER))
    bf = build(load_scene_string(HEADER + FLAT + FOOTER))
    si = render(bi, verbose=False)
    sf = render(bf, verbose=False)
    a = np.asarray(si.pixels)
    b = np.asarray(sf.pixels)
    assert np.isfinite(a).all()
    # identical rng keys → near-identical images
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_instancing_metadata_ids():
    """Each instance use carries its own primitive id (reference:
    TransformedPrimitive primitiveId, primitive.h:40-44)."""
    from pbrt_tpu.core.interaction import surface_interaction

    built = build(load_scene_string(HEADER + OBJ + USES + FOOTER))
    g = built.scene.geometry
    # straight-down rays over the two translated wedges
    o = np.asarray([[-2.5, 0.75, -0.01], [0.0, 0.75, 1.99]], np.float32)
    d = np.asarray([[0, 0, 1], [0, 0, 1]], np.float32)
    rays = geom.Ray.make(jnp.asarray(o), jnp.asarray(d))
    hit = intersect(g, rays)
    si = surface_interaction(g, rays, hit)
    assert bool(si.valid[0]) and bool(si.valid[1])
    ids = np.asarray(si.mesh_id)
    assert ids[0] != ids[1]  # distinct uses → distinct metadata ids
