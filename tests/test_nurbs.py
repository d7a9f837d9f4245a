"""NURBS tessellation (reference: src/shapes/nurbs.cpp)."""

import numpy as np

from pbrt_tpu.scene.paramset import ParamSet
from pbrt_tpu.shapes.nurbs import refine_nurbs


def _patch_params(nu, uorder, uknots, nv, vorder, vknots, P=None, Pw=None):
    p = ParamSet()
    p.add("integer", "nu", [nu])
    p.add("integer", "uorder", [uorder])
    p.add("float", "uknots", list(map(float, uknots)))
    p.add("integer", "nv", [nv])
    p.add("integer", "vorder", [vorder])
    p.add("float", "vknots", list(map(float, vknots)))
    if P is not None:
        p.add("point", "P", [float(x) for x in np.asarray(P).ravel()])
    if Pw is not None:
        p.add("float", "Pw", [float(x) for x in np.asarray(Pw).ravel()])
    return p


def test_bilinear_patch_is_exact_plane():
    """Order-2 (linear) 2x2 net == the bilinear quad itself."""
    P = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]]  # P[v*nu+u]
    params = _patch_params(2, 2, [0, 0, 1, 1], 2, 2, [0, 0, 1, 1], P=P)
    mesh = refine_nurbs(params, np.eye(4))
    assert np.allclose(mesh.positions[:, 2], 0.0, atol=1e-6)
    assert mesh.positions[:, 0].min() >= -1e-6
    assert mesh.positions[:, 0].max() <= 1 + 1e-6
    # normals all +z (or -z consistently)
    nz = mesh.normals[:, 2]
    assert np.allclose(np.abs(nz), 1.0, atol=1e-5)
    assert mesh.indices.shape[1] == 3 and len(mesh.indices) > 100


def test_rational_quadratic_arc():
    """A 1x? rational quadratic strip tracing a quarter circle: the classic
    9-point construction — surface points must lie on the unit circle."""
    s = np.sqrt(2.0) / 2.0
    # quarter arc in u (3 ctrl pts, order 3), linear extrusion in v (z axis)
    # Pw rows are (x*w, y*w, z*w, w)
    arc = [(1, 0, 0, 1), (s, s, 0, s), (0, 1, 0, 1)]
    Pw = [(x, y, z, w) for (x, y, z, w) in arc] + [
        (x, y, w, w) for (x, y, z, w) in arc  # z = 1 plane (weighted)
    ]
    params = _patch_params(
        3, 3, [0, 0, 0, 1, 1, 1], 2, 2, [0, 0, 1, 1], Pw=Pw
    )
    mesh = refine_nurbs(params, np.eye(4))
    r = np.hypot(mesh.positions[:, 0], mesh.positions[:, 1])
    assert np.allclose(r, 1.0, atol=1e-5)


def test_nurbs_renders_in_scene():
    from pbrt_tpu.renderers.sampler import render
    from pbrt_tpu.scene.api import load_scene_string
    from pbrt_tpu.scene.builder import build

    built = build(load_scene_string(
        """
        LookAt 0.5 0.5 2  0.5 0.5 0  0 1 0
        Camera "perspective" "float fov" [40]
        Film "image" "integer xresolution" [8] "integer yresolution" [8]
        Sampler "lowdiscrepancy" "integer pixelsamples" [2]
        SurfaceIntegrator "directlighting"
        WorldBegin
        LightSource "point" "rgb I" [8 8 8] "point from" [0.5 0.5 2]
        Material "matte" "color Kd" [.6 .6 .6]
        Shape "nurbs" "integer nu" [2] "integer uorder" [2]
          "float uknots" [0 0 1 1] "integer nv" [2] "integer vorder" [2]
          "float vknots" [0 0 1 1]
          "point P" [0 0 0  1 0 0  0 1 0  1 1 0]
        WorldEnd
        """
    ))
    state = render(built, verbose=False)
    assert float(np.asarray(state.pixels).mean()) > 0.01
