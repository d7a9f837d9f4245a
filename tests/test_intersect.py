import jax.numpy as jnp
import numpy as np

from pbrt_tpu.accel import bvh as bvh_mod
from pbrt_tpu.accel.intersect import (
    SceneGeometry, intersect, intersect_brute, pack_geometry, SPHERE, DISK,
)
from pbrt_tpu.core.geometry import Ray
from pbrt_tpu.core.interaction import surface_interaction


def make_geometry(tris=None, quads=None):
    """tris: (T,3,3) vertex array; quads: list of (type, o2w, params, reverse)."""
    tris = np.zeros((0, 3, 3), np.float32) if tris is None else np.asarray(tris, np.float32)
    T = len(tris)
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    fn = np.cross(e1, e2)
    fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
    quads = quads or []
    Q = len(quads)
    q_type = np.asarray([q[0] for q in quads], np.int32).reshape(Q)
    q_o2w = np.asarray([q[1] for q in quads], np.float32).reshape(Q, 4, 4)
    q_w2o = np.asarray([np.linalg.inv(q[1]) for q in quads], np.float32).reshape(Q, 4, 4)
    q_params = np.asarray([q[2] for q in quads], np.float32).reshape(Q, 8)
    q_rev = np.asarray([q[3] for q in quads], bool).reshape(Q)

    # prim AABBs
    lo_t = tris.min(axis=1) if T else np.zeros((0, 3))
    hi_t = tris.max(axis=1) if T else np.zeros((0, 3))
    lo_q = []
    hi_q = []
    for t, o2w, prm, _ in quads:
        r = prm[0] if prm[0] > 0 else 1.0
        ext = max(abs(prm[1]), abs(prm[2]), r, abs(prm[4]), 1e-3)
        corners = np.array(
            [[sx * r, sy * r, sz * ext] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        )
        w = corners @ np.asarray(o2w)[:3, :3].T + np.asarray(o2w)[:3, 3]
        lo_q.append(w.min(axis=0))
        hi_q.append(w.max(axis=0))
    lo = np.concatenate([lo_t, np.asarray(lo_q).reshape(-1, 3)], axis=0)
    hi = np.concatenate([hi_t, np.asarray(hi_q).reshape(-1, 3)], axis=0)
    tree = bvh_mod.build_bvh(lo, hi)
    f = jnp.asarray
    uv_default = np.zeros((T, 2), np.float32)
    return pack_geometry(SceneGeometry(
        tri_v0=f(v0), tri_e1=f(e1), tri_e2=f(e2),
        tri_n0=f(fn), tri_n1=f(fn), tri_n2=f(fn),
        tri_uv0=f(uv_default), tri_uv1=f(uv_default), tri_uv2=f(uv_default),
        tri_material=jnp.zeros(T, jnp.int32),
        tri_area_light=jnp.full(T, -1, jnp.int32),
        tri_mesh_id=jnp.zeros(T, jnp.int32),
        quad_type=f(q_type), quad_o2w=f(q_o2w), quad_w2o=f(q_w2o),
        quad_params=f(q_params),
        quad_material=jnp.zeros(Q, jnp.int32),
        quad_area_light=jnp.full(Q, -1, jnp.int32),
        quad_mesh_id=jnp.zeros(Q, jnp.int32),
        quad_reverse=f(q_rev),
        node_lo=f(tree.node_lo), node_hi=f(tree.node_hi),
        node_second=f(tree.node_second), node_count=f(tree.node_count),
        node_axis=f(tree.node_axis), prim_order=f(tree.prim_order),
        world_lo=f(lo.min(axis=0)), world_hi=f(hi.max(axis=0)),
    ))


def rays(origins, dirs):
    return Ray.make(jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32))


def test_single_triangle_hit_miss():
    g = make_geometry(tris=[[[0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    r = rays([[0.2, 0.2, -1], [0.9, 0.9, -1]], [[0, 0, 1]] * 2)
    h = intersect(g, r)
    assert bool(h.valid[0]) and not bool(h.valid[1])
    assert float(h.t[0]) == 1.0


def test_bvh_matches_brute_force_fuzz():
    """The aggregatetest equivalent (reference: renderers/aggregatetest.cpp)."""
    rng = np.random.default_rng(7)
    # random triangle soup in [-1,1]^3
    centers = rng.uniform(-1, 1, (200, 1, 3))
    tris = centers + rng.uniform(-0.15, 0.15, (200, 3, 3))
    g = make_geometry(tris=tris)
    o = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    d = rng.normal(size=(500, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r = rays(o, d)
    h_bvh = intersect(g, r)
    h_bru = intersect_brute(g, r)
    np.testing.assert_array_equal(np.asarray(h_bvh.valid), np.asarray(h_bru.valid))
    np.testing.assert_allclose(
        np.asarray(h_bvh.t)[np.asarray(h_bvh.valid)],
        np.asarray(h_bru.t)[np.asarray(h_bru.valid)],
        rtol=1e-5,
    )
    # same primitive chosen (modulo exact ties)
    agree = (np.asarray(h_bvh.prim) == np.asarray(h_bru.prim)).mean()
    assert agree > 0.99


def test_any_hit_shadow():
    g = make_geometry(tris=[[[-5, -5, 0], [5, -5, 0], [0, 5, 0]]])
    r = rays([[0, 0, -1], [0, 0, 1]], [[0, 0, 1], [0, 0, 1]])
    h = intersect(g, r, any_hit=True)
    assert bool(h.valid[0]) and not bool(h.valid[1])


def test_sphere_quadric():
    eye = np.eye(4)
    prm = [1.0, -1.0, 1.0, 2 * np.pi, 0, 0, 0, 0]  # radius 1, full sphere
    g = make_geometry(quads=[(SPHERE, eye, prm, False)])
    r = rays([[0, 0, -3], [0, 2, -3]], [[0, 0, 1], [0, 0, 1]])
    h = intersect(g, r)
    assert bool(h.valid[0]) and not bool(h.valid[1])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-5)
    si = surface_interaction(g, r, h)
    np.testing.assert_allclose(np.asarray(si.p[0]), [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(si.ns[0]), [0, 0, -1], atol=1e-5)


def test_partial_sphere_zclip():
    eye = np.eye(4)
    prm = [1.0, -0.5, 0.5, 2 * np.pi, 0, 0, 0, 0]  # z in [-.5,.5]
    g = make_geometry(quads=[(SPHERE, eye, prm, False)])
    # ray along z hits sphere at z=-1 which is clipped -> should pass through
    # to far side also clipped -> miss
    r = rays([[0, 0, -3]], [[0, 0, 1]])
    h = intersect(g, r)
    assert not bool(h.valid[0])
    # ray along x hits at x=-1, z=0 (inside band)
    r2 = rays([[-3, 0, 0]], [[1, 0, 0]])
    h2 = intersect(g, r2)
    assert bool(h2.valid[0])


def test_disk_quadric():
    eye = np.eye(4)
    prm = [2.0, 0, 0, 2 * np.pi, 0.5, 0.5, 0, 0]  # height .5, r 2, inner .5
    g = make_geometry(quads=[(DISK, eye, prm, False)])
    r = rays(
        [[1, 0, -1], [0.1, 0, -1], [3, 0, -1]],
        [[0, 0, 1]] * 3,
    )
    h = intersect(g, r)
    assert bool(h.valid[0])        # in annulus
    assert not bool(h.valid[1])    # inside inner radius
    assert not bool(h.valid[2])    # outside radius
    np.testing.assert_allclose(float(h.t[0]), 1.5, rtol=1e-5)


def test_surface_interaction_triangle():
    g = make_geometry(tris=[[[0, 0, 0], [2, 0, 0], [0, 2, 0]]])
    r = rays([[0.5, 0.5, -1]], [[0, 0, 1]])
    h = intersect(g, r)
    si = surface_interaction(g, r, h)
    assert bool(si.valid[0])
    np.testing.assert_allclose(np.asarray(si.p[0]), [0.5, 0.5, 0], atol=1e-6)
    # normal faces the incoming ray (faceforward handled by shading normals)
    assert abs(float(si.ns[0, 2])) == 1.0
    np.testing.assert_allclose(float(si.t[0]), 1.0)


def test_mixed_triangle_and_quadric():
    eye = np.eye(4)
    prm = [1.0, -1.0, 1.0, 2 * np.pi, 0, 0, 0, 0]
    m = eye.copy()
    m[:3, 3] = [0, 0, 5]
    g = make_geometry(
        tris=[[[-1, -1, 2], [1, -1, 2], [0, 1, 2]]],
        quads=[(SPHERE, m, prm, False)],
    )
    r = rays([[0, 0, 0], [0, 0.9, 3]], [[0, 0, 1]] * 2)
    h = intersect(g, r)
    # first ray hits triangle at t=2 (closer than sphere at t=4)
    assert int(h.prim[0]) == 0 and abs(float(h.t[0]) - 2.0) < 1e-5
    # second ray starts beyond the triangle plane, hits sphere
    assert int(h.prim[1]) == 1
