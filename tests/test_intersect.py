
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.accel import bvh as bvh_mod
from pbrt_tpu.accel.intersect import (
    SceneGeometry, intersect, intersect_brute, pack_geometry, SPHERE, DISK,
)
from pbrt_tpu.core.geometry import Ray
from pbrt_tpu.core.interaction import surface_interaction


def make_geometry(tris=None, quads=None, wide=False, motion=None):
    """tris: (T,3,3) vertex array; quads: list of (type, o2w, params, reverse).

    ``wide=True`` also builds the 8-wide unified row table (accel/wide.py) —
    the production fast path (intersect dispatches to it when wide_rows is
    set). ``motion``: (T,3,3) shutter-end vertex deltas → motion-blurred
    leaf rows, motion_time (0,1)."""
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
    dv = None
    if motion is not None:
        motion = np.asarray(motion, np.float32)
        dv = np.concatenate(
            [motion[:, 0], motion[:, 1] - motion[:, 0], motion[:, 2] - motion[:, 0]],
            axis=1,
        )  # (T, 9) deltas of [v0, e1, e2]
        end = tris + motion
        lo_t = np.minimum(lo_t, end.min(axis=1))
        hi_t = np.maximum(hi_t, end.max(axis=1))
    lo = np.concatenate([lo_t, np.asarray(lo_q).reshape(-1, 3)], axis=0)
    hi = np.concatenate([hi_t, np.asarray(hi_q).reshape(-1, 3)], axis=0)
    tree = bvh_mod.build_bvh(lo, hi)
    f = jnp.asarray
    wide_kwargs = {}
    if wide and T:
        from pbrt_tpu.accel.wide import LEAF_TRIS, build_wide_bvh

        tri_tree = bvh_mod.build_bvh(
            lo_t, hi_t, max_prims_in_node=LEAF_TRIS
        )
        w = build_wide_bvh(tri_tree, v0, e1, e2, tri_motion=dv)
        wide_kwargs = dict(wide_rows=f(w.rows))
        if w.motion_rows is not None:
            wide_kwargs["wide_motion"] = f(w.motion_rows)
    if dv is not None:
        wide_kwargs.update(
            tri_motion=f(dv),
            tri_n_motion=f(np.zeros((T, 9), np.float32)),
            motion_time=f(np.asarray([0.0, 1.0], np.float32)),
            has_motion=True,
        )
    uv_default = np.zeros((T, 2), np.float32)
    return pack_geometry(SceneGeometry(
        **wide_kwargs,
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


# ---------------------------------------------------------------------------
# 8-wide unified-row fast path (accel/wide.py + _traverse_wide_one) — the
# production traversal. VERDICT r2 #3: fuzz it directly against the
# brute-force oracle (reference contract: aggregatetest.cpp:53-112).
# ---------------------------------------------------------------------------


def _soup(rng, n=300, spread=0.15):
    centers = rng.uniform(-1, 1, (n, 1, 3))
    return (centers + rng.uniform(-spread, spread, (n, 3, 3))).astype(np.float32)


def _rand_rays(rng, n=400):
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return rays(o, d)


def _assert_match(h_wide, h_ref, prim_agree=0.99):
    np.testing.assert_array_equal(
        np.asarray(h_wide.valid), np.asarray(h_ref.valid)
    )
    v = np.asarray(h_ref.valid)
    np.testing.assert_allclose(
        np.asarray(h_wide.t)[v], np.asarray(h_ref.t)[v], rtol=1e-4
    )
    assert (np.asarray(h_wide.prim) == np.asarray(h_ref.prim))[v].mean() >= prim_agree


def test_wide_bvh_matches_brute_force_fuzz():
    rng = np.random.default_rng(11)
    g = make_geometry(tris=_soup(rng), wide=True)
    assert g.wide_rows is not None  # the fast path is actually under test
    r = _rand_rays(rng)
    _assert_match(intersect(g, r), intersect_brute(g, r))


def test_wide_bvh_mixed_quadrics_fuzz():
    rng = np.random.default_rng(13)
    eye = np.eye(4)
    sph = lambda c, rad: (
        SPHERE,
        np.array([[1, 0, 0, c[0]], [0, 1, 0, c[1]], [0, 0, 1, c[2]], [0, 0, 0, 1]], np.float32),
        [rad, -rad, rad, 2 * np.pi, 0, 0, 0, 0],
        False,
    )
    quads = [sph(rng.uniform(-1, 1, 3), 0.3) for _ in range(5)]
    g = make_geometry(tris=_soup(rng, 150), quads=quads, wide=True)
    r = _rand_rays(rng)
    _assert_match(intersect(g, r), intersect_brute(g, r))


def test_wide_bvh_any_hit_fuzz():
    rng = np.random.default_rng(17)
    g = make_geometry(tris=_soup(rng), wide=True)
    r = _rand_rays(rng)
    h_any = intersect(g, r, any_hit=True)
    h_ref = intersect_brute(g, r)
    # any-hit must agree exactly on hit/miss, and any reported t must be a
    # genuine hit not before the closest one minus tolerance
    np.testing.assert_array_equal(np.asarray(h_any.valid), np.asarray(h_ref.valid))
    v = np.asarray(h_ref.valid)
    assert np.all(np.asarray(h_any.t)[v] >= np.asarray(h_ref.t)[v] * (1 - 1e-4))


def test_wide_bvh_motion_fuzz():
    """Motion-blurred leaf rows (wide_motion lerp at intersect.py:572-573)
    against a numpy oracle that lerps vertices per ray time."""
    rng = np.random.default_rng(19)
    tris = _soup(rng, 120)
    deltas = rng.uniform(-0.3, 0.3, tris.shape).astype(np.float32)
    g = make_geometry(tris=tris, wide=True, motion=deltas)
    assert g.wide_motion is not None
    n = 300
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tm = rng.uniform(0, 1, n).astype(np.float32)
    r = Ray.make(jnp.asarray(o), jnp.asarray(d), time=jnp.asarray(tm))
    h = intersect(g, r)

    # numpy Möller–Trumbore with lerped vertices
    vt = tris[None] + tm[:, None, None, None] * deltas[None]  # (R, T, 3, 3)
    v0 = vt[:, :, 0]
    e1 = vt[:, :, 1] - v0
    e2 = vt[:, :, 2] - v0
    pv = np.cross(d[:, None], e2)
    det = (e1 * pv).sum(-1)
    inv = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / np.where(det == 0, 1, det))
    tv = o[:, None] - v0
    b1 = (tv * pv).sum(-1) * inv
    qv = np.cross(tv, e1)
    b2 = (d[:, None] * qv).sum(-1) * inv
    t = (e2 * qv).sum(-1) * inv
    hit = (np.abs(det) >= 1e-12) & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1) & (t > 0)
    t = np.where(hit, t, np.inf)
    t_ref = t.min(1)
    valid_ref = np.isfinite(t_ref)
    np.testing.assert_array_equal(np.asarray(h.valid), valid_ref)
    np.testing.assert_allclose(
        np.asarray(h.t)[valid_ref], t_ref[valid_ref], rtol=2e-4
    )


def test_wide_bvh_deep_stack_adversarial():
    """4096 coaxial stacked triangles + a ray down the axis: every wide node
    on the path overlaps the ray, maximizing stack pushes. The WIDE_STACK
    clamp must not drop the subtree containing the closest hit."""
    rng = np.random.default_rng(23)
    n = 4096
    z = np.linspace(0.0, 40.0, n).astype(np.float32)
    tris = np.stack(
        [
            np.stack([np.full(n, -1.0), np.full(n, -1.0), z], -1),
            np.stack([np.full(n, 3.0), np.full(n, -1.0), z], -1),
            np.stack([np.full(n, -1.0), np.full(n, 3.0), z], -1),
        ],
        axis=1,
    )
    g = make_geometry(tris=tris, wide=True)
    o = np.array([[0.0, 0.0, -1.0]], np.float32).repeat(8, 0)
    o[:, 0] = rng.uniform(-0.5, 0.5, 8)
    d = np.array([[0.0, 0.0, 1.0]], np.float32).repeat(8, 0)
    r = rays(o, d)
    h = intersect(g, r)
    assert np.all(np.asarray(h.valid))
    # closest hit is the first triangle: t = 1.0
    np.testing.assert_allclose(np.asarray(h.t), 1.0, rtol=1e-5)
    # and from inside the stack: shoot backwards from the middle
    o2 = np.array([[0.0, 0.0, 20.001]], np.float32)
    d2 = np.array([[0.0, 0.0, -1.0]], np.float32)
    h2 = intersect(g, rays(o2, d2))
    hb = intersect_brute(g, rays(o2, d2))
    assert bool(h2.valid[0])
    np.testing.assert_allclose(float(h2.t[0]), float(hb.t[0]), rtol=1e-5)
