"""kd-tree and uniform-grid accelerators vs the brute-force oracle
(reference: accelerators/kdtreeaccel.cpp, grid.cpp; fuzzing pattern from
renderers/aggregatetest.cpp:53-112)."""

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

import dataclasses

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.accel.grid import build_grid
from pbrt_tpu.accel.kdtree import build_kdtree
from pbrt_tpu.accel.intersect import intersect, intersect_brute, SPHERE
from tests.test_intersect import make_geometry, rays


def _soup(n=200, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, (n, 1, 3))
    tris = centers + rng.uniform(-0.15, 0.15, (n, 3, 3))
    lo = tris.min(axis=1)
    hi = tris.max(axis=1)
    return tris, lo, hi


def _with_kd(g, lo, hi):
    kd = build_kdtree(lo, hi)
    return dataclasses.replace(
        g, accel_kind="kdtree",
        kd_split=jnp.asarray(kd.node_split),
        kd_axis=jnp.asarray(kd.node_axis),
        kd_above=jnp.asarray(kd.node_above),
        kd_prim_off=jnp.asarray(kd.node_prim_off),
        kd_prim_cnt=jnp.asarray(kd.node_prim_cnt),
        kd_prim_ids=jnp.asarray(kd.prim_ids),
    )


def _with_grid(g, lo, hi):
    gr = build_grid(lo, hi)
    return dataclasses.replace(
        g, accel_kind="grid", grid_dims=gr.dims,
        grid_off=jnp.asarray(gr.voxel_off),
        grid_cnt=jnp.asarray(gr.voxel_cnt),
        grid_ids=jnp.asarray(gr.prim_ids),
    )


def _fuzz_rays(seed=3, n=500):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return rays(o, d)


def _check_against_brute(g, r):
    h = intersect(g, r)
    h_bru = intersect_brute(g, r)
    np.testing.assert_array_equal(
        np.asarray(h.valid), np.asarray(h_bru.valid)
    )
    np.testing.assert_allclose(
        np.asarray(h.t)[np.asarray(h.valid)],
        np.asarray(h_bru.t)[np.asarray(h_bru.valid)],
        rtol=1e-5,
    )
    agree = (np.asarray(h.prim) == np.asarray(h_bru.prim)).mean()
    assert agree > 0.99


def test_kdtree_matches_brute_force_fuzz():
    tris, lo, hi = _soup()
    g = _with_kd(make_geometry(tris=tris), lo, hi)
    _check_against_brute(g, _fuzz_rays())


def test_grid_matches_brute_force_fuzz():
    tris, lo, hi = _soup()
    g = _with_grid(make_geometry(tris=tris), lo, hi)
    _check_against_brute(g, _fuzz_rays())


def test_kdtree_any_hit_and_quadrics():
    tris, lo, hi = _soup(n=40, seed=11)
    sph = (SPHERE, np.eye(4),
           [0.4, -0.4, 0.4, 2 * np.pi, 0, 0, 0, 0], False)
    g = make_geometry(tris=tris, quads=[sph])
    lo = np.concatenate([lo, [[-0.4, -0.4, -0.4]]])
    hi = np.concatenate([hi, [[0.4, 0.4, 0.4]]])
    r = _fuzz_rays(seed=5, n=300)
    for wrap in (_with_kd, _with_grid):
        ga = wrap(g, lo, hi)
        h = intersect(ga, r)
        h_bru = intersect_brute(ga, r)
        np.testing.assert_array_equal(
            np.asarray(h.valid), np.asarray(h_bru.valid)
        )
        # any-hit: wherever closest-hit found something, any-hit must too
        h_any = intersect(ga, r, any_hit=True)
        assert (np.asarray(h_any.valid) == np.asarray(h.valid)).all()


def test_grid_ray_starting_inside():
    tris, lo, hi = _soup(n=50, seed=13)
    g = _with_grid(make_geometry(tris=tris), lo, hi)
    rng = np.random.default_rng(17)
    o = rng.uniform(-0.5, 0.5, (100, 3)).astype(np.float32)
    d = rng.normal(size=(100, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r = rays(o, d)
    _check_against_brute(g, r)
