import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import transform as xf


def test_vector_ops():
    a = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(geom.dot(a, b)), [0.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(geom.cross(a, b)[0]), [0.0, 0.0, 1.0]
    )
    np.testing.assert_allclose(np.asarray(geom.length(a)), [1.0, 2.0])


def test_normalize_safe():
    v = jnp.asarray([[3.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    n = geom.normalize(v)
    np.testing.assert_allclose(np.asarray(n[0]), [1.0, 0.0, 0.0])
    assert not np.any(np.isnan(np.asarray(n)))


def test_coordinate_system_orthonormal():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(100, 3))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    v = jnp.asarray(v, jnp.float32)
    t, b = geom.coordinate_system(v)
    np.testing.assert_allclose(np.asarray(geom.dot(t, v)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(geom.dot(b, v)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(geom.dot(t, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(geom.length(t)), 1.0, atol=1e-5)
    # right-handed: t × b == v
    np.testing.assert_allclose(
        np.asarray(geom.cross(t, b)), np.asarray(v), atol=1e-5
    )


def test_ray_at():
    r = geom.Ray.make(jnp.zeros((4, 3)), jnp.asarray([[0.0, 0.0, 1.0]] * 4))
    p = r.at(jnp.full((4,), 2.0))
    np.testing.assert_allclose(np.asarray(p[:, 2]), 2.0)
    assert r.wavelength.shape == (4,)


def test_ray_pytree_jit():
    r = geom.Ray.make(jnp.zeros((4, 3)), jnp.ones((4, 3)))

    @jax.jit
    def f(ray):
        return ray.replace(tmax=jnp.full_like(ray.tmax, 5.0))

    out = f(r)
    np.testing.assert_allclose(np.asarray(out.tmax), 5.0)


def test_bbox():
    b = geom.BBox(jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([2.0, 1.0, 1.0]))
    assert float(b.surface_area()) == 2 * (2 + 1 + 2)
    b2 = b.union_point(jnp.asarray([3.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(b2.hi), [3.0, 1.0, 1.0])


def test_ray_bbox_intersect():
    o = jnp.asarray([[-5.0, 0.5, 0.5], [-5.0, 5.0, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    inv_d = 1.0 / d
    hit = geom.ray_bbox_intersect(
        o, inv_d, jnp.zeros(2), jnp.full(2, jnp.inf),
        jnp.zeros(3), jnp.ones(3),
    )
    assert bool(hit[0]) and not bool(hit[1])


def test_transform_point_vector_normal():
    m = xf.translate((1.0, 2.0, 3.0)) @ xf.scale(2.0, 2.0, 2.0)
    p = xf.apply_point(jnp.asarray(m, jnp.float32), jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p), [3.0, 2.0, 3.0], atol=1e-6)
    v = xf.apply_vector(jnp.asarray(m, jnp.float32), jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [2.0, 0.0, 0.0], atol=1e-6)
    # normal under nonuniform scale
    m2 = np.asarray(xf.scale(2.0, 1.0, 1.0))
    n = xf.apply_normal(
        jnp.asarray(xf.inverse(m2), jnp.float32),
        jnp.asarray([1.0, 1.0, 0.0]),
    )
    n = np.asarray(geom.normalize(n))
    expected = np.array([0.5, 1.0, 0.0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(n, expected, atol=1e-6)


def test_look_at():
    m = xf.look_at((0, 0, -5), (0, 0, 0), (0, 1, 0))
    # camera-space +z maps to world viewing direction
    d = xf.apply_vector(jnp.asarray(m, jnp.float32), jnp.asarray([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(d), [0.0, 0.0, 1.0], atol=1e-6)
    p = xf.apply_point(jnp.asarray(m, jnp.float32), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(p), [0.0, 0.0, -5.0], atol=1e-6)


def test_rotate_matches_axes():
    m = xf.rotate(90.0, (0, 0, 1))
    p = xf.apply_point(jnp.asarray(m, jnp.float32), jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p), [0.0, 1.0, 0.0], atol=1e-6)


def test_decompose_recompose():
    m = xf.translate((1, 2, 3)) @ xf.rotate(30.0, (0, 1, 0)) @ xf.scale(2, 2, 2)
    at = xf.AnimatedTransform.from_matrices(m, m, 0.0, 1.0)
    mi = at.interpolate(jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(mi), m.astype(np.float32), atol=1e-4)


def test_animated_interpolation_midpoint():
    m0 = xf.translate((0, 0, 0))
    m1 = xf.translate((2, 0, 0))
    at = xf.AnimatedTransform.from_matrices(m0, m1, 0.0, 1.0)
    mi = at.interpolate(jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(mi[:3, 3]), [1.0, 0.0, 0.0], atol=1e-6)


def test_animated_rotation_slerp():
    m0 = xf.rotate(0.0, (0, 0, 1))
    m1 = xf.rotate(90.0, (0, 0, 1))
    at = xf.AnimatedTransform.from_matrices(m0, m1, 0.0, 1.0)
    mi = np.asarray(at.interpolate(jnp.asarray(0.5)))
    expected = np.asarray(xf.rotate(45.0, (0, 0, 1)), np.float32)
    np.testing.assert_allclose(mi, expected, atol=1e-4)
