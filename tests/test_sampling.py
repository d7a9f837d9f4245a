import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrt_tpu.core import sampling as smp


def test_distribution1d_uniform():
    d = smp.Distribution1D.build(jnp.ones(8))
    u = jnp.asarray([0.0, 0.49, 0.51, 0.99])
    x, pdf, off = d.sample_continuous(u)
    np.testing.assert_allclose(np.asarray(x), np.asarray(u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pdf), 1.0, atol=1e-6)


def test_distribution1d_discrete():
    d = smp.Distribution1D.build(jnp.asarray([1.0, 3.0]))
    u = jnp.asarray([0.1, 0.3, 0.9])
    idx, pmf = d.sample_discrete(u)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 1])
    np.testing.assert_allclose(np.asarray(pmf), [0.25, 0.75, 0.75], atol=1e-6)


def test_distribution1d_integrates():
    # MC estimate of ∫f over [0,1) via importance sampling is exact per-sample
    f = jnp.asarray([1.0, 2.0, 4.0, 1.0])
    d = smp.Distribution1D.build(f)
    u = jax.random.uniform(jax.random.key(0), (4096,))
    x, pdf, _ = d.sample_continuous(u)
    fx = f[jnp.clip((x * 4).astype(int), 0, 3)]
    est = jnp.mean(fx / pdf)
    assert float(est) == pytest.approx(float(jnp.mean(f)), rel=1e-5)


def test_distribution2d_sampling():
    f = jnp.asarray([[1.0, 0.0], [1.0, 2.0]])
    d = smp.Distribution2D.build(f)
    key = jax.random.key(1)
    u = jax.random.uniform(key, (20000, 2))
    (x, y), pdf = d.sample_continuous(u[:, 0], u[:, 1])
    assert float(jnp.min(pdf)) > 0
    # histogram should be proportional to f
    hx = (np.asarray(x) * 2).astype(int)
    hy = (np.asarray(y) * 2).astype(int)
    counts = np.zeros((2, 2))
    for a, b in zip(hy, hx):
        counts[a, b] += 1
    counts /= counts.sum()
    np.testing.assert_allclose(counts, np.asarray(f) / float(jnp.sum(f)), atol=0.02)
    # pdf lookup agrees with sampling density (integral of pdf = 1)
    pv = d.pdf(x, y)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pdf), rtol=1e-4)


def test_concentric_disk_in_unit_disk():
    key = jax.random.key(2)
    u = jax.random.uniform(key, (1000, 2))
    dx, dy = smp.concentric_sample_disk(u[:, 0], u[:, 1])
    r2 = np.asarray(dx) ** 2 + np.asarray(dy) ** 2
    assert r2.max() <= 1.0 + 1e-6
    # area-uniform: mean r² = 1/2
    assert abs(r2.mean() - 0.5) < 0.03


def test_cosine_hemisphere_distribution():
    key = jax.random.key(3)
    u = jax.random.uniform(key, (20000, 2))
    w = smp.cosine_sample_hemisphere(u[:, 0], u[:, 1])
    cos = np.asarray(w[:, 2])
    assert cos.min() >= 0
    # E[cosθ] under pdf cosθ/π over hemisphere = 2/3
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01


def test_uniform_sphere():
    key = jax.random.key(4)
    u = jax.random.uniform(key, (20000, 2))
    w = smp.uniform_sample_sphere(u[:, 0], u[:, 1])
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(w), axis=-1), 1.0, atol=1e-5
    )
    assert abs(float(jnp.mean(w[:, 2]))) < 0.02


def test_triangle_barycentrics_valid():
    key = jax.random.key(5)
    u = jax.random.uniform(key, (1000, 2))
    b0, b1 = smp.uniform_sample_triangle(u[:, 0], u[:, 1])
    assert float(jnp.min(b0)) >= 0 and float(jnp.min(b1)) >= 0
    assert float(jnp.max(b0 + b1)) <= 1.0 + 1e-6


def test_power_heuristic_limits():
    w = smp.power_heuristic(1.0, jnp.asarray(10.0), 1.0, jnp.asarray(0.01))
    assert float(w) > 0.99
    w2 = smp.power_heuristic(1.0, jnp.asarray(1.0), 1.0, jnp.asarray(1.0))
    assert float(w2) == pytest.approx(0.5)


def test_van_der_corput_sequence():
    n = jnp.arange(8, dtype=jnp.uint32)
    v = np.asarray(smp.van_der_corput(n, 0))
    np.testing.assert_allclose(
        v, [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-7
    )


def test_sample02_stratification():
    # any prefix of 2^k (0,2)-sequence points is stratified: one point per
    # column in a 2^k x 1 grid on each axis
    n = jnp.arange(16, dtype=jnp.uint32)
    pts = np.asarray(smp.sample02(n, jnp.zeros(2, jnp.uint32)))
    for axis in range(2):
        cells = np.floor(pts[:, axis] * 16).astype(int)
        assert sorted(cells) == list(range(16))
    # elementary interval property for 4x4
    cx = np.floor(pts[:, 0] * 4).astype(int)
    cy = np.floor(pts[:, 1] * 4).astype(int)
    assert len({(a, b) for a, b in zip(cx, cy)}) == 16


def test_radical_inverse_base3():
    v = np.asarray(smp.radical_inverse(jnp.arange(9, dtype=jnp.uint32), 3))
    expected = [0, 1 / 3, 2 / 3, 1 / 9, 4 / 9, 7 / 9, 2 / 9, 5 / 9, 8 / 9]
    np.testing.assert_allclose(v, expected, atol=1e-6)


def test_stratified_2d():
    pts = np.asarray(smp.stratified_2d(jax.random.key(0), 4, 4))
    assert pts.shape == (16, 2)
    cells = {(int(x * 4), int(y * 4)) for x, y in pts}
    assert len(cells) == 16


def test_hg_pdf_normalized():
    # ∫ phase over sphere = 1
    g = 0.5
    mu = np.linspace(-1, 1, 20001)
    p = np.asarray(smp.hg_pdf(jnp.asarray(mu), g))
    integral = 2 * np.pi * np.trapezoid(p, mu)
    assert abs(integral - 1.0) < 1e-3
