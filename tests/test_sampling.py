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


def test_best_candidate_table_blue_noise():
    """Mitchell dart-throwing table must have a far larger minimum toroidal
    pairwise distance than white noise (the Poisson-disk property the
    reference's samplepat table provides, bestcandidate.cpp:40-120)."""
    n = 16
    tab = smp.best_candidate_table(n)
    assert tab.shape == (n, 2)

    def min_dist(pts):
        d = np.abs(pts[:, None, :] - pts[None, :, :])
        d = np.minimum(d, 1 - d)
        d2 = (d * d).sum(-1)
        d2[np.arange(len(pts)), np.arange(len(pts))] = np.inf
        return np.sqrt(d2.min())

    rng = np.random.default_rng(3)
    rand_min = np.mean([min_dist(rng.uniform(0, 1, (n, 2))) for _ in range(20)])
    assert min_dist(tab.astype(np.float64)) > 2.0 * rand_min
    # prefixes are themselves well-spaced (progressive property)
    assert min_dist(tab[:8].astype(np.float64)) > 2.0 * rand_min


def test_halton_sampler_stratification():
    """The halton sampler's image dims must be (0,1)-stratified per pixel:
    base-2 over 8 samples fills every eighth; base-3 over 9 fills every
    ninth (after removing the per-pixel rotation)."""
    from pbrt_tpu.core import rng as rngmod
    from pbrt_tpu.renderers.sampler import _sampler_uniforms

    pix = jnp.arange(4, dtype=jnp.int32)
    keys = rngmod.pixel_sample_key(
        rngmod.root_key(0), pix, jnp.zeros_like(pix)
    )
    us = np.stack(
        [
            np.stack(
                [
                    np.asarray(a)
                    for a in _sampler_uniforms("halton", pix, jnp.int32(s), keys, 9)
                ],
                -1,
            )
            for s in range(9)
        ]
    )  # (9 samples, 4 pixels, 5 dims)
    assert us.shape == (9, 4, 5)
    assert us.min() >= 0.0 and us.max() < 1.0
    for p in range(4):
        # iv dim is base 3: 9 consecutive samples hit all 9 ninths (rotation
        # mod 1 permutes ninths cyclically but fractional shift keeps
        # distinctness: check pairwise toroidal separation >= ~1/9)
        iv = np.sort(us[:, p, 1])
        gaps = np.diff(np.concatenate([iv, [iv[0] + 1.0]]))
        assert gaps.max() < 2.0 / 9 + 1e-5
        iu = np.sort(us[:8, p, 0])  # base 2, 8 samples
        gaps = np.diff(np.concatenate([iu, [iu[0] + 1.0]]))
        assert gaps.max() < 2.0 / 8 + 1e-5


def test_bestcandidate_sampler_runs():
    from pbrt_tpu.core import rng as rngmod
    from pbrt_tpu.renderers.sampler import _sampler_uniforms

    pix = jnp.arange(8, dtype=jnp.int32)
    keys = rngmod.pixel_sample_key(rngmod.root_key(1), pix, jnp.zeros_like(pix))
    for s in range(4):
        vals = _sampler_uniforms("bestcandidate", pix, jnp.int32(s), keys, 4)
        for v in vals:
            a = np.asarray(v)
            assert a.shape == (8,)
            assert a.min() >= 0.0 and a.max() < 1.0
