import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

from pbrt_tpu.core import sampling as smp
from pbrt_tpu.core import sh


def test_terms_index():
    assert sh.sh_terms(2) == 9
    assert sh.sh_index(0, 0) == 0
    assert sh.sh_index(1, -1) == 1
    assert sh.sh_index(1, 0) == 2
    assert sh.sh_index(2, 2) == 8


def test_orthonormality():
    """∫ Y_i Y_j dω = δij via MC over the sphere."""
    key = jax.random.key(0)
    n = 200000
    u = jax.random.uniform(key, (n, 2))
    w = smp.uniform_sample_sphere(u[:, 0], u[:, 1])
    basis = sh.sh_evaluate(w, 3)  # (n, 16)
    gram = np.asarray(basis.T @ basis * (4 * np.pi / n))
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_project_reconstruct_y00():
    """A constant function projects to only the l=0 coefficient."""
    key = jax.random.key(1)
    n = 50000
    u = jax.random.uniform(key, (n, 2))
    w = smp.uniform_sample_sphere(u[:, 0], u[:, 1])
    vals = jnp.ones((n, 1))
    c = np.asarray(sh.project_directions(w, vals, 2))
    # c00 = sqrt(4π); all others ~0
    assert abs(c[0, 0] - np.sqrt(4 * np.pi)) < 0.05
    assert np.abs(c[1:, 0]).max() < 0.05


def test_reconstruct_linear_function():
    """f(w) = max(0, w·z) reconstructs reasonably at lmax=4."""
    key = jax.random.key(2)
    n = 100000
    u = jax.random.uniform(key, (n, 2))
    w = smp.uniform_sample_sphere(u[:, 0], u[:, 1])
    vals = jnp.maximum(w[:, 2:3], 0.0)
    c = sh.project_directions(w, vals, 4)
    test_dirs = jnp.asarray([[0, 0, 1.0], [0, 0, -1.0], [1.0, 0, 0]])
    recon = np.asarray(sh.reconstruct(test_dirs, c, 4))[:, 0]
    assert abs(recon[0] - 1.0) < 0.12   # top
    assert abs(recon[1]) < 0.12         # bottom ≈ 0
    assert abs(recon[2]) < 0.2          # horizon ≈ 0 (ringing tolerated)


def test_create_probes_smoke():
    from pbrt_tpu.renderers.probes import create_probes, read_probe_file
    from pbrt_tpu.scene.api import load_scene_string
    from pbrt_tpu.scene.builder import build
    import tempfile, os

    built = build(load_scene_string(
        """
        Camera "perspective" "float fov" [60]
        Film "image" "integer xresolution" [4] "integer yresolution" [4]
        SurfaceIntegrator "directlighting"
        WorldBegin
        AreaLightSource "area" "rgb L" [5 5 5]
        Material "matte" "color Kd" [0 0 0]
        Translate 0 4 0
        Shape "sphere" "float radius" [.5]
        WorldEnd
        """
    ))
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "probes.txt")
        centers, coeffs = create_probes(
            built, lmax=2, nprobes=(2, 2, 2), nindir=32, filename=path
        )
        assert coeffs.shape == (8, 9, 32)
        assert np.isfinite(coeffs).all()
        lmax, lo, hi, dims, c2 = read_probe_file(path, 32)
        assert lmax == 2 and dims == (2, 2, 2)
        np.testing.assert_allclose(c2, coeffs, rtol=1e-3, atol=1e-5)
