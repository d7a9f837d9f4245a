import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pbrt_tpu.cameras.cameras import make_camera
from pbrt_tpu.cameras.realistic import make_realistic_diffraction
from pbrt_tpu.cameras.eye import make_realistic_eye
from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core.transform import AnimatedTransform
from pbrt_tpu.film.film import FilmConfig
from pbrt_tpu.scene.paramset import ParamSet
import pbrt_tpu.core.transform as xf


def identity_c2w():
    m = xf.identity()
    return AnimatedTransform.from_matrices(m, m, 0.0, 1.0)


def uniforms(n):
    return (
        jnp.full((n,), 0.5),
        jnp.full((n,), 0.5),
        jnp.full((n,), 0.5),
    )


def test_perspective_center_ray():
    cam = make_camera(
        "perspective", ParamSet({"fov": ("float", [60.0])}), identity_c2w(),
        FilmConfig(xres=100, yres=100),
    )
    px = jnp.asarray([50.0, 0.0, 100.0])
    py = jnp.asarray([50.0, 50.0, 50.0])
    l1, l2, t = uniforms(3)
    rays = cam.generate_rays(px, py, l1, l2, t)
    # center ray looks straight down +z (camera space == world here)
    np.testing.assert_allclose(np.asarray(rays.direction[0]), [0, 0, 1], atol=1e-5)
    # edge rays tilted by fov/2 in x
    ang = np.degrees(np.arctan2(abs(float(rays.direction[1][0])),
                                float(rays.direction[1][2])))
    assert abs(ang - 30.0) < 0.7


def test_orthographic_parallel():
    cam = make_camera(
        "orthographic", ParamSet(), identity_c2w(), FilmConfig(xres=64, yres=64)
    )
    px = jnp.asarray([10.0, 50.0])
    py = jnp.asarray([20.0, 40.0])
    l1, l2, t = uniforms(2)
    rays = cam.generate_rays(px, py, l1, l2, t)
    np.testing.assert_allclose(np.asarray(rays.direction), [[0, 0, 1]] * 2, atol=1e-6)
    assert not np.allclose(np.asarray(rays.origin[0]), np.asarray(rays.origin[1]))


@pytest.fixture
def biconvex_lens(tmp_path):
    """Symmetric biconvex thin lens, f = 50mm (lensmaker: n=1.5, R=±50)."""
    lens = tmp_path / "biconvex.dat"
    lens.write_text(
        "# focal length\n50\n"
        "# radius separation n aperture  (front to back)\n"
        "50 2 1.5 20\n"
        "-50 0 1 20\n"
    )
    return str(lens)


def test_realistic_lens_collimation(biconvex_lens):
    """A point at the focal distance emits rays that exit collimated."""
    ps = ParamSet(
        {
            "specfile": ("string", [biconvex_lens]),
            "filmdistance": ("float", [50.0]),
            "aperture_diameter": ("float", [8.0]),
            "filmdiag": ("float", [35.0]),
            "diffractionEnabled": ("bool", ["false"]),
        },
        search_dir="/",
    )
    cam = make_realistic_diffraction(ps, identity_c2w(), FilmConfig(xres=101, yres=101))
    assert cam.focal_length_mm == 50.0
    n = 64
    # all rays from the CENTER film pixel, spread over the lens
    px = jnp.full((n,), 50.25)  # center incl. the reference's .25 offset
    py = jnp.full((n,), 50.25)
    u = np.random.default_rng(0).uniform(0.05, 0.95, (n, 2))
    rays = cam.generate_rays(
        px, py, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]), jnp.full((n,), 0.5)
    )
    d = np.asarray(rays.direction)
    alive = np.linalg.norm(d, axis=-1) > 0.5
    assert alive.sum() > n // 2  # most rays make it through
    d = d[alive]
    # collimated: all directions nearly equal (paraxial lens, finite thickness
    # → small aberration tolerance)
    spread = np.abs(d - d.mean(axis=0)).max()
    assert spread < 0.03
    # and they travel toward the scene (+z)
    assert (d[:, 2] > 0.9).all()


def test_realistic_chromatic_aberration(biconvex_lens):
    """With chromaticAberrationEnabled, blue rays refract more strongly."""
    ps = ParamSet(
        {
            "specfile": ("string", [biconvex_lens]),
            "filmdistance": ("float", [50.0]),
            "aperture_diameter": ("float", [8.0]),
            "diffractionEnabled": ("bool", ["false"]),
            "chromaticAberrationEnabled": ("bool", ["true"]),
        },
        search_dir="/",
    )
    cam = make_realistic_diffraction(ps, identity_c2w(), FilmConfig(xres=101, yres=101))
    n = 8
    px = jnp.full((n,), 50.25)
    py = jnp.full((n,), 50.25)
    lu = jnp.full((n,), 0.8)
    lv = jnp.full((n,), 0.5)
    tu = jnp.full((n,), 0.5)
    r_blue = cam.generate_rays(px, py, lu, lv, tu, wavelength=jnp.full((n,), 420.0))
    r_red = cam.generate_rays(px, py, lu, lv, tu, wavelength=jnp.full((n,), 700.0))
    db = np.asarray(r_blue.direction[0])
    dr = np.asarray(r_red.direction[0])
    # same lens point, different bend ⇒ directions differ
    assert not np.allclose(db, dr, atol=1e-5)


def test_realistic_diffraction_perturbs(biconvex_lens):
    ps = ParamSet(
        {
            "specfile": ("string", [biconvex_lens]),
            "filmdistance": ("float", [50.0]),
            "aperture_diameter": ("float", [8.0]),
            "diffractionEnabled": ("bool", ["true"]),
        },
        search_dir="/",
    )
    cam = make_realistic_diffraction(ps, identity_c2w(), FilmConfig(xres=101, yres=101))
    n = 16
    px = jnp.full((n,), 50.25)
    py = jnp.full((n,), 50.25)
    lu = jnp.full((n,), 0.7)
    lv = jnp.full((n,), 0.5)
    tu = jnp.full((n,), 0.5)
    keys = rngmod.pixel_sample_key(
        rngmod.root_key(0), jnp.arange(n), jnp.zeros(n, jnp.int32)
    )
    rays = cam.generate_rays(px, py, lu, lv, tu,
                             wavelength=jnp.full((n,), 550.0), keys=keys)
    d = np.asarray(rays.direction)
    alive = np.linalg.norm(d, axis=-1) > 0.5
    d = d[alive]
    # diffraction adds per-ray noise: same deterministic inputs but distinct
    # keys ⇒ directions differ slightly
    assert len(d) > 4
    assert np.abs(d - d.mean(axis=0)).max() > 1e-7
    assert np.abs(d - d.mean(axis=0)).max() < 0.05


def test_realistic_eye_smoke(tmp_path):
    """Schematic 4-surface eye (Gullstrand-like) traces rays to the scene."""
    eye = tmp_path / "eye.dat"
    # rows: rx ry thickness mediumIndex semiDiameter conicX conicY
    # (front=cornea ... back=lens rear), Zemax-style signs
    eye.write_text(
        "16.7\n"
        "7.8 7.8 0.55 1 4.8 0 0\n"     # cornea front (aqueous behind: ior1)
        "6.5 6.5 3.05 2 4.6 0 0\n"     # cornea back → aqueous (ior2)
        "0 0 0.0 0 2.0 0 0\n"          # pupil (aperture)
        "10.2 10.2 4.0 3 4.5 0 0\n"    # lens front (lens medium: ior3)
        "-6.0 -6.0 0 4 4.5 0 0\n"      # lens back (vitreous behind: ior4)
    )
    ps = ParamSet(
        {
            "specfile": ("string", [str(eye)]),
            "retinaDistance": ("float", [16.32]),
            "retinaRadius": ("float", [12.0]),
            "retinaSemiDiam": ("float", [3.942]),
            "pupilDiameter": ("float", [4.0]),
            "ior1": ("float", [1.3374]),
            "ior2": ("float", [1.3374]),
            "ior3": ("float", [1.42]),
            "ior4": ("float", [1.336]),
        },
        search_dir="/",
    )
    cam = make_realistic_eye(ps, identity_c2w(), FilmConfig(xres=64, yres=64))
    n = 32
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.uniform(20, 44, n), jnp.float32)
    py = jnp.asarray(rng.uniform(20, 44, n), jnp.float32)
    u = rng.uniform(0.1, 0.9, (n, 2))
    rays = cam.generate_rays(
        px, py, jnp.asarray(u[:, 0], jnp.float32),
        jnp.asarray(u[:, 1], jnp.float32), jnp.full((n,), 0.5),
        wavelength=jnp.full((n,), 550.0),
    )
    d = np.asarray(rays.direction)
    alive = np.linalg.norm(d, axis=-1) > 0.5
    # most rays are vignetted by the 2mm pupil (physical: the rear-lens
    # sampling disk is 4.5mm — the reference behaves the same)
    assert alive.sum() >= 2
    # surviving rays head toward the scene (+z in eye space)
    assert (d[alive][:, 2] > 0.0).all()
    assert np.isfinite(np.asarray(rays.origin)).all()
