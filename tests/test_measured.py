import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

from pbrt_tpu.bsdf import measured as meas
from pbrt_tpu.config import DEFAULT_SPECTRAL


def test_load_mystique_brdf():
    pts, spectra = meas.load_irreg_brdf(
        "/root/reference/scenes/brdfs/mystique.brdf", DEFAULT_SPECTRAL
    )
    assert pts.shape[1] == 3 and spectra.shape[1] == 32
    assert len(pts) == len(spectra) > 100
    assert np.isfinite(pts).all() and (spectra >= 0).all()
    # remap coordinates live in [0,1]×[0,1]×[-1,1]
    assert pts[:, 0].min() >= -1e-5 and pts[:, 0].max() <= 1.0 + 1e-5
    assert pts[:, 1].min() >= -1e-5 and pts[:, 1].max() <= 1.0 + 1e-5


def test_irreg_eval_interpolates():
    pts, spectra = meas.load_irreg_brdf(
        "/root/reference/scenes/brdfs/mystique.brdf", DEFAULT_SPECTRAL
    )
    pts_j = jnp.asarray(pts)
    sp_j = jnp.asarray(spectra)
    wo = jnp.asarray([0.0, 0.3, 0.95])
    wo = wo / jnp.linalg.norm(wo)
    wi = jnp.asarray([0.2, -0.1, 0.97])
    wi = wi / jnp.linalg.norm(wi)
    f = meas.irreg_f_one(pts_j, sp_j, jnp.int32(0), jnp.int32(len(pts)), wo, wi)
    assert f.shape == (32,)
    assert np.isfinite(np.asarray(f)).all()
    assert float(f.mean()) > 0  # lacquer reflects something
    # value is within the data range (weighted average property)
    assert float(f.max()) <= float(sp_j.max()) + 1e-5


def test_brdf_remap_ranges():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(100, 3))
    d[:, 2] = np.abs(d[:, 2])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p = np.asarray(meas.brdf_remap(jnp.asarray(d[:50]), jnp.asarray(d[50:])))
    assert (p[:, 1] >= 0).all() and (p[:, 1] <= 1).all()


def test_measured_material_in_scene():
    from pbrt_tpu.scene.api import load_scene_string
    from pbrt_tpu.scene.builder import build
    from pbrt_tpu.renderers.sampler import render
    from pbrt_tpu.film import film as film_mod

    built = build(load_scene_string(
        """
        LookAt 0 1 -2  0 0 0  0 1 0
        Camera "perspective" "float fov" [45]
        Film "image" "integer xresolution" [6] "integer yresolution" [6]
        Sampler "lowdiscrepancy" "integer pixelsamples" [2]
        SurfaceIntegrator "path" "integer maxdepth" [2]
        WorldBegin
        LightSource "point" "rgb I" [10 10 10] "point from" [0 3 -1]
        Material "measured" "string filename" "brdfs/mystique.brdf"
        Shape "sphere" "float radius" [.5]
        WorldEnd
        """,
        search_dir="/root/reference/scenes",
    ))
    from pbrt_tpu.materials.table import L_IRREG_MEASURED

    assert L_IRREG_MEASURED in built.scene.materials.active_lobes
    state = render(built, verbose=False)
    rgb = film_mod.to_rgb_image(state, built.film_config)
    assert np.isfinite(rgb).all()
    assert rgb.max() > 0  # the measured sphere reflects light
