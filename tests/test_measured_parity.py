"""Measured-BRDF parity: bin-exact against the reference's own kd-tree eval.

tests/data/ref_irreg_brdf.txt holds IrregIsotropicBRDF::f outputs printed by
the reference binary itself (scripts/brdf_probe.cpp linked against the
.refbuild libpbrt) for mystique.brdf at 8 direction pairs. Our radius-
doubling Gaussian gather (bsdf/measured.py irreg_f_one) must reproduce them.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

BRDF = "/root/reference/scenes/brdfs/mystique.brdf"


def test_irreg_brdf_matches_reference():
    if not os.path.exists(BRDF):
        pytest.skip("reference brdf asset not present")
    from pbrt_tpu.bsdf.measured import irreg_f_one, load_irreg_brdf
    from pbrt_tpu.config import DEFAULT_SPECTRAL

    pts, spectra = load_irreg_brdf(BRDF, DEFAULT_SPECTRAL)
    P = len(pts)
    path = os.path.join(os.path.dirname(__file__), "data", "ref_irreg_brdf.txt")
    n = 0
    for line in open(path):
        head, _, body = line.partition(":")
        to, po, ti, pi_ = [float(v) for v in head.split()[1:5]]
        ref = np.array(body.split(), np.float64)
        wo = np.array(
            [np.sin(to) * np.cos(po), np.sin(to) * np.sin(po), np.cos(to)],
            np.float32,
        )
        wi = np.array(
            [np.sin(ti) * np.cos(pi_), np.sin(ti) * np.sin(pi_), np.cos(ti)],
            np.float32,
        )
        ours = np.asarray(
            irreg_f_one(
                jnp.asarray(pts), jnp.asarray(spectra), 0, P,
                jnp.asarray(wo), jnp.asarray(wi),
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)
        n += 1
    assert n == 8
