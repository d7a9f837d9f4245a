"""Golden-image parity vs the reference binary's own renders.

The reference's quality contract is golden-image comparison
(src/tools/exrdiff.cpp:24-104 workflow; SURVEY §4). scripts/make_goldens.sh
renders the five BASELINE configs with the reference binary into
goldens/*.dat (gitignored — 16 MB each); goldens/HASHES.sha256 pins the
exact bytes this test was validated against. If the .dat files are absent
the tests skip with instructions; if present but different from the pinned
hashes they fail (stale goldens).

Methodology (VERDICT r2 #1): Monte-Carlo noise is uncorrelated between the
two renderers (different RNG families), so pixelwise equality is impossible
at golden spp. We therefore compare
  1. per-wavelength-bin image means  — catches any spectral tilt (the r2
     basis bug showed +12%%→−38%% per bin; tolerance here is a few %%),
  2. per-bin spatial correlation on 4×4 box-downsampled planes — catches
     geometry/transpose errors (the r2 transpose bug gave corr ≈ 0.0),
  3. median relative error on bright downsampled pixels.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(REPO, "goldens")

# scene -> (golden spp [what make_goldens.sh rendered], our spp [reduced to
# keep the suite tractable on a 2-core box — the .dat raw accumulation is
# proportional to spp with the box filter, so means are compared after
# dividing each side by its spp], per-bin mean tolerance, min spatial corr,
# median bright-pixel rel-err). Tolerances documented per scene:
# direct-lighting scenes are tight; path/glossy get slack for MC variance.
# metal: measured max per-bin error 1.7% at spp=4 after the r5 bump /
# ray-differential / geometric-classification fixes — tol 0.05 ≈ 3×.
# ss-envmap: dipole BSSRDF vs the 128² golden (BASELINE config #4). The
# golden is rendered at 64 spp because the scene is glint-dominated and
# the reference's own LD realization at spp≤16 lands up to 2× above its
# converged mean (make_goldens.sh note); at spp64 the reference converges
# (0.0722) and ours matches within 6% per bin (measured at our spp=8).
# Spatial corr is glint-noise-limited at tractable spp — the per-bin
# means are the load-bearing gate for this scene.
CONFIGS = {
    "killeroo-simple": dict(ref_spp=8, spp=8, mean_tol=0.04, corr=0.97, med=0.08),
    "metal": dict(ref_spp=16, spp=4, mean_tol=0.05, corr=0.90, med=0.30),
    "bunny": dict(ref_spp=8, spp=2, mean_tol=0.06, corr=0.92, med=0.20),
    "anim-killeroos-moving": dict(ref_spp=8, spp=2, mean_tol=0.06, corr=0.92, med=0.20),
    "ss-envmap": dict(ref_spp=64, spp=2, mean_tol=0.10, corr=0.40, med=0.50),
}

# PBRT_TPU_PARITY_FAST=1: quarter the sample count and loosen tolerances so
# the whole file fits a 2-core CPU box in one sitting (VERDICT r4 weak #8);
# the full-tolerance run is the canonical gate.
PARITY_FAST = os.environ.get("PBRT_TPU_PARITY_FAST", "") == "1"


def _cfg(scene):
    cfg = dict(CONFIGS[scene])
    if PARITY_FAST:
        # half the samples, wider tolerances (validated: all five configs
        # pass in fast mode; metal's glossy glints need the larger corr
        # allowance at low spp)
        cfg["spp"] = max(1, cfg["spp"] // 2)
        cfg["mean_tol"] *= 1.75
        cfg["med"] *= 1.5
        cfg["corr"] -= 0.10
    return cfg


def _golden(scene):
    path = os.path.join(GOLDENS, f"{scene}.dat")
    if not os.path.exists(path):
        pytest.skip(
            f"golden {scene}.dat not present — run scripts/build_reference.sh "
            "then scripts/make_goldens.sh"
        )
    hashes = {}
    with open(os.path.join(GOLDENS, "HASHES.sha256")) as f:
        for line in f:
            h, name = line.split()
            hashes[name] = h
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    assert digest == hashes[f"{scene}.dat"], (
        f"golden {scene}.dat does not match the pinned hash — regenerate "
        "with scripts/make_goldens.sh or update HASHES.sha256"
    )
    from pbrt_tpu.film.film import read_dat

    data, _ = read_dat(path)
    return data


def _render(scene, spp, diff_spp):
    from pbrt_tpu.renderers.sampler import render
    from pbrt_tpu.scene.api import load_scene
    from pbrt_tpu.scene.builder import build

    desc = load_scene(os.path.join(GOLDENS, f"{scene}.pbrt"))
    built = build(desc)
    # diff_spp = the GOLDEN's spp: texture-footprint/bump filter widths
    # must match the reference render being compared against
    # (ScaleDifferentials is spp-dependent)
    state = render(built, spp=spp, verbose=False, diff_spp=diff_spp)
    return np.asarray(state.pixels, np.float64) + np.asarray(
        state.splat, np.float64
    )


def _downsample(img, f=4):
    H, W, S = img.shape
    return img[: H // f * f, : W // f * f].reshape(
        H // f, f, W // f, f, S
    ).mean((1, 3))


def _check_parity(scene):
    cfg = _cfg(scene)
    ref = _golden(scene) / cfg["ref_spp"]
    ours = _render(scene, cfg["spp"], cfg["ref_spp"]) / cfg["spp"]
    assert ours.shape == ref.shape, (ours.shape, ref.shape)

    # 1. per-bin image means (catches spectral tilt)
    m_ref = ref.mean((0, 1))
    m_our = ours.mean((0, 1))
    lit = m_ref > 1e-3 * m_ref.max()
    ratio = m_our[lit] / m_ref[lit]
    err = np.abs(ratio - 1.0)
    assert err.max() < cfg["mean_tol"], (
        f"{scene}: per-bin mean ratio off by {err.max():.3f} "
        f"(bins {np.where(err >= cfg['mean_tol'])[0]}, ratios {ratio})"
    )

    # 2. per-bin spatial correlation on downsampled planes
    dr = _downsample(ref)
    do = _downsample(ours)
    for b in np.where(lit)[0]:
        r = np.corrcoef(dr[..., b].ravel(), do[..., b].ravel())[0, 1]
        assert r > cfg["corr"], f"{scene}: bin {b} spatial corr {r:.3f}"

    # 3. median relative error on bright downsampled pixels (all bins)
    lum_r = dr.sum(-1)
    bright = lum_r > np.percentile(lum_r, 75)
    rel = np.abs(do[bright] - dr[bright]) / np.maximum(dr[bright], 1e-9)
    med = np.median(rel)
    assert med < cfg["med"], f"{scene}: median bright rel err {med:.3f}"


@pytest.mark.slow
def test_parity_killeroo_simple():
    _check_parity("killeroo-simple")


@pytest.mark.slow
def test_parity_metal():
    # r5: xfail removed — the exact Material::Bump chain, exact camera ray
    # differentials (incl. 1/sqrt(spp) scaling) and the geometric-normal
    # BSDF classification brought per-bin means within 1.7% of the golden.
    _check_parity("metal")


@pytest.mark.slow
def test_parity_bunny():
    _check_parity("bunny")


@pytest.mark.slow
def test_parity_anim_killeroos():
    _check_parity("anim-killeroos-moving")


@pytest.mark.slow
def test_parity_ss_envmap():
    # BASELINE config #4: infinite-area env light + dipole subsurface
    # BSSRDF (reference: integrators/dipolesubsurface.cpp:189-210)
    _check_parity("ss-envmap")
