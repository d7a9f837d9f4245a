"""Renderer dispatch + output writing.

Reference: RenderOptions::MakeRenderer (api.cpp:1333-1420) selecting
sampler / spectralrenderer / cameras / metropolis / aggregatetest /
surfacepoints / createprobes renderers, and the film WriteImage call at the
end of each Render().
"""

from __future__ import annotations

import os

import numpy as np

from pbrt_tpu.film import film as film_mod


def render_scene(built, spp=None, seed=0, quick=False, verbose=True, outfile=None):
    """Run the scene's configured renderer; write outputs; return paths."""
    name = built.renderer_name
    if name in ("spectral", "spectralrenderer"):
        from pbrt_tpu.renderers.spectral import render_spectral

        state = render_spectral(
            built, spp=spp, seed=seed, quick=quick, verbose=verbose
        )
    elif name == "cameras":
        from pbrt_tpu.renderers.cameras_renderer import render_cameras

        outputs = []
        for state, suffix in render_cameras(
            built, spp=spp, seed=seed, quick=quick, verbose=verbose
        ):
            outputs += write_outputs(built, state, outfile, suffix=suffix)
        return outputs
    elif name == "metropolis":
        from pbrt_tpu.renderers.metropolis import render_metropolis

        state = render_metropolis(
            built, spp=spp, seed=seed, quick=quick, verbose=verbose
        )
    elif name == "createprobes":
        # reference routing: api.cpp:1345-1359; params createprobes.cpp:317-330
        from pbrt_tpu.renderers.probes import create_probes

        p = built.renderer_params
        lmax = p.find_one_int("lmax", 4)
        nindir = p.find_one_int("indirectsamples", 512)
        spacing = p.find_one_float("samplespacing", 1.0)
        filename = p.find_one_string("filename", "probes.out")
        g = built.scene.geometry
        lo = np.asarray(g.world_lo)
        hi = np.asarray(g.world_hi)
        nprobes = tuple(
            max(1, int(np.ceil(float(hi[i] - lo[i]) / spacing)))
            for i in range(3)
        )
        create_probes(
            built, lmax=lmax, nprobes=nprobes,
            nindir=max(16, min(nindir, 256)), filename=filename,
            verbose=verbose,
        )
        return [filename]
    elif name == "surfacepoints":
        # reference routing: api.cpp:1352-1356
        from pbrt_tpu.renderers.surface_points import render_surface_points

        return render_surface_points(built, quick=quick, verbose=verbose)
    elif name == "aggregatetest":
        from pbrt_tpu.renderers.aggregatetest import run_aggregate_test

        n_bad = run_aggregate_test(
            built, niters=built.renderer_params.find_one_int("niters", 100000)
        )
        print(f"[pbrt_tpu] aggregatetest: {n_bad} disagreements")
        return []
    else:
        from pbrt_tpu.renderers.sampler import render

        state = render(built, spp=spp, seed=seed, quick=quick, verbose=verbose)
    return write_outputs(built, state, outfile)


def write_outputs(built, state, outfile=None, suffix=""):
    """Write the film in the format its filename implies: .dat spectral
    planes (fork behavior) plus an RGB preview for convenience."""
    cfg = built.film_config
    filename = outfile or cfg.filename
    outputs = []
    base, ext = os.path.splitext(filename)
    base += suffix
    if ext in ("", ".dat"):
        outputs.append(film_mod.write_dat(state, cfg, base + ".dat"))
        rgb = film_mod.to_rgb_image(state, cfg)
        from pbrt_tpu.film.imageio import write_exr

        outputs.append(write_exr(base + ".exr", rgb))
    elif ext == ".exr":
        rgb = film_mod.to_rgb_image(state, cfg)
        from pbrt_tpu.film.imageio import write_exr

        outputs.append(write_exr(filename, rgb))
        outputs.append(film_mod.write_dat(state, cfg, base + ".dat"))
    elif ext == ".pfm":
        rgb = film_mod.to_rgb_image(state, cfg)
        outputs.append(film_mod.write_pfm(filename, rgb))
    else:
        from pbrt_tpu.film.imageio import write_image

        rgb = film_mod.to_rgb_image(state, cfg)
        outputs.append(write_image(filename, rgb))
    # Film "spectralImageNoCamera": also a grayscale depth EXR sidecar
    # (reference: spectralImageNoCamera.cpp:388-390; its registration is
    # commented out there — api.cpp:697,717 — registered here as the
    # selectable variant)
    if cfg.kind.lower() == "spectralimagenocamera":
        outputs.append(
            film_mod.write_depth_exr(state, cfg, base + "_depth.exr")
        )
    return outputs
