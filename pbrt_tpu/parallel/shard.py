"""Multi-device execution: shard the ray wavefront over a device mesh.

Reference: the C++ renderer's only parallelism is a pthreads worker pool
over image tiles (src/core/parallel.{h,cpp}; task spawn at
samplerrenderer.cpp:203-205) with atomic-add film merging
(spectralImage.cpp:136-142). No distributed backend exists.

TPU-native design: data parallelism over rays via ``shard_map`` on a 1-D
``rays`` mesh axis. Scene arrays (geometry/BVH/materials/lights) are
replicated into each device's HBM; each device traces its ray shard and
scatter-adds into its own full-resolution film partial; partials are
``psum``-reduced across the mesh — the collective replaces the reference's
atomic adds. Multi-host runs extend the same mesh over
``jax.distributed`` processes (every host runs the same program).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.film import film as film_mod
from pbrt_tpu.renderers.sampler import render_wave


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("rays",))


def render_wave_sharded(
    mesh: Mesh,
    film_state,
    scene,
    camera,
    filter_table,
    pixel_x,
    pixel_y,
    sample_idx,
    root_key,
    icfg,
    sampler_name,
    spp,
    film_cfg,
    sample_scale=None,
):
    """One sample wave with rays sharded over the mesh.

    pixel_x/pixel_y must have length divisible by mesh size. The film enters
    replicated, each device accumulates its shard's contributions into a
    local copy, and the deltas are psum-merged. ``sample_scale`` (R,) weights
    whole samples (0 masks padding lanes exactly, any filter width).
    """
    if sample_scale is None:
        sample_scale = jnp.ones(pixel_x.shape, jnp.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("rays"), P("rays"), P("rays")),
        out_specs=P(),
        check_vma=False,
    )
    def step(film, px, py, scale):
        out = render_wave(
            film, scene, camera, filter_table, px, py,
            sample_idx, root_key, icfg, sampler_name, spp, film_cfg,
            sample_scale=scale,
        )
        # merge partials: delta = out - film, summed across devices
        return film_mod.FilmState(
            pixels=film.pixels + jax.lax.psum(out.pixels - film.pixels, "rays"),
            weight=film.weight + jax.lax.psum(out.weight - film.weight, "rays"),
            splat=film.splat + jax.lax.psum(out.splat - film.splat, "rays"),
            depth=film.depth + jax.lax.psum(out.depth - film.depth, "rays"),
        )

    return step(film_state, pixel_x, pixel_y, sample_scale)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "icfg", "sampler_name", "spp", "film_cfg"),
)
def _render_wave_sharded_jit(
    mesh, film_state, scene, camera, filter_table, pixel_x, pixel_y,
    sample_idx, root_key, icfg, sampler_name, spp, film_cfg, sample_scale,
):
    return render_wave_sharded(
        mesh, film_state, scene, camera, filter_table, pixel_x, pixel_y,
        sample_idx, root_key, icfg, sampler_name, spp, film_cfg,
        sample_scale=sample_scale,
    )


def render_sharded(built, mesh: Mesh | None = None, spp=None, seed=0,
                   verbose=False):
    """Full multi-device render (the sharded analogue of
    renderers/sampler.render)."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    cfg = built.film_config
    spp = spp if spp is not None else built.pixel_samples
    x0, x1, y0, y1 = cfg.pixel_bounds
    gx, gy = np.meshgrid(
        np.arange(x0, x1, dtype=np.int32), np.arange(y0, y1, dtype=np.int32)
    )
    all_x = gx.ravel()
    all_y = gy.ravel()
    pad = (-len(all_x)) % n_dev
    scale = np.ones(len(all_x) + pad, np.float32)
    if pad:
        # pad with masked duplicate pixels: sample_scale=0 zeroes their
        # filter weights inside add_samples, so padding contributes exactly
        # nothing for ANY filter width (replaces the r1/r2 halving hack).
        all_x = np.concatenate([all_x, all_x[:pad]])
        all_y = np.concatenate([all_y, all_y[:pad]])
        scale[-pad:] = 0.0
    film_state = film_mod.init_film(cfg)
    root = rngmod.root_key(seed)
    table = jnp.asarray(built.filter_table)
    for s in range(spp):
        film_state = _render_wave_sharded_jit(
            mesh, film_state, built.scene, built.camera, table,
            jnp.asarray(all_x), jnp.asarray(all_y), jnp.int32(s), root,
            built.integrator, built.sampler_name, spp, cfg,
            jnp.asarray(scale),
        )
    jax.block_until_ready(film_state.pixels)
    return film_state


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host startup (SURVEY §2.8): every host runs the same program;
    ``jax.distributed.initialize`` wires the hosts into one global mesh.
    On TPU pods all three arguments auto-detect from the pod metadata; on
    CPU/GPU clusters pass coordinator "host:port", world size and rank.
    Exposed via the CLI flag ``--distributed [coordinator]``.
    """
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()
