"""SamplerRenderer: the default tiled renderer, as sample waves.

Reference: src/renderers/samplerrenderer.{h,cpp} — spawns pow-2 tile tasks
(:203-205), each looping Sampler→Camera→Li→Film::AddSample (:60-164), with
NaN/negative/infinite-radiance clamps (:119-133).

TPU-native design: the tile pool becomes **sample waves** — one jitted call
renders one sample index for every pixel (optionally chunked in pixel
blocks to bound memory, the analogue of the reference's bounded
``maxSamples`` streaming). The per-pixel (0,2)-sequence sampler runs inside
the wave kernel (branch-free bit ops); rng keys are structural
(pixel × sample), so results are independent of chunking/devices.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import rng as rngmod
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.film import film as film_mod
from pbrt_tpu.integrators.path import IntegratorConfig, RenderScene, trace_radiance


def _sampler_uniforms(sampler_name: str, pixel_index, sample_idx, keys, spp):
    """Per-sample (image_u, image_v, lens_u, lens_v, time_u) in [0,1).

    lowdiscrepancy (default): scrambled (0,2)-sequence per pixel
    (reference: samplers/lowdiscrepancy.cpp LDPixelSample); halton:
    prime-base radical inverses with per-pixel Cranley–Patterson rotation
    (reference: samplers/halton.cpp); bestcandidate: Mitchell dart-throwing
    table with per-pixel toroidal shift (reference:
    samplers/bestcandidate.cpp:40-120 + tools/samplepat.cpp); random:
    threefry uniforms; stratified: jittered subpixel grid.
    """
    n = jnp.asarray(sample_idx, jnp.uint32)
    if sampler_name in ("lowdiscrepancy", "adaptive"):
        k_img = rngmod.bounce_key(keys_base(keys, pixel_index), 0, rngmod.CAMERA)
        scr = jax.vmap(lambda k: jax.random.bits(k, (6,), jnp.uint32))(k_img)
        img = smp.sample02(n, scr[:, 0:2])
        lens = smp.sample02(n, scr[:, 2:4])
        tim = smp.van_der_corput(n, scr[:, 4])
        return img[:, 0], img[:, 1], lens[:, 0], lens[:, 1], tim
    if sampler_name == "halton":
        # Halton point n in prime bases (2,3 image; 5,7 lens; 11 time), with
        # a per-pixel uniform rotation mod 1 — keeps the sequence's
        # low-discrepancy structure inside each pixel while decorrelating
        # neighbours (the wavefront analogue of halton.cpp's image-wide
        # scrambled sequence).
        k_img = rngmod.bounce_key(keys_base(keys, pixel_index), 0, rngmod.CAMERA)
        shift = jax.vmap(lambda k: jax.random.uniform(k, (5,)))(k_img)
        dims = [smp.radical_inverse(n, b) for b in (2, 3, 5, 7, 11)]
        iu, iv, lu, lv, tu = [
            jnp.minimum((d + shift[:, i]) % 1.0, smp.ONE_MINUS_EPS)
            for i, d in enumerate(dims)
        ]
        return iu, iv, lu, lv, tu
    if sampler_name == "bestcandidate":
        tab = jnp.asarray(smp.best_candidate_table(max(spp, 1)))
        k_img = rngmod.bounce_key(keys_base(keys, pixel_index), 0, rngmod.CAMERA)
        scr = jax.vmap(lambda k: jax.random.bits(k, (3,), jnp.uint32))(k_img)
        shift = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(k_img)
        base = tab[jnp.minimum(n, jnp.uint32(tab.shape[0] - 1))]
        iu = jnp.minimum((base[0] + shift[:, 0]) % 1.0, smp.ONE_MINUS_EPS)
        iv = jnp.minimum((base[1] + shift[:, 1]) % 1.0, smp.ONE_MINUS_EPS)
        lens = smp.sample02(n, scr[:, 0:2])
        tim = smp.van_der_corput(n, scr[:, 2])
        return iu, iv, lens[:, 0], lens[:, 1], tim
    if sampler_name == "stratified":
        # decompose sample_idx into a ⌈√spp⌉ grid cell + jitter
        g = max(1, int(np.sqrt(spp)))
        cx = (n % g).astype(jnp.float32)
        cy = ((n // g) % g).astype(jnp.float32)
        k = rngmod.bounce_key(keys, 0, rngmod.CAMERA)
        u = rngmod.uniform_per(k, 5)
        iu = (cx + u[:, 0]) / g
        iv = (cy + u[:, 1]) / g
        return iu, iv, u[:, 2], u[:, 3], u[:, 4]
    # random
    k = rngmod.bounce_key(keys, 0, rngmod.CAMERA)
    u = rngmod.uniform_per(k, 5)
    return u[:, 0], u[:, 1], u[:, 2], u[:, 3], u[:, 4]


def keys_base(keys, pixel_index):
    """Per-pixel key independent of sample index (for scrambles)."""
    return keys  # keys already folded per-pixel by caller when needed


def render_wave(
    film_state,
    scene: RenderScene,
    camera,
    filter_table,
    pixel_x,  # (R,) i32 pixel coords of this chunk
    pixel_y,
    sample_idx,  # scalar i32
    root_key,
    icfg: IntegratorConfig,
    sampler_name: str,
    spp: int,
    film_cfg,
    sample_scale=None,  # (R,) adaptive supersampling mask
    want_stats: bool = False,
    sorted_pixels: bool = False,
    diff_scale: float | None = None,  # ray-differential scale; None →
    #   1/sqrt(spp) (reference ScaleDifferentials, samplerrenderer.cpp:91)
):
    """One sample wave for one pixel chunk. Pure; jit at call site.

    ``want_stats``: also return (lum, prim_id) of this sample per ray — the
    adaptive sampler's needsSupersampling inputs
    (reference: samplers/adaptive.cpp:140-165)."""
    W = film_state.weight.shape[1]
    pixel_index = pixel_y * W + pixel_x
    keys = rngmod.pixel_sample_key(root_key, pixel_index, jnp.asarray(sample_idx))
    pixel_keys = rngmod.pixel_sample_key(
        root_key, pixel_index, jnp.zeros_like(pixel_index)
    )
    iu, iv, lu, lv, tu = _sampler_uniforms(
        sampler_name, pixel_index, sample_idx,
        keys if sampler_name in ("random", "stratified") else pixel_keys,
        spp,
    )
    px = pixel_x.astype(jnp.float32) + iu
    py = pixel_y.astype(jnp.float32) + iv
    rays = camera.generate_rays(px, py, lu, lv, tu, keys=keys)
    diffs = None
    if hasattr(camera, "ray_differentials"):
        rx_o, rx_d, ry_o, ry_d = camera.ray_differentials(px, py, rays)
        s = (1.0 / float(np.sqrt(max(spp, 1)))
             if diff_scale is None else float(diff_scale))
        if s != 1.0:
            o0, d0 = rays.origin, rays.direction
            rx_o = o0 + (rx_o - o0) * s
            ry_o = o0 + (ry_o - o0) * s
            rx_d = d0 + (rx_d - d0) * s
            ry_d = d0 + (ry_d - d0) * s
        diffs = (rx_o, rx_d, ry_o, ry_d)
    L, first_t = trace_radiance(scene, rays, keys, icfg, diffs=diffs)
    # NaN/negative/inf clamps (reference: samplerrenderer.cpp:119-133)
    bad = jnp.isnan(L) | (L < 0.0) | jnp.isinf(L)
    L = jnp.where(bad, 0.0, L)
    state = film_mod.add_samples(
        film_state, film_cfg, px, py, L, first_t, filter_table,
        sample_scale=sample_scale, sorted_pixels=sorted_pixels,
        pixel_ids=(pixel_x, pixel_y),
    )
    if not want_stats:
        return state
    from pbrt_tpu.accel.intersect import intersect
    from pbrt_tpu.core import spectrum as spec

    lum = spec.luminance(L)
    hit = intersect(scene.geometry, rays)
    return state, lum, hit.prim


@functools.partial(
    jax.jit, static_argnames=("icfg", "sampler_name", "spp", "film_cfg")
)
def _render_wave_stats_jit(
    film_state, scene, camera, filter_table, pixel_x, pixel_y,
    sample_idx, root_key, icfg, sampler_name, spp, film_cfg,
):
    return render_wave(
        film_state, scene, camera, filter_table, pixel_x, pixel_y,
        sample_idx, root_key, icfg, sampler_name, spp, film_cfg,
        want_stats=True,
    )


@functools.partial(
    jax.jit, static_argnames=("icfg", "sampler_name", "spp", "film_cfg")
)
def _render_wave_masked_jit(
    film_state, scene, camera, filter_table, pixel_x, pixel_y,
    sample_idx, root_key, icfg, sampler_name, spp, film_cfg, sample_scale,
):
    return render_wave(
        film_state, scene, camera, filter_table, pixel_x, pixel_y,
        sample_idx, root_key, icfg, sampler_name, spp, film_cfg,
        sample_scale=sample_scale,
    )


@functools.partial(
    jax.jit, static_argnames=("icfg", "sampler_name", "spp", "film_cfg")
)
def _render_wave_jit(
    film_state, scene, camera, filter_table, pixel_x, pixel_y,
    sample_idx, root_key, icfg, sampler_name, spp, film_cfg,
):
    return render_wave(
        film_state, scene, camera, filter_table, pixel_x, pixel_y,
        sample_idx, root_key, icfg, sampler_name, spp, film_cfg,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "icfg", "sampler_name", "spp", "film_cfg", "n_waves", "diff_scale"
    ),
)
def _render_scan_jit(
    film_state, scene, camera, filter_table,
    xs_stack,  # (C, chunk) i32 pixel x per chunk
    ys_stack,  # (C, chunk)
    mask_stack,  # (C, chunk) f32 1 for live lanes, 0 for padding
    sample_base,  # scalar i32 first sample index
    root_key, icfg, sampler_name, spp, film_cfg, n_waves,
    diff_scale=None,
):
    """``n_waves`` sample waves × all pixel chunks in ONE dispatch.

    The reference's tile-task queue amortizes thread overhead; the TPU
    analogue is amortizing the host→device dispatch round-trip (tens of ms
    through the remote tunnel): a lax.scan over (wave, chunk) steps keeps
    the whole sample loop on device while the per-step footprint stays at
    one chunk. Padded tail lanes carry weight 0 (masked, not halved)."""

    C = xs_stack.shape[0]

    def chunk_step(state, step):
        # index the per-chunk stacks by step instead of materializing
        # (n_waves*C, chunk) tiled copies — a production-size render would
        # otherwise hold gigabytes of index data on device
        ci = step % C
        s = sample_base + step // C
        state = render_wave(
            state, scene, camera, filter_table, xs_stack[ci], ys_stack[ci],
            s, root_key, icfg, sampler_name, spp, film_cfg,
            sample_scale=mask_stack[ci], sorted_pixels=True,
            diff_scale=diff_scale,
        )
        return state, None

    state, _ = jax.lax.scan(
        chunk_step, film_state, jnp.arange(n_waves * C, dtype=jnp.int32)
    )
    return state


def render(built, spp=None, seed: int = 0, chunk_pixels: int | None = None,
           verbose: bool = True, quick: bool = False,
           checkpoint_path: str | None = None, checkpoint_every: int = 8,
           diff_spp: int | None = None):
    """Full render: all sample waves × pixel chunks → final FilmState.

    ``quick`` mimics the reference --quick flag (spp → 1).
    ``checkpoint_path``: save film + wave counter every ``checkpoint_every``
    waves and resume from it if present (rng keys are structural, so the
    resumed result is bit-identical to an uninterrupted run).
    ``diff_spp``: spp used for the ray-differential / texture-footprint
    scale (reference: ray.ScaleDifferentials(1/sqrt(spp)),
    samplerrenderer.cpp:91) — defaults to the actual spp; parity tests pass
    the golden's spp to emulate its filter width at reduced sample counts.
    """
    cfg = built.film_config
    icfg = built.integrator
    spp = spp if spp is not None else built.pixel_samples
    if quick:
        spp = 1
    # reference semantics: per-sample ray differentials cover 1/sqrt(spp)
    # of the pixel spacing — the texture footprint (and therefore mip level
    # and bump-offset du/dv) shrinks as spp grows. diff_scale drives the
    # exact per-ray differentials; the pixel_spread scaling covers the
    # cone-footprint fallback (cameras without ray_differentials).
    dspp = diff_spp if diff_spp is not None else spp
    diff_scale = 1.0 / float(np.sqrt(max(dspp, 1)))
    if built.scene.pixel_spread > 0.0 and dspp > 1:
        import dataclasses as _dc

        built = _dc.replace(
            built,
            scene=_dc.replace(
                built.scene,
                pixel_spread=built.scene.pixel_spread / float(np.sqrt(dspp)),
            ),
        )
    start_sample = 0
    resumed_state = None
    if checkpoint_path:
        from pbrt_tpu.film.checkpoint import load_checkpoint

        ck = load_checkpoint(checkpoint_path)
        if ck is not None and ck[2] == seed:
            resumed_state, start_sample, _ = ck
            if verbose and start_sample > 0:
                print(f"[pbrt_tpu] resuming at sample {start_sample}/{spp}")
    x0, x1, y0, y1 = cfg.pixel_bounds
    xs = np.arange(x0, x1, dtype=np.int32)
    ys = np.arange(y0, y1, dtype=np.int32)
    gx, gy = np.meshgrid(xs, ys)
    all_x = gx.ravel()
    all_y = gy.ravel()
    n_pix = len(all_x)
    # default wave width: 1<<15 rays — larger waves exceed the axon TPU
    # backend's per-program memory envelope and hard-crash the worker
    chunk = min(chunk_pixels or (1 << 15), n_pix)
    # pad to a whole number of chunks so shapes stay static
    pad = (-n_pix) % chunk
    if pad:
        # repeat the LAST pixel (weight-masked) so chunk pixel ids stay
        # nondecreasing — the sorted-scatter film fast path relies on it
        all_x = np.concatenate([all_x, np.full(pad, all_x[-1], np.int32)])
        all_y = np.concatenate([all_y, np.full(pad, all_y[-1], np.int32)])
    n_chunks = len(all_x) // chunk

    film_state = resumed_state if resumed_state is not None else film_mod.init_film(cfg)
    root = rngmod.root_key(seed)
    table = jnp.asarray(built.filter_table)
    t_start = time.time()

    if built.sampler_name == "adaptive" and resumed_state is None:
        return _render_adaptive(
            built, film_state, root, table, all_x, all_y, chunk, pad,
            n_chunks, verbose, quick, t_start,
        )

    # all chunks stacked once; padded tail lanes are weight-masked so every
    # chunk shares one static shape (single compiled program)
    xs_stack = jnp.asarray(all_x.reshape(n_chunks, chunk))
    ys_stack = jnp.asarray(all_y.reshape(n_chunks, chunk))
    mask = np.ones((n_chunks, chunk), np.float32)
    if pad:
        mask[-1, chunk - pad :] = 0.0
    mask_stack = jnp.asarray(mask)
    # group waves per dispatch: amortizes the host→device round-trip;
    # bounded by the checkpoint interval so resume granularity survives
    group = checkpoint_every if checkpoint_path else max(1, spp)
    s = start_sample
    while s < spp:
        n_waves = min(group, spp - s)
        film_state = _render_scan_jit(
            film_state, built.scene, built.camera, table,
            xs_stack, ys_stack, mask_stack, jnp.int32(s), root,
            icfg, built.sampler_name, spp, cfg, n_waves,
            diff_scale=diff_scale,
        )
        s += n_waves
        if verbose:
            jax.block_until_ready(film_state.pixels)
            el = time.time() - t_start
            done = s / spp
            print(f"\r[pbrt_tpu] sample {s}/{spp} ({el:5.1f}s, "
                  f"eta {el/done*(1-done):5.1f}s)", end="", flush=True)
        if checkpoint_path and (s % checkpoint_every == 0 or s == spp):
            from pbrt_tpu.film.checkpoint import save_checkpoint

            jax.block_until_ready(film_state.pixels)
            save_checkpoint(checkpoint_path, film_state, s, seed)
    jax.block_until_ready(film_state.pixels)
    if verbose:
        print(f"\n[pbrt_tpu] render done in {time.time()-t_start:.2f}s")
    return film_state


def _render_adaptive(built, film_state, root, table, all_x, all_y, chunk,
                     pad, n_chunks, verbose, quick, t_start):
    """Adaptive supersampling (reference: samplers/adaptive.{h,cpp}):
    render ``minsamples`` waves everywhere while tracking per-pixel
    luminance min/max (contrast test — triggering iff ANY sample deviates
    from the batch mean by >0.5, which the extremes decide) and first-hit
    prim-id min/max (shapeid test); then render up to ``maxsamples`` with
    contributions masked to pixels that need supersampling."""
    cfg = built.film_config
    icfg = built.integrator
    sp = built.description.sampler[1]
    min_s = max(1, sp.find_one_int("minsamples", 4))
    max_s = max(min_s, sp.find_one_int("maxsamples", 32))
    method = sp.find_one_string("method", "contrast")
    if quick:
        min_s, max_s = 1, 1
    H, W = film_state.weight.shape
    lum_sum = jnp.zeros((H * W,), jnp.float32)
    lum_min = jnp.full((H * W,), jnp.inf, jnp.float32)
    lum_max = jnp.full((H * W,), -jnp.inf, jnp.float32)
    id_min = jnp.full((H * W,), 2**30, jnp.int32)
    id_max = jnp.full((H * W,), -(2**30), jnp.int32)

    def chunk_xy(c):
        cx = all_x[c * chunk : (c + 1) * chunk]
        cy = all_y[c * chunk : (c + 1) * chunk]
        if pad and c == n_chunks - 1:
            cx = all_x[c * chunk : c * chunk + (chunk - pad)]
            cy = all_y[c * chunk : c * chunk + (chunk - pad)]
        return jnp.asarray(cx), jnp.asarray(cy)

    for s in range(min_s):
        for c in range(n_chunks):
            cx, cy = chunk_xy(c)
            film_state, lum, prim = _render_wave_stats_jit(
                film_state, built.scene, built.camera, table, cx, cy,
                jnp.int32(s), root, icfg, built.sampler_name, max_s, cfg,
            )
            pi = cy * W + cx
            lum_sum = lum_sum.at[pi].add(lum)
            lum_min = lum_min.at[pi].min(lum)
            lum_max = lum_max.at[pi].max(lum)
            id_min = id_min.at[pi].min(prim)
            id_max = id_max.at[pi].max(prim)
        if verbose:
            print(f"\r[pbrt_tpu] adaptive pass 1: {s+1}/{min_s}", end="")
    if method == "shapeid":
        need = id_min != id_max
    else:
        avg = lum_sum / min_s
        dev = jnp.maximum(lum_max - avg, avg - lum_min)
        need = (avg > 0.0) & (dev / jnp.maximum(avg, 1e-20) > 0.5)
    n_need = int(jnp.sum(need))
    if verbose:
        print(f"\n[pbrt_tpu] adaptive: {n_need}/{need.size} pixels supersample "
              f"({min_s}→{max_s} spp, method={method})")
    for s in range(min_s, max_s):
        if n_need == 0:
            break
        for c in range(n_chunks):
            cx, cy = chunk_xy(c)
            mask = need[cy * W + cx].astype(jnp.float32)
            film_state = _render_wave_masked_jit(
                film_state, built.scene, built.camera, table, cx, cy,
                jnp.int32(s), root, icfg, built.sampler_name, max_s, cfg,
                mask,
            )
        if verbose:
            print(f"\r[pbrt_tpu] adaptive pass 2: {s+1}/{max_s}", end="")
    jax.block_until_ready(film_state.pixels)
    if verbose:
        print(f"\n[pbrt_tpu] render done in {time.time()-t_start:.2f}s")
    return film_state
