"""Render checkpoint / resume.

Reference: none — the reference's film is memory-only and a crashed render
loses everything (SURVEY.md §5). Multi-host TPU runs are preemptible, so
the framework checkpoints (film accumulation + sample-wave counter + rng
seed) and resumes exactly: rng keys are structural (pixel, sample), so a
resumed render is bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.film.film import FilmState

FORMAT_VERSION = 1


def save_checkpoint(path: str, state: FilmState, next_sample: int, seed: int,
                    meta: dict | None = None):
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        version=FORMAT_VERSION,
        pixels=np.asarray(state.pixels),
        weight=np.asarray(state.weight),
        splat=np.asarray(state.splat),
        depth=np.asarray(state.depth),
        next_sample=next_sample,
        seed=seed,
        **(meta or {}),
    )
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str):
    """Returns (FilmState, next_sample, seed) or None if absent."""
    if not os.path.exists(path):
        return None
    z = np.load(path)
    if int(z["version"]) != FORMAT_VERSION:
        return None
    state = FilmState(
        pixels=jnp.asarray(z["pixels"]),
        weight=jnp.asarray(z["weight"]),
        splat=jnp.asarray(z["splat"]),
        depth=jnp.asarray(z["depth"]),
    )
    return state, int(z["next_sample"]), int(z["seed"])
