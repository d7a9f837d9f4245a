"""Deterministic counter-based random streams.

The reference seeds a Mersenne-Twister per worker task (``RNG rng(taskNum)``,
reference: renderers/samplerrenderer.cpp:73, rng.{h,cpp}) — deterministic
only for a fixed task count. TPU-native design: JAX threefry keys derived
structurally from (frame, pixel, sample, bounce, purpose), so every random
number is a pure function of *what it is for* — bit-identical across device
counts, shardings, and replays. This is the cross-device determinism story
the reference lacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Purpose constants — dimensions of the sampling tree. Splitting by purpose
# keeps streams independent without coordinating offsets.
CAMERA = 0
LIGHT_SELECT = 1
LIGHT_SAMPLE = 2
BSDF_SAMPLE = 3
ROULETTE = 4
LENS = 5
TIME = 6
DIFFRACTION = 7
VOLUME = 8
PHOTON = 9
MUTATION = 10


def root_key(seed: int = 0) -> jax.Array:
    return jax.random.key(seed)


def pixel_sample_key(key, pixel_index, sample_index):
    """Fold pixel and sample ids into per-path keys. Vectorized: pixel_index
    is an array; sample_index broadcasts against it. Returns keys of
    pixel_index's shape."""
    sample_index = jnp.broadcast_to(
        jnp.asarray(sample_index), jnp.shape(pixel_index)
    )
    k = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        key, jnp.ravel(pixel_index).astype(jnp.uint32)
    )
    k = jax.vmap(jax.random.fold_in)(k, jnp.ravel(sample_index).astype(jnp.uint32))
    return k.reshape(jnp.shape(pixel_index))


def bounce_key(keys, bounce, purpose):
    """Per-(path, bounce, purpose) subkey; keys is an array of keys."""
    tag = jnp.asarray(bounce, jnp.uint32) * jnp.uint32(16) + jnp.uint32(purpose)
    flat = jnp.ravel(keys)
    if jnp.shape(tag) == ():
        k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(flat, tag)
    else:
        k = jax.vmap(jax.random.fold_in)(flat, jnp.ravel(tag))
    return k.reshape(jnp.shape(keys))


def uniform(key, shape=(), dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype)


def uniform_per(keys, n: int):
    """For an array of keys (...,), draw n uniforms per key → (..., n)."""
    flat = jnp.ravel(keys)
    u = jax.vmap(lambda k: jax.random.uniform(k, (n,)))(flat)
    return u.reshape(jnp.shape(keys) + (n,))
