"""AggregateTest: accelerator correctness fuzzer.

Reference: src/renderers/aggregatetest.{h,cpp}:53-112 — fires ``niters``
random rays (biased toward previous hit points) and compares the
accelerator's hit/t against an exhaustive all-primitives loop, warning on
any disagreement.

TPU-native: one batched comparison of the BVH traversal vs the brute-force
oracle over a random ray batch inside the scene bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.accel.intersect import intersect, intersect_brute
from pbrt_tpu.core.geometry import Ray


def run_aggregate_test(built, niters: int = 100000, seed: int = 0) -> int:
    g = built.scene.geometry
    rng = np.random.default_rng(seed)
    lo = np.asarray(g.world_lo)
    hi = np.asarray(g.world_hi)
    span = hi - lo
    n = min(niters, 1 << 18)
    o = (lo - 0.25 * span) + rng.uniform(0, 1, (n, 3)) * 1.5 * span
    d = rng.normal(size=(n, 3))
    # bias some rays toward axis-aligned directions (reference :74-80)
    axis_sel = rng.uniform(0, 1, n) < 0.3
    ax = rng.integers(0, 3, n)
    sign = rng.choice([-1.0, 1.0], n)
    d[axis_sel] = 0.0
    d[axis_sel, ax[axis_sel]] = sign[axis_sel]
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    rays = Ray.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    h_accel = intersect(g, rays)
    h_brute = intersect_brute(g, rays)
    miss_mismatch = h_accel.valid != h_brute.valid
    both = h_accel.valid & h_brute.valid
    t_rel = jnp.abs(h_accel.t - h_brute.t) / jnp.maximum(jnp.abs(h_brute.t), 1e-9)
    t_mismatch = both & (t_rel > 1e-4)
    n_bad = int(jnp.sum(miss_mismatch | t_mismatch))
    return n_bad
