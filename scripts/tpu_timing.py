"""Reliable timing on the axon TPU backend.

block_until_ready does NOT synchronize on axon; only a device->host fetch
does. tbench() forces a tiny fetch per rep and subtracts the measured RTT.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

_RTT = None


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0].ravel()[0]))


def rtt():
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1)
        x = jnp.float32(1.0)
        _fetch(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _fetch(f(x))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
    return _RTT


def tbench(fn, *args, reps=3, label=None):
    """Median wall time of fn(*args) with per-rep fetch sync, RTT-corrected."""
    out = fn(*args)
    _fetch(out)  # compile + first exec
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        ts.append(time.perf_counter() - t0)
    t = max(sorted(ts)[len(ts) // 2] - rtt(), 1e-9)
    if label:
        print(f"{label:30s}: {t*1e3:9.2f} ms")
    return t
