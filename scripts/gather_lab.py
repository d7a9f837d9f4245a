"""Characterize the gather cost surface on the TPU to design the traversal.

Questions:
  1. Does gather time scale with table size N, row width W, or row count R?
  2. Are sorted indices faster than random?
  3. Is one-hot matmul gather faster for small N?
  4. Is vmapped contiguous dynamic_slice faster than row gather?
  5. Does pallas lower a VMEM-resident jnp.take?
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

cache_dir = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 1 << 15
STEPS = 32


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def gather_loop(N, W, sort=False, dtype=jnp.float32):
    table = jnp.asarray(np.random.default_rng(0).random((N, W)), dtype)
    idx0 = np.random.default_rng(1).integers(0, N, R).astype(np.int32)
    if sort:
        idx0 = np.sort(idx0)
    idx0 = jnp.asarray(idx0)

    @jax.jit
    def f(table, idx):
        def body(i, c):
            idx, acc = c
            rows = table[idx]
            acc = acc + rows.astype(jnp.float32).sum(-1)
            idx = (idx + 7) % N  # keep sortedness if sorted
            return (idx, acc)
        _, acc = jax.lax.fori_loop(0, STEPS, body, (idx0, jnp.zeros(R)))
        return acc

    t = timeit(f, table, idx0) / STEPS
    return t


def onehot_gather(N, W):
    table = jnp.asarray(np.random.default_rng(0).random((N, W)), jnp.bfloat16)
    idx0 = jnp.asarray(np.random.default_rng(1).integers(0, N, R).astype(np.int32))

    @jax.jit
    def f(table, idx):
        def body(i, c):
            idx, acc = c
            oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)
            rows = oh @ table
            acc = acc + rows.astype(jnp.float32).sum(-1)
            idx = (idx * 1664525 + 1013904223) % N
            return (idx, acc)
        _, acc = jax.lax.fori_loop(0, STEPS, body, (idx0, jnp.zeros(R)))
        return acc

    return timeit(f, table, idx0) / STEPS


def dynslice_loop(N, W, CH):
    """vmapped contiguous dynamic_slice of CH rows per ray."""
    table = jnp.asarray(np.random.default_rng(0).random((N, W), np.float32))
    idx0 = jnp.asarray(
        np.random.default_rng(1).integers(0, N - CH, R).astype(np.int32))

    @jax.jit
    def f(table, idx):
        def body(i, c):
            idx, acc = c
            def one(ix):
                return jax.lax.dynamic_slice(table, (ix, 0), (CH, W)).sum()
            acc = acc + jax.vmap(one)(idx)
            idx = (idx * 1664525 + 1013904223) % (N - CH)
            return (idx, acc)
        _, acc = jax.lax.fori_loop(0, STEPS, body, (idx0, jnp.zeros(R)))
        return acc

    return timeit(f, table, idx0) / STEPS


def main():
    global R
    print("devices:", jax.devices())
    print(f"R={R} rays, all times per gather step")
    print("\n-- row gather: vary table size N (W=8) --")
    for N in (1024, 8192, 131072):
        t = gather_loop(N, 8)
        print(f"  N={N:7d} W=8  : {t*1e6:9.1f} us  {R*8*4/t/1e9:6.2f} GB/s")
    print("\n-- row gather: vary width W (N=131072) --")
    for W in (8, 32, 128):
        t = gather_loop(131072, W)
        print(f"  N=131072 W={W:3d}: {t*1e6:9.1f} us  {R*W*4/t/1e9:6.2f} GB/s")
    print("\n-- row gather: vary ray count R (N=131072, W=8) --")
    for r in (4096, 32768, 262144):
        R = r
        t = gather_loop(131072, 8)
        print(f"  R={r:7d}      : {t*1e6:9.1f} us  {r*8*4/t/1e9:6.2f} GB/s  ({t/r*1e9:6.1f} ns/row)")
    R = 1 << 15
    print("\n-- sorted indices (N=131072, W=8) --")
    t = gather_loop(131072, 8, sort=True)
    print(f"  sorted        : {t*1e6:9.1f} us")
    print("\n-- one-hot matmul gather (W=8, bf16) --")
    for N in (256, 1024, 4096):
        t = onehot_gather(N, 8)
        print(f"  N={N:7d}      : {t*1e6:9.1f} us")
    print("\n-- vmapped contiguous dynamic_slice (N=131072, W=8) --")
    for CH in (4, 16, 64):
        t = dynslice_loop(131072, 8, CH)
        print(f"  chunk={CH:3d}     : {t*1e6:9.1f} us  {R*CH*8*4/t/1e9:6.2f} GB/s")


if __name__ == "__main__":
    main()
