"""Isolate per-iteration overhead of lax loops on the axon TPU backend."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 1 << 15


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    x0 = jnp.asarray(np.random.default_rng(0).random(R, np.float32))
    table = jnp.asarray(np.random.default_rng(0).random((131072, 8), np.float32))
    idx0 = jnp.asarray(np.random.default_rng(1).integers(0, 131072, R).astype(np.int32))

    for STEPS in (8, 32, 128):
        @jax.jit
        def f_pure(x):
            def body(i, c):
                return c * 1.000001 + 1.0
            return jax.lax.fori_loop(0, STEPS, body, x)

        t = timeit(f_pure, x0)
        print(f"pure VPU body   steps={STEPS:4d}: {t*1e3:8.3f} ms total "
              f"{t/STEPS*1e6:8.1f} us/step")

    for STEPS in (8, 32):
        @jax.jit
        def f_gather(table, idx):
            def body(i, c):
                idx, acc = c
                rows = table[idx]
                acc = acc + rows.sum(-1)
                idx = (idx * 1664525 + 1013904223) % 131072
                return (idx, acc)
            _, acc = jax.lax.fori_loop(0, STEPS, body, (idx, jnp.zeros(R)))
            return acc

        t = timeit(f_gather, table, idx0)
        print(f"gather body     steps={STEPS:4d}: {t*1e3:8.3f} ms total "
              f"{t/STEPS*1e6:8.1f} us/step")

    # gather with NO loop: 8 chained gathers unrolled in one fused graph
    @jax.jit
    def f_unrolled(table, idx):
        acc = jnp.zeros(R)
        for _ in range(8):
            rows = table[idx]
            acc = acc + rows.sum(-1)
            idx = (idx * 1664525 + 1013904223) % 131072
        return acc

    t = timeit(f_unrolled, table, idx0)
    print(f"gather unrolled steps=   8: {t*1e3:8.3f} ms total {t/8*1e6:8.1f} us/step")

    # single gather, single dispatch
    @jax.jit
    def f_single(table, idx):
        return table[idx].sum(-1)

    t = timeit(f_single, table, idx0)
    print(f"single gather dispatch    : {t*1e3:8.3f} ms")

    # empty dispatch
    @jax.jit
    def f_empty(x):
        return x + 1.0

    t = timeit(f_empty, x0)
    print(f"single trivial dispatch   : {t*1e3:8.3f} ms")

    # big matmul for reference (MXU sanity): 4096^3 bf16
    a = jnp.asarray(np.random.default_rng(0).random((4096, 4096)), jnp.bfloat16)

    @jax.jit
    def f_mm(a):
        return a @ a

    t = timeit(f_mm, a)
    print(f"4096^3 bf16 matmul        : {t*1e3:8.3f} ms -> "
          f"{2*4096**3/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
