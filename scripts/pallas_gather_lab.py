"""Pallas feasibility lab for the traversal hot loop.

Question: can a Pallas kernel with the wide-BVH table resident in VMEM beat
XLA's HBM gather + slab math per traversal iteration?

Measures, per 32k-lane iteration equivalent:
  A. XLA baseline: rows[idx] gather + transpose + slab math (the warm-phase
     step's memory pattern)
  B. Pallas: table in VMEM, per-lane one-hot matmul gather (MXU) + math
  C. Pallas: table in VMEM, fori_loop dynamic-slice gather + math
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 16384   # table rows (killeroo-scale)
R = 1 << 15
ITERS = 8


def bench(f, *args, label=""):
    out = f(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    jax.tree_util.tree_map(lambda x: jax.block_until_ready(x), out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / 10
    print(f"{label}: {dt*1e3:.3f} ms  ({dt/ITERS*1e6:.1f} us/iter)")
    return dt


def slab_math(rt, ox, oy, oz, ix, iy, iz):
    lox, hix = rt[0:8], rt[8:16]
    loy, hiy = rt[16:24], rt[24:32]
    loz, hiz = rt[32:40], rt[40:48]
    t0x = (lox - ox) * ix
    t1x = (hix - ox) * ix
    t0y = (loy - oy) * iy
    t1y = (hiy - oy) * iy
    t0z = (loz - oz) * iz
    t1z = (hiz - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z))
    return tn, tf


@jax.jit
def xla_step(tab, idx, o, inv):
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    ix, iy, iz = inv[:, 0], inv[:, 1], inv[:, 2]
    acc = jnp.zeros((R,), jnp.float32)
    cur = idx
    for _ in range(ITERS):
        row = tab[cur]          # (R, 80) gather
        rt = row.T
        tn, tf = slab_math(rt, ox, oy, oz, ix, iy, iz)
        hit = tn <= tf
        acc = acc + jnp.sum(jnp.where(hit, tn, 0.0), axis=0)
        cur = (cur * 1103515245 + 12345) % N  # pseudo-random walk
    return acc


def pallas_loop_kernel(tab_ref, idx_ref, o_ref, inv_ref, out_ref, row_scr):
    BLK = idx_ref.shape[0]
    ox = o_ref[:, 0]
    oy = o_ref[:, 1]
    oz = o_ref[:, 2]
    ix = inv_ref[:, 0]
    iy = inv_ref[:, 1]
    iz = inv_ref[:, 2]
    acc = jnp.zeros((BLK,), jnp.float32)
    cur = idx_ref[:]

    def one_iter(it, carry):
        acc, cur = carry

        def gather_one(i, _):
            row_scr[i, :] = tab_ref[cur[i], :]
            return 0

        jax.lax.fori_loop(0, BLK, gather_one, 0)
        rt = row_scr[:, :].T
        tn, tf = slab_math(rt, ox, oy, oz, ix, iy, iz)
        hit = tn <= tf
        acc = acc + jnp.sum(jnp.where(hit, tn, 0.0), axis=0)
        cur = (cur * 1103515245 + 12345) % N
        return acc, cur

    acc, cur = jax.lax.fori_loop(0, ITERS, one_iter, (acc, cur))
    out_ref[:] = acc


def make_pallas_loop(BLK):
    grid = R // BLK

    return pl.pallas_call(
        pallas_loop_kernel,
        out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((N, 80), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BLK, 80), jnp.float32)],
        ),
    )


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((N, 80)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, R), jnp.int32)
    o = jnp.asarray(rng.random((R, 3)), jnp.float32)
    inv = jnp.asarray(1.0 / (rng.random((R, 3)) + 0.1), jnp.float32)

    print(f"table {N}x80 = {N*80*4/2**20:.1f} MiB, R={R}, iters={ITERS}")
    bench(xla_step, tab, idx, o, inv, label="A. XLA gather+slab")

    for BLK in (512, 2048):
        try:
            f = jax.jit(make_pallas_loop(BLK))
            bench(f, tab, idx, o, inv, label=f"C. pallas loop-gather BLK={BLK}")
        except Exception as e:
            print(f"C BLK={BLK} failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
