"""Perf lab: measure BVH traversal variants on the real TPU.

Variants:
  A. current  — vmapped while_loop, per-lane (R,64) stack with scatter push
  B. shiftreg — same ordered traversal, stack as a shift register (roll +
                static slot-0 writes; no scatters, no dynamic stack gathers)
  C. skiplink — stackless threaded BVH (hit -> node+1, miss/leaf-done ->
                skip[node]); unordered but single scalar state per ray
  D. gatherbw — raw random-row gather throughput inside a fori_loop
                (upper bound for any gather-based traversal)

Run: JAX_PLATFORMS=axon python scripts/perf_lab.py   (or cpu)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = "/root/repo/.jax_cache"
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pbrt_tpu.scene.api import load_scene
from pbrt_tpu.scene.builder import build
from pbrt_tpu.accel import intersect as isect
from pbrt_tpu.core import geometry as geom

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"
R = int(os.environ.get("LAB_RAYS", 1 << 15))


def make_scene_and_rays():
    built = build(load_scene(KILLEROO))
    g = built.scene.geometry
    cam = built.camera
    res = 512
    n = R
    idx = np.arange(n, dtype=np.int32) % (res * res)
    ys, xs = np.divmod(idx, res)
    rng = np.random.default_rng(0)
    u = rng.random((n, 5), np.float32)
    scale = res / max(built.film_config.xres, 1)
    px = (xs + u[:, 0]) / scale * (built.film_config.xres / res * scale)
    rays = cam.generate_rays(
        jnp.asarray(xs + u[:, 0], jnp.float32) * (built.film_config.xres / res),
        jnp.asarray(ys + u[:, 1], jnp.float32) * (built.film_config.yres / res),
        jnp.asarray(u[:, 2]), jnp.asarray(u[:, 3]), jnp.asarray(u[:, 4]),
    )
    return built, g, rays


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


# --------------------------------------------------------------------- B
def traverse_shiftreg(g, o, d, tmin, tmax):
    """Ordered BVH traversal with the stack as a shift register."""
    inv_d = isect._make_inv_dir(d)
    dir_neg = (d < 0.0).astype(jnp.int32)
    test_prim = isect._make_test_prim(g, o, d, None)
    DEPTH = 48

    stack0 = jnp.zeros(DEPTH, jnp.int32)
    init = (
        jnp.int32(0),            # node = root
        jnp.int32(0),            # live stack entries
        stack0,
        jnp.asarray(tmax, jnp.float32),
        jnp.int32(-1), jnp.float32(0.0), jnp.float32(0.0),
        jnp.bool_(True),
    )

    def cond(s):
        return s[7]

    def body(s):
        node, n_stack, stack, t_best, prim_best, b1b, b2b, alive = s
        row = g.node_packed[node]
        hit_box = alive & isect._slab(row[0:3], row[3:6], o, inv_d, tmin, t_best)
        second = row[6].astype(jnp.int32)
        meta = row[7].astype(jnp.int32)
        count = meta >> 2
        axis = meta & 3
        is_leaf = count > 0

        do_leaf = hit_box & is_leaf
        offset = second
        for i in range(isect.MAX_LEAF):
            in_leaf = do_leaf & (i < count)
            p = g.prim_order[jnp.minimum(offset + i, g.prim_order.shape[0] - 1)]
            h, t, u1, u2 = test_prim(p, tmin, t_best)
            better = in_leaf & h & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            prim_best = jnp.where(better, p, prim_best)
            b1b = jnp.where(better, u1, b1b)
            b2b = jnp.where(better, u2, b2b)

        push = hit_box & (~is_leaf)
        near_first = dir_neg[axis] == 0
        c_near = jnp.where(near_first, node + 1, second)
        c_far = jnp.where(near_first, second, node + 1)

        # push far child: shift register moves everything down one slot
        stack_push = jnp.roll(stack, 1).at[0].set(c_far)
        stack = jnp.where(push, stack_push, stack)
        n_stack = n_stack + push.astype(jnp.int32)

        # descend to near child, or pop slot 0
        pop = (~push)
        popped = stack[0]
        stack_pop = jnp.roll(stack, -1)
        stack = jnp.where(pop, stack_pop, stack)
        node = jnp.where(push, c_near, popped)
        alive = alive & ~(pop & (n_stack == 0))
        n_stack = jnp.maximum(n_stack - pop.astype(jnp.int32), 0)
        return (node, n_stack, stack, t_best, prim_best, b1b, b2b, alive)

    out = jax.lax.while_loop(cond, body, init)
    return out[3], out[4], out[5], out[6]


# --------------------------------------------------------------------- C
def build_skip_links(g):
    """Threaded-BVH links: enter[node] = node+1 (interior) and
    skip[node] = next node in DFS when the subtree is skipped/done."""
    second = np.asarray(g.node_second)
    count = np.asarray(g.node_count)
    N = second.shape[0]
    skip = np.zeros(N, np.int32)

    def assign(node, skip_to):
        # iterative DFS with explicit stack
        stack = [(node, skip_to)]
        while stack:
            n, s = stack.pop()
            skip[n] = s
            if count[n] == 0:  # interior: children are n+1 and second[n]
                stack.append((n + 1, second[n]))
                stack.append((second[n], s))

    assign(0, -1)
    return jnp.asarray(skip)


def traverse_skiplink(g, skip, o, d, tmin, tmax):
    inv_d = isect._make_inv_dir(d)
    test_prim = isect._make_test_prim(g, o, d, None)

    init = (
        jnp.int32(0),
        jnp.asarray(tmax, jnp.float32),
        jnp.int32(-1), jnp.float32(0.0), jnp.float32(0.0),
    )

    def cond(s):
        return s[0] >= 0

    def body(s):
        node, t_best, prim_best, b1b, b2b = s
        row = g.node_packed[node]
        hit_box = isect._slab(row[0:3], row[3:6], o, inv_d, tmin, t_best)
        second = row[6].astype(jnp.int32)
        meta = row[7].astype(jnp.int32)
        count = meta >> 2
        is_leaf = count > 0

        do_leaf = hit_box & is_leaf
        offset = second
        for i in range(isect.MAX_LEAF):
            in_leaf = do_leaf & (i < count)
            p = g.prim_order[jnp.minimum(offset + i, g.prim_order.shape[0] - 1)]
            h, t, u1, u2 = test_prim(p, tmin, t_best)
            better = in_leaf & h & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            prim_best = jnp.where(better, p, prim_best)
            b1b = jnp.where(better, u1, b1b)
            b2b = jnp.where(better, u2, b2b)

        node = jnp.where(hit_box & (~is_leaf), node + 1, skip[node])
        return (node, t_best, prim_best, b1b, b2b)

    out = jax.lax.while_loop(cond, body, init)
    return out[1], out[2], out[3], out[4]


def main():
    print("devices:", jax.devices())
    built, g, rays = make_scene_and_rays()
    print(f"tris={g.num_triangles} quads={g.num_quadrics} "
          f"nodes={g.node_lo.shape[0]} rays={R}")

    # ---- A: current
    fA = jax.jit(lambda g, r: isect.intersect(g, r, any_hit=False))
    tA, hA = timeit(fA, g, rays)
    nhit = int((np.asarray(hA.prim) >= 0).sum())
    print(f"A current     : {tA*1e3:8.2f} ms  {R/tA/1e6:8.2f} Mray/s  hits={nhit}")

    # ---- B: shiftreg
    @jax.jit
    def fB(g, r):
        f = jax.vmap(lambda o, d, t0, t1: traverse_shiftreg(g, o, d, t0, t1))
        return f(r.origin, r.direction, r.tmin, r.tmax)

    tB, hB = timeit(fB, g, rays)
    nhitB = int((np.asarray(hB[1]) >= 0).sum())
    agree = int((np.asarray(hB[1]) == np.asarray(hA.prim)).sum())
    print(f"B shiftreg    : {tB*1e3:8.2f} ms  {R/tB/1e6:8.2f} Mray/s  hits={nhitB} agree={agree}/{R}")

    # ---- C: skiplink
    skip = build_skip_links(g)

    @jax.jit
    def fC(g, skip, r):
        f = jax.vmap(lambda o, d, t0, t1: traverse_skiplink(g, skip, o, d, t0, t1))
        return f(r.origin, r.direction, r.tmin, r.tmax)

    tC, hC = timeit(fC, g, skip, rays)
    nhitC = int((np.asarray(hC[1]) >= 0).sum())
    agreeC = int((np.asarray(hC[1]) == np.asarray(hA.prim)).sum())
    print(f"C skiplink    : {tC*1e3:8.2f} ms  {R/tC/1e6:8.2f} Mray/s  hits={nhitC} agree={agreeC}/{R}")

    # ---- D: gather bandwidth ceiling
    N = g.node_packed.shape[0]
    table = jnp.asarray(np.random.default_rng(0).random((N, 8), np.float32))
    idx0 = jnp.asarray(np.random.default_rng(1).integers(0, N, R).astype(np.int32))
    STEPS = 64

    @jax.jit
    def fD(table, idx):
        def body(i, c):
            idx, acc = c
            rows = table[idx]
            acc = acc + rows.sum(-1)
            idx = (idx * 1664525 + 1013904223) % N
            return (idx, acc)
        _, acc = jax.lax.fori_loop(0, STEPS, body, (idx, jnp.zeros(R)))
        return acc

    tD, _ = timeit(fD, table, idx0)
    per_gather = tD / STEPS
    print(f"D gather      : {per_gather*1e6:8.1f} us/step ({R} rows x 32B) "
          f"-> {R*32/per_gather/1e9:6.1f} GB/s  {STEPS} steps total {tD*1e3:.2f} ms")


if __name__ == "__main__":
    main()
