"""Traversal cost decomposition on the real TPU: variants of the 8-wide
unified-row traversal with individual costs knocked out, plus step-count
statistics, on the killeroo bench scene with incoherent rays."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.tpu_timing import tbench, rtt
from pbrt_tpu.scene.api import load_scene
from pbrt_tpu.scene.builder import build
from pbrt_tpu.accel.intersect import intersect, _make_inv_dir, _SORT8
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import rng as rngmod

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"
R = 1 << 15


def traverse_variant(g, o, d, tmin, tmax, *, stack_w=48, do_sort=True,
                     no_gather=False, count_steps=False):
    """Copy of _traverse_wide_one with knobs (quadrics skipped: killeroo
    has none on the hot path)."""
    rows = g.wide_rows
    inv_d = _make_inv_dir(d)
    stack0 = jnp.zeros(stack_w, jnp.int32)
    init = (
        jnp.int32(0), stack0, jnp.int32(0),
        jnp.asarray(tmax, jnp.float32), jnp.int32(-1),
        jnp.float32(0.0), jnp.float32(0.0), jnp.bool_(True),
        jnp.int32(0),
    )

    def cond(s):
        return s[7]

    def body(s):
        cur, stack, n_stack, t_best, prim_best, b1b, b2b, alive, n_it = s
        is_node = cur >= 0
        row_idx = jnp.where(is_node, cur, -cur - 1)
        if no_gather:
            row = rows[0] + jnp.float32(row_idx) * 0.0
        else:
            row = rows[row_idx]
        lo = jnp.stack([row[0:8], row[16:24], row[32:40]])
        hi = jnp.stack([row[8:16], row[24:32], row[40:48]])
        t0 = (lo - o[:, None]) * inv_d[:, None]
        t1 = (hi - o[:, None]) * inv_d[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=0)
        tf = jnp.min(jnp.maximum(t0, t1), axis=0)
        enter = jnp.maximum(tn, tmin)
        exit_ = jnp.minimum(tf, t_best)
        valid8 = row[0:8] <= row[8:16]
        hit8 = (enter <= exit_) & valid8 & is_node & alive
        refs = row[48:56].astype(jnp.int32)

        key = jnp.where(hit8, enter, jnp.inf)
        if do_sort:
            key = list(key)
            refs_l = list(refs)
            for i, j in _SORT8:
                swap = key[i] > key[j]
                ki, kj = key[i], key[j]
                ri, rj = refs_l[i], refs_l[j]
                key[i] = jnp.where(swap, kj, ki)
                key[j] = jnp.where(swap, ki, kj)
                refs_l[i] = jnp.where(swap, rj, ri)
                refs_l[j] = jnp.where(swap, ri, rj)
        else:
            # hits-first compaction without nearest ordering: stable
            # sort by hit flag only (still a network, but on 1-bit keys)
            key = list(jnp.where(hit8, 0.0, 1.0))
            refs_l = list(refs)
            for i, j in _SORT8:
                swap = key[i] > key[j]
                ki, kj = key[i], key[j]
                ri, rj = refs_l[i], refs_l[j]
                key[i] = jnp.where(swap, kj, ki)
                key[j] = jnp.where(swap, ki, kj)
                refs_l[i] = jnp.where(swap, rj, ri)
                refs_l[j] = jnp.where(swap, ri, rj)
        n_hit = jnp.sum(hit8.astype(jnp.int32))

        is_leaf = ~is_node
        v0x, v0y, v0z = row[0:8], row[8:16], row[16:24]
        e1x, e1y, e1z = row[24:32], row[32:40], row[40:48]
        e2x, e2y, e2z = row[48:56], row[56:64], row[64:72]
        pid = row[72:80].astype(jnp.int32)
        pvx = d[1] * e2z - d[2] * e2y
        pvy = d[2] * e2x - d[0] * e2z
        pvz = d[0] * e2y - d[1] * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
        tvx, tvy, tvz = o[0] - v0x, o[1] - v0y, o[2] - v0z
        b1 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        b2 = (d[0] * qvx + d[1] * qvy + d[2] * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        ok8 = (
            is_leaf & alive & (pid >= 0)
            & (jnp.abs(det) >= 1e-12)
            & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
            & (t > tmin) & (t < t_best)
        )
        tcand = jnp.where(ok8, t, jnp.inf)
        jbest = jnp.argmin(tcand)
        sel = jax.lax.broadcasted_iota(jnp.int32, (8,), 0) == jbest
        tsel = jnp.min(tcand)
        any_ok = tsel < t_best
        t_best = jnp.where(any_ok, tsel, t_best)
        prim_best = jnp.where(any_ok, jnp.sum(jnp.where(sel, pid, 0)), prim_best)
        b1b = jnp.where(any_ok, jnp.sum(jnp.where(sel, b1, 0.0)), b1b)
        b2b = jnp.where(any_ok, jnp.sum(jnp.where(sel, b2, 0.0)), b2b)

        descend = is_node & (n_hit > 0)
        pc = jnp.where(descend, n_hit - 1, 0)
        cands = refs_l[1:8]
        variants = []
        for k in range(8):
            if k == 0:
                variants.append(stack)
            else:
                variants.append(
                    jnp.concatenate(
                        [jnp.stack(cands[:k]), stack[: stack_w - k]]
                    )
                )
        stack = variants[0]
        for k in range(1, 8):
            stack = jnp.where(pc == k, variants[k], stack)
        n_stack = jnp.minimum(n_stack + pc, stack_w)

        pop = ~descend
        cur = jnp.where(descend, refs_l[0], stack[0])
        stack_pop = jnp.concatenate([stack[1:], jnp.zeros(1, jnp.int32)])
        stack = jnp.where(pop, stack_pop, stack)
        alive = alive & ~(pop & (n_stack == 0))
        n_stack = jnp.maximum(n_stack - pop.astype(jnp.int32), 0)
        return (cur, stack, n_stack, t_best, prim_best, b1b, b2b, alive,
                n_it + 1)

    out = jax.lax.while_loop(cond, body, init)
    if count_steps:
        return out[3], out[4], out[8]
    return out[3], out[4], out[8]


def main():
    print("rtt:", rtt() * 1e3, "ms", flush=True)
    built = build(load_scene(KILLEROO))
    g = built.scene.geometry
    cam = built.camera
    res = 512
    idx = np.arange(R, dtype=np.int32) % (res * res)
    ys, xs = np.divmod(idx, res)
    root = rngmod.root_key(0)
    keys = rngmod.pixel_sample_key(root, jnp.asarray(ys * res + xs), jnp.int32(0))
    u = rngmod.uniform_per(keys, 5)
    rays = cam.generate_rays(jnp.asarray(xs, jnp.float32) + u[:, 0],
                             jnp.asarray(ys, jnp.float32) + u[:, 1],
                             u[:, 2], u[:, 3], u[:, 4])
    hit = intersect(g, rays)
    p = rays.origin + hit.t[:, None] * rays.direction
    rng = np.random.default_rng(0)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_inc = jnp.where(hit.valid[:, None], p, rays.origin)
    d_inc = jnp.asarray(d)
    tmin = jnp.full((R,), 1e-3, jnp.float32)
    tmax = jnp.full((R,), 1e30, jnp.float32)

    def bench(label, **kw):
        f = jax.jit(lambda o, dd, t0, t1: jax.vmap(
            lambda oo, ddd, a, b: traverse_variant(g, oo, ddd, a, b, **kw)
        )(o, dd, t0, t1)[0].sum())
        tbench(f, o_inc, d_inc, tmin, tmax, label=label)

    # step-count stats
    f_steps = jax.jit(lambda o, dd, t0, t1: jax.vmap(
        lambda oo, ddd, a, b: traverse_variant(g, oo, ddd, a, b)
    )(o, dd, t0, t1)[2])
    steps = np.asarray(f_steps(o_inc, d_inc, tmin, tmax))
    print(f"steps: mean {steps.mean():.1f} p50 {np.percentile(steps,50):.0f} "
          f"p90 {np.percentile(steps,90):.0f} p99 {np.percentile(steps,99):.0f} "
          f"max {steps.max()}", flush=True)

    bench("baseline (48, sort)")
    bench("stack 24", stack_w=24)
    bench("stack 16", stack_w=16)
    bench("no entry-sort", do_sort=False)
    bench("no gather (row0)", no_gather=True)
    bench("no gather + stack16", no_gather=True, stack_w=16)


if __name__ == "__main__":
    main()
