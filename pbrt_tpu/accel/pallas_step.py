"""Pallas TPU kernel for the 8-wide traversal step's interpret phase.

The warm-loop step (accel/intersect.py `_traverse_wide_batch.step`) splits
into: (a) the row gather — stays in XLA, which already streams it at
~200 GB/s (PERF.md r5 findings); (b) ~60 slot-major vector ops: 8-wide
slab test, 8-way Möller–Trumbore, a 19-stage sort network and the leaf
argmin. This kernel fuses (b) into one VMEM-resident pass, eliminating
the dozens of intermediate (8, R) materializations XLA schedules between
fusions.

Enabled with PBRT_TPU_PALLAS_STEP=1 (off by default until it measures
faster than the XLA fusion on the target part; see PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the same sort network as intersect._SORT8 (odd-even merge, 19 stages)
_SORT8 = [
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6), (1, 4), (3, 6),
    (2, 4), (3, 5), (3, 4),
]

BLK = 256


def _step_kernel(row_ref, o_ref, d_ref, inv_ref, lim_ref, flag_ref,
                 refs_out, nhit_out, leaf_out):
    rt = row_ref[:, :].T  # (80, BLK)
    ox, oy, oz = o_ref[:, 0], o_ref[:, 1], o_ref[:, 2]
    dx, dy, dz = d_ref[:, 0], d_ref[:, 1], d_ref[:, 2]
    ix, iy, iz = inv_ref[:, 0], inv_ref[:, 1], inv_ref[:, 2]
    tmin_ = lim_ref[:, 0]
    t_best = lim_ref[:, 1]
    is_node = flag_ref[:, 0] > 0
    act = flag_ref[:, 1] > 0

    lox, hix = rt[0:8], rt[8:16]
    loy, hiy = rt[16:24], rt[24:32]
    loz, hiz = rt[32:40], rt[40:48]
    t0x = (lox - ox) * ix
    t1x = (hix - ox) * ix
    t0y = (loy - oy) * iy
    t1y = (hiy - oy) * iy
    t0z = (loz - oz) * iz
    t1z = (hiz - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    enter = jnp.maximum(tn, tmin_)
    exit_ = jnp.minimum(tf, t_best)
    valid8 = lox <= hix
    hit8 = (enter <= exit_) & valid8 & is_node & act
    refs = rt[48:56].astype(jnp.int32)

    key = [jnp.where(hit8[k], enter[k], jnp.inf) for k in range(8)]
    refs_l = [refs[k] for k in range(8)]
    for i, j in _SORT8:
        swap = key[i] > key[j]
        ki, kj = key[i], key[j]
        ri, rj = refs_l[i], refs_l[j]
        key[i] = jnp.where(swap, kj, ki)
        key[j] = jnp.where(swap, ki, kj)
        refs_l[i] = jnp.where(swap, rj, ri)
        refs_l[j] = jnp.where(swap, ri, rj)
    n_hit = jnp.sum(hit8.astype(jnp.int32), axis=0)

    # leaf half: 8-way Möller–Trumbore
    v0x, v0y, v0z = rt[0:8], rt[8:16], rt[16:24]
    e1x, e1y, e1z = rt[24:32], rt[32:40], rt[40:48]
    e2x, e2y, e2z = rt[48:56], rt[56:64], rt[64:72]
    pid = rt[72:80].astype(jnp.int32)
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    b1 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    b2 = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    ok8 = (
        (~is_node) & act & (pid >= 0)
        & (jnp.abs(det) >= 1e-12)
        & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
        & (t > tmin_) & (t < t_best)
    )
    tcand = jnp.where(ok8, t, jnp.inf)
    tsel = jnp.min(tcand, axis=0)
    jbest = jnp.argmin(tcand, axis=0)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (8, BLK), 0) == jbest[None, :]
    )
    psel = jnp.sum(jnp.where(sel, pid, 0), axis=0)
    b1sel = jnp.sum(jnp.where(sel, b1, 0.0), axis=0)
    b2sel = jnp.sum(jnp.where(sel, b2, 0.0), axis=0)

    for k in range(8):
        refs_out[k, :] = refs_l[k]
    nhit_out[0, :] = n_hit
    leaf_out[0, :] = tsel
    leaf_out[1, :] = psel.astype(jnp.float32)
    leaf_out[2, :] = b1sel
    leaf_out[3, :] = b2sel


@functools.partial(jax.jit, static_argnames=())
def step_interpret(row, o, d, inv, tmin, t_best, is_node, act):
    """(R, 80) row + per-lane ray state → (refs_sorted (8,R) i32,
    n_hit (R,) i32, tsel (R,), psel (R,) i32, b1 (R,), b2 (R,))."""
    R = row.shape[0]
    assert R % BLK == 0, R
    lim = jnp.stack([tmin, t_best], axis=-1)
    flag = jnp.stack(
        [is_node.astype(jnp.float32), act.astype(jnp.float32)], axis=-1
    )
    grid = R // BLK
    refs, nhit, leaf = pl.pallas_call(
        _step_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((4, R), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((BLK, 80), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((8, BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
    )(row, o, d, inv, lim, flag)
    return (refs, nhit[0], leaf[0], leaf[1].astype(jnp.int32), leaf[2],
            leaf[3])
