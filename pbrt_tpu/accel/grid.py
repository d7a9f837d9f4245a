"""Uniform-grid accelerator (host build + packed CSR voxel lists).

Reference: src/accelerators/grid.{h,cpp} — voxel resolution
``3·∛P / maxExtent`` per unit distance, capped at 64 per axis
(grid.cpp:31-45); primitives binned into every voxel their bound overlaps;
3D-DDA traversal (grid.h:39-80).

TPU-native design: voxel→primitive lists flattened to one CSR id array;
traversal (in ``pbrt_tpu.accel.intersect``) is a vmapped ``lax.while_loop``
stepping the DDA with branch-free axis selection.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class UniformGrid:
    dims: tuple  # (nx, ny, nz) static
    voxel_off: np.ndarray  # (nx*ny*nz,) i32 CSR offsets
    voxel_cnt: np.ndarray  # (nx*ny*nz,) i32
    prim_ids: np.ndarray  # (M,) i32
    world_lo: np.ndarray  # (3,)
    world_hi: np.ndarray  # (3,)


def build_grid(lo: np.ndarray, hi: np.ndarray) -> UniformGrid:
    """Bin world-space primitive bounds into a uniform voxel grid."""
    P = len(lo)
    if P == 0:
        return UniformGrid(
            dims=(1, 1, 1), voxel_off=np.zeros(1, np.int32),
            voxel_cnt=np.zeros(1, np.int32), prim_ids=np.zeros(1, np.int32),
            world_lo=np.zeros(3, np.float32), world_hi=np.ones(3, np.float32),
        )
    wlo = lo.min(axis=0)
    whi = hi.max(axis=0)
    delta = np.maximum(whi - wlo, 1e-6)
    max_ext = delta.max()
    # reference: int cubeRoot = 3 * P^(1/3); voxelsPerUnitDist =
    # cubeRoot / maxExtent; dims clamped to [1, 64] (grid.cpp:31-45)
    vpud = 3.0 * np.cbrt(P) / max_ext
    dims = np.clip((delta * vpud).round().astype(np.int64), 1, 64)
    nx, ny, nz = (int(d) for d in dims)
    width = delta / dims
    inv_w = 1.0 / width

    def vox(p, axis):
        return np.clip(((p - wlo[axis]) * inv_w[axis]).astype(np.int64), 0,
                       dims[axis] - 1)

    v0 = np.stack([vox(lo[:, a], a) for a in range(3)], 1)  # (P, 3)
    v1 = np.stack([vox(hi[:, a], a) for a in range(3)], 1)
    # scatter each prim into all overlapped voxels
    counts = np.zeros(nx * ny * nz, np.int64)
    entries_v = []
    entries_p = []
    span = (v1 - v0 + 1).prod(axis=1)
    for p in range(P):
        xs = np.arange(v0[p, 0], v1[p, 0] + 1)
        ys = np.arange(v0[p, 1], v1[p, 1] + 1)
        zs = np.arange(v0[p, 2], v1[p, 2] + 1)
        gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
        vids = (gz + nz * (gy + ny * gx)).ravel()
        entries_v.append(vids)
        entries_p.append(np.full(len(vids), p, np.int64))
    vv = np.concatenate(entries_v)
    pp = np.concatenate(entries_p)
    order = np.argsort(vv, kind="stable")
    vv = vv[order]
    pp = pp[order]
    np.add.at(counts, vv, 1)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return UniformGrid(
        dims=(nx, ny, nz),
        voxel_off=offs.astype(np.int32),
        voxel_cnt=counts.astype(np.int32),
        prim_ids=pp.astype(np.int32) if len(pp) else np.zeros(1, np.int32),
        world_lo=np.asarray(wlo, np.float32),
        world_hi=np.asarray(whi, np.float32),
    )
