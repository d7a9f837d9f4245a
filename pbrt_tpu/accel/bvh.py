"""BVH construction (host, numpy) → flat SoA node arrays for the device.

Reference: src/accelerators/bvh.{h,cpp} — centroid-sorted recursive build
with 16-bucket SAH / middle / equal-counts split methods, flattened to a
depth-first ``LinearBVHNode`` array (32-byte nodes, bvh.cpp:105-115,
flattenBVHTree at :191).

TPU-native design: we build directly into SoA arrays — node_lo/node_hi
(N,3), node_second/node_count/node_axis (N,) — the exact structure the
reference linearizes into, but as separate arrays so traversal gathers are
coalesced per field. Primitives are permuted into leaf order (prim_order)
so a leaf is a contiguous [offset, offset+count) range. Interior nodes
store the second-child index (first child is always node i+1, depth-first).
"""

from __future__ import annotations

import dataclasses

import numpy as np

SAH_BUCKETS = 16
MAX_PRIMS_IN_NODE = 4
TRAVERSAL_COST = 0.125
INTERSECT_COST = 1.0


@dataclasses.dataclass
class BVH:
    node_lo: np.ndarray  # (N, 3) f32
    node_hi: np.ndarray  # (N, 3) f32
    node_second: np.ndarray  # (N,) i32: interior → second child; leaf → prim offset
    node_count: np.ndarray  # (N,) i32: 0 = interior, >0 = leaf prim count
    node_axis: np.ndarray  # (N,) i32 split axis (interior)
    prim_order: np.ndarray  # (P,) i32: leaf-order permutation of primitive ids

    @property
    def num_nodes(self) -> int:
        return len(self.node_count)


def build_bvh(
    prim_lo: np.ndarray,
    prim_hi: np.ndarray,
    method: str = "sah",
    max_prims_in_node: int = MAX_PRIMS_IN_NODE,
    use_native: bool = True,
) -> BVH:
    """Build over per-primitive AABBs. method ∈ {sah, middle, equal}.

    The SAH path uses the native C++ builder (runtime/bvh_builder.cpp) when
    available; this Python implementation is the reference/fallback and
    serves the middle/equal split methods."""
    if method == "sah" and use_native and len(prim_lo) > 0:
        tree = _build_bvh_native(prim_lo, prim_hi, max_prims_in_node)
        if tree is not None:
            return tree
    return _build_bvh_python(prim_lo, prim_hi, method, max_prims_in_node)


def _build_bvh_native(prim_lo, prim_hi, max_prims_in_node):
    from pbrt_tpu.utils.native import get_lib

    lib = get_lib()
    if lib is None:
        return None
    import ctypes

    n = len(prim_lo)
    lo = np.ascontiguousarray(prim_lo, np.float32)
    hi = np.ascontiguousarray(prim_hi, np.float32)
    max_nodes = 2 * n
    node_lo = np.empty((max_nodes, 3), np.float32)
    node_hi = np.empty((max_nodes, 3), np.float32)
    node_second = np.empty(max_nodes, np.int32)
    node_count = np.empty(max_nodes, np.int32)
    node_axis = np.empty(max_nodes, np.int32)
    prim_order = np.empty(n, np.int32)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n_nodes = lib.pbrt_tpu_build_bvh(
        fp(lo), fp(hi), n, max_prims_in_node, ctypes.c_float(TRAVERSAL_COST),
        fp(node_lo), fp(node_hi), ip(node_second), ip(node_count),
        ip(node_axis), ip(prim_order), max_nodes,
    )
    if n_nodes < 0:
        return None
    return BVH(
        node_lo=node_lo[:n_nodes].copy(),
        node_hi=node_hi[:n_nodes].copy(),
        node_second=node_second[:n_nodes].copy(),
        node_count=node_count[:n_nodes].copy(),
        node_axis=node_axis[:n_nodes].copy(),
        prim_order=prim_order,
    )


def _build_bvh_python(
    prim_lo: np.ndarray,
    prim_hi: np.ndarray,
    method: str = "sah",
    max_prims_in_node: int = MAX_PRIMS_IN_NODE,
) -> BVH:
    n = len(prim_lo)
    if n == 0:
        # single empty leaf so traversal code has something valid
        return BVH(
            node_lo=np.zeros((1, 3), np.float32),
            node_hi=np.full((1, 3), -1.0, np.float32),
            node_second=np.zeros(1, np.int32),
            node_count=np.zeros(1, np.int32),
            node_axis=np.zeros(1, np.int32),
            prim_order=np.zeros(0, np.int32),
        )
    prim_lo = np.asarray(prim_lo, np.float64)
    prim_hi = np.asarray(prim_hi, np.float64)
    centroids = 0.5 * (prim_lo + prim_hi)

    lo_list, hi_list, second_list, count_list, axis_list = [], [], [], [], []
    order: list[int] = []

    def new_node():
        lo_list.append(None)
        hi_list.append(None)
        second_list.append(0)
        count_list.append(0)
        axis_list.append(0)
        return len(lo_list) - 1

    # iterative recursion with explicit stack to survive big meshes
    def build(idx: np.ndarray) -> int:
        me = new_node()
        lo = prim_lo[idx].min(axis=0)
        hi = prim_hi[idx].max(axis=0)
        lo_list[me], hi_list[me] = lo, hi

        def make_leaf():
            second_list[me] = len(order)
            count_list[me] = len(idx)
            order.extend(int(i) for i in idx)

        if len(idx) <= 1:
            make_leaf()
            return me
        c = centroids[idx]
        clo, chi = c.min(axis=0), c.max(axis=0)
        axis = int(np.argmax(chi - clo))
        axis_list[me] = axis
        if chi[axis] - clo[axis] < 1e-12:
            if len(idx) <= max_prims_in_node:
                make_leaf()
                return me
            h = len(idx) // 2
            build(idx[:h])
            second_list[me] = build(idx[h:])
            count_list[me] = 0
            return me

        if method == "middle":
            mid_val = 0.5 * (clo[axis] + chi[axis])
            mask = c[:, axis] < mid_val
            if mask.all() or not mask.any():
                mask = np.zeros(len(idx), bool)
                mask[: len(idx) // 2] = True
            left, right = idx[mask], idx[~mask]
        elif method == "equal" or len(idx) <= 2:
            srt = idx[np.argsort(c[:, axis], kind="stable")]
            h = len(srt) // 2
            left, right = srt[:h], srt[h:]
        else:  # SAH with 16 buckets (reference: bvh.cpp:88-100)
            extent = chi[axis] - clo[axis]
            b = np.minimum(
                (SAH_BUCKETS * (c[:, axis] - clo[axis]) / extent).astype(int),
                SAH_BUCKETS - 1,
            )
            counts = np.bincount(b, minlength=SAH_BUCKETS)
            # per-bucket bounds
            blo = np.full((SAH_BUCKETS, 3), np.inf)
            bhi = np.full((SAH_BUCKETS, 3), -np.inf)
            for k in range(SAH_BUCKETS):
                sel = b == k
                if sel.any():
                    blo[k] = prim_lo[idx[sel]].min(axis=0)
                    bhi[k] = prim_hi[idx[sel]].max(axis=0)

            def sa(l, h):
                d = np.maximum(h - l, 0.0)
                return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])

            cost = np.empty(SAH_BUCKETS - 1)
            for k in range(SAH_BUCKETS - 1):
                n0 = counts[: k + 1].sum()
                n1 = counts[k + 1 :].sum()
                l0 = blo[: k + 1].min(axis=0) if n0 else np.zeros(3)
                h0 = bhi[: k + 1].max(axis=0) if n0 else np.zeros(3)
                l1 = blo[k + 1 :].min(axis=0) if n1 else np.zeros(3)
                h1 = bhi[k + 1 :].max(axis=0) if n1 else np.zeros(3)
                cost[k] = TRAVERSAL_COST + INTERSECT_COST * (
                    n0 * sa(l0, h0) + n1 * sa(l1, h1)
                ) / max(sa(lo, hi), 1e-20)
            best = int(np.argmin(cost))
            leaf_cost = INTERSECT_COST * len(idx)
            if len(idx) <= max_prims_in_node and leaf_cost <= cost[best]:
                make_leaf()
                return me
            mask = b <= best
            if mask.all() or not mask.any():
                srt = idx[np.argsort(c[:, axis], kind="stable")]
                h = len(srt) // 2
                left, right = srt[:h], srt[h:]
            else:
                left, right = idx[mask], idx[~mask]

        build(left)  # first child = me+1 (depth-first)
        second_list[me] = build(right)
        count_list[me] = 0
        return me

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))
    try:
        build(np.arange(n))
    finally:
        sys.setrecursionlimit(old_limit)

    return BVH(
        node_lo=np.asarray(lo_list, np.float32),
        node_hi=np.asarray(hi_list, np.float32),
        node_second=np.asarray(second_list, np.int32),
        node_count=np.asarray(count_list, np.int32),
        node_axis=np.asarray(axis_list, np.int32),
        prim_order=np.asarray(order, np.int32),
    )
