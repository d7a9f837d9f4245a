"""Device-side scene geometry (SoA) and batched ray intersection.

Reference behavior: Scene::Intersect/IntersectP dispatching into
BVHAccel::Intersect's iterative stack walk over LinearBVHNode[]
(reference: src/accelerators/bvh.cpp:105-200) and per-primitive
Triangle::Intersect (src/shapes/trianglemesh.cpp:120-200) / quadric
intersections (src/shapes/{sphere,cylinder,disk,...}.cpp).

TPU-native design:
  - One flattened world-space geometry pytree (``SceneGeometry``): triangle
    soup SoA + quadric table SoA + linear BVH arrays. Primitive ids are
    global: [0, T) triangles, [T, T+Q) quadrics.
  - Traversal is a per-ray short-stack ``lax.while_loop`` vmapped over the
    wavefront — XLA masks the batch so the loop runs until the last ray
    terminates (wavefront semantics for free).
  - A hit is (t, prim, b1, b2); differential geometry (position, normals,
    uv, dpdu) is reconstructed afterwards by ``shading_geometry`` only for
    surviving rays — keeps the traversal state tiny.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.utils import pytree_dataclass, static_field

MAX_STACK = 64
#: node pops unrolled inside each while_loop iteration — amortizes the
#: loop's fixed per-iteration overhead on TPU (masked no-ops when a lane's
#: stack is empty)
STEPS_PER_ITER = 4
#: leaves are guaranteed ≤ this many prims by both BVH builders — the leaf
#: test loop unrolls statically (a dynamic trip count under vmap would force
#: JAX to broadcast the whole scene per-ray)
MAX_LEAF = 4

# quadric type codes
SPHERE, CYLINDER, DISK, CONE, PARABOLOID, HYPERBOLOID = 0, 1, 2, 3, 4, 5


@pytree_dataclass
class SceneGeometry:
    # --- triangles (world space) ---
    tri_v0: jnp.ndarray  # (T, 3)
    tri_e1: jnp.ndarray  # (T, 3) v1 - v0
    tri_e2: jnp.ndarray  # (T, 3) v2 - v0
    tri_n0: jnp.ndarray  # (T, 3) shading normals (face normal if mesh had none)
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_uv0: jnp.ndarray  # (T, 2)
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_material: jnp.ndarray  # (T,) i32 index into material table
    tri_area_light: jnp.ndarray  # (T,) i32 area-light id, -1 = none
    tri_mesh_id: jnp.ndarray  # (T,) i32 fork primitive id (metadata masks)
    # --- quadrics ---
    quad_type: jnp.ndarray  # (Q,) i32
    quad_o2w: jnp.ndarray  # (Q, 4, 4)
    quad_w2o: jnp.ndarray  # (Q, 4, 4)
    quad_params: jnp.ndarray  # (Q, 8) radius/zmin/zmax/phimax/height/inner_r/...
    quad_material: jnp.ndarray  # (Q,)
    quad_area_light: jnp.ndarray  # (Q,)
    quad_mesh_id: jnp.ndarray  # (Q,)
    quad_reverse: jnp.ndarray  # (Q,) bool reverseorientation ^ swaps_handedness
    # --- BVH ---
    node_lo: jnp.ndarray  # (N, 3)
    node_hi: jnp.ndarray  # (N, 3)
    node_second: jnp.ndarray  # (N,) i32
    node_count: jnp.ndarray  # (N,) i32
    node_axis: jnp.ndarray  # (N,) i32
    prim_order: jnp.ndarray  # (P,) i32
    world_lo: jnp.ndarray  # (3,)
    world_hi: jnp.ndarray  # (3,)
    #: packed hot data: one gather per node / per triangle in the traversal
    #: node_packed: [lo.xyz, hi.xyz, float(second), float(count*4+axis)]
    node_packed: jnp.ndarray = None  # (N, 8) f32
    #: tri_packed: [v0.xyz, e1.xyz, e2.xyz]
    tri_packed: jnp.ndarray = None  # (T, 9) f32
    # --- motion blur (animated TransformedPrimitive; reference:
    # core/primitive.h:89 + AnimatedTransform). Embree-style motion-blurred
    # vertex buffers: per-triangle shutter-end deltas, lerped by ray time —
    # the accelerator-idiomatic equivalent of per-ray transform slerp.
    tri_motion: jnp.ndarray = None  # (T, 9) delta of [v0, e1, e2]
    tri_n_motion: jnp.ndarray = None  # (T, 9) delta of [n0, n1, n2]
    motion_time: jnp.ndarray = None  # (2,) transform start/end times
    has_motion: bool = static_field(default=False)
    # --- alternative accelerators (Accelerator "kdtree"/"grid";
    # reference: src/accelerators/kdtreeaccel.cpp, grid.cpp) ---
    accel_kind: str = static_field(default="bvh")  # bvh | kdtree | grid
    kd_split: jnp.ndarray = None  # (N,) f32
    kd_axis: jnp.ndarray = None  # (N,) i32, 3 = leaf
    kd_above: jnp.ndarray = None  # (N,) i32 (below child = node+1)
    kd_prim_off: jnp.ndarray = None  # (N,) i32 CSR
    kd_prim_cnt: jnp.ndarray = None  # (N,) i32
    kd_prim_ids: jnp.ndarray = None  # (M,) i32 global prim ids
    grid_dims: tuple = static_field(default=None)  # (nx, ny, nz)
    grid_off: jnp.ndarray = None  # (V,) i32 CSR
    grid_cnt: jnp.ndarray = None  # (V,) i32
    grid_ids: jnp.ndarray = None  # (M,) i32
    # --- 8-wide unified BVH (accel/wide.py) — the default fast path.
    # One (M, 80) f32 row per step: 8 child boxes+refs (node rows) or 8
    # packed triangles (leaf rows). Quadrics are NOT in this tree; they are
    # tested densely per ray (Q is small in every pbrt scene).
    wide_rows: jnp.ndarray = None  # (M, 80) f32
    wide_motion: jnp.ndarray = None  # (M, 80) f32 shutter-end deltas
    #: exact worst-case stack need of THIS wide tree (build-time computed,
    #: wide.py _compute_max_stack) — sized so overflow cannot occur
    wide_stack: int = static_field(default=48)
    #: static set of quadric type codes present — the 6-way type switch
    #: compiles only these branches (same mechanism as the light table's
    #: active_types)
    quad_active_types: tuple = static_field(default=(0, 1, 2, 3, 4, 5))
    # --- memory-shared instancing (reference: TransformedPrimitive,
    # primitive.h:89): per-object BLAS wide tables concatenated into
    # inst_rows; one instance-table row per static ObjectInstance use.
    # Object-space triangles live at [num_world_tris, T) of the tri tables
    # (their normals/tangents rotate by the hit instance's transform).
    inst_rows: jnp.ndarray = None  # (Mi, 80) f32 concatenated BLAS tables
    inst_o2w: jnp.ndarray = None  # (I, 4, 4)
    inst_w2o: jnp.ndarray = None  # (I, 4, 4)
    inst_root: jnp.ndarray = None  # (I,) i32 BLAS root row
    inst_lo: jnp.ndarray = None  # (I, 3) world-space instance bounds
    inst_hi: jnp.ndarray = None  # (I, 3)
    inst_mesh_id: jnp.ndarray = None  # (I,) fresh primitive id per use
    inst_stack: int = static_field(default=8)  # max BLAS stack need
    #: per-triangle shading row (pack_geometry): one aligned gather feeds
    #: surface_interaction instead of 11 separate table gathers
    tri_shade_rows: jnp.ndarray = None  # (T, 32) f32

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]

    @property
    def num_quadrics(self) -> int:
        return self.quad_type.shape[0]


def pack_geometry(g: "SceneGeometry") -> "SceneGeometry":
    """Build the packed hot arrays (idempotent).

    Node metadata rides in the f32 row as exact small integers (both
    second-child index and count·4+axis are ≪ 2²⁴, so float32 represents
    them exactly) — NOT as bitcasts: ``bitcast_convert_type`` inside the
    vmapped traversal loop hard-crashes the axon TPU backend."""
    import dataclasses

    meta = (g.node_count * 4 + g.node_axis).astype(jnp.float32)
    node_packed = jnp.concatenate(
        [
            g.node_lo.astype(jnp.float32),
            g.node_hi.astype(jnp.float32),
            g.node_second.astype(jnp.float32)[:, None],
            meta[:, None],
        ],
        axis=1,
    )
    tri_packed = jnp.concatenate([g.tri_v0, g.tri_e1, g.tri_e2], axis=1)
    # per-triangle SHADING row: everything surface_interaction needs in one
    # aligned 32-float gather (e1,e2,n0,n1,n2,uv0,uv1,uv2,material,
    # area_light,mesh_id as exact f32) — replaces 11 separate gathers
    # (r3 measured: 8.8 ms → row gather per 32k-ray wave)
    T = g.num_triangles
    if T:
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        shade = jnp.concatenate(
            [
                f32(g.tri_e1), f32(g.tri_e2),
                f32(g.tri_n0), f32(g.tri_n1), f32(g.tri_n2),
                f32(g.tri_uv0), f32(g.tri_uv1), f32(g.tri_uv2),
                f32(g.tri_material)[:, None],
                f32(g.tri_area_light)[:, None],
                f32(g.tri_mesh_id)[:, None],
            ],
            axis=1,
        )
        pad = (-shade.shape[1]) % 8
        if pad:
            shade = jnp.pad(shade, ((0, 0), (0, pad)))
    else:
        shade = jnp.zeros((0, 32), jnp.float32)
    return dataclasses.replace(
        g, node_packed=node_packed, tri_packed=tri_packed,
        tri_shade_rows=shade,
    )


class Hit(NamedTuple):
    """Minimal hit record carried through traversal (SoA over rays)."""

    t: jnp.ndarray  # (R,)
    prim: jnp.ndarray  # (R,) global prim id, -1 = miss
    b1: jnp.ndarray  # (R,) triangle barycentric / quadric u
    b2: jnp.ndarray  # (R,) triangle barycentric / quadric v
    #: instance-table row of the hit (-1 = not instanced); None when the
    #: scene has no TLAS instances
    inst: jnp.ndarray = None

    @property
    def valid(self):
        return self.prim >= 0


# ---------------------------------------------------------------------------
# Primitive tests (single ray × single primitive; vmapped by callers)
# ---------------------------------------------------------------------------


def _tri_test(g: SceneGeometry, p, o, d, tmin, tmax):
    """Möller–Trumbore. Returns (hit, t, b1, b2)."""
    v0 = g.tri_v0[p]
    e1 = g.tri_e1[p]
    e2 = g.tri_e2[p]
    pv = jnp.cross(d, e2)
    det = jnp.dot(e1, pv)
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tv = o - v0
    b1 = jnp.dot(tv, pv) * inv_det
    qv = jnp.cross(tv, e1)
    b2 = jnp.dot(d, qv) * inv_det
    t = jnp.dot(e2, qv) * inv_det
    hit = (
        (jnp.abs(det) >= 1e-12)
        & (b1 >= 0.0)
        & (b2 >= 0.0)
        & (b1 + b2 <= 1.0)
        & (t > tmin)
        & (t < tmax)
    )
    return hit, t, b1, b2


def _quadratic(a, b, c):
    """Stable quadratic solve (reference: pbrt.h:286-311). Returns
    (has_roots, t0, t1) with t0 <= t1."""
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    safe = lambda x, y: x / jnp.where(jnp.abs(y) < 1e-20, 1e-20, y)
    t0 = safe(q, a)
    t1 = safe(c, q)
    return ok, jnp.minimum(t0, t1), jnp.maximum(t0, t1)


def _quad_test(g: SceneGeometry, q, o_w, d_w, tmin, tmax):
    """Quadric intersection in object space. Returns (hit, t, u, v).

    u, v are the parametric coordinates (φ/φmax, height/θ fraction) used by
    shading_geometry to reconstruct normals.
    """
    w2o = g.quad_w2o[q]
    o = o_w @ w2o[:3, :3].T + w2o[:3, 3]
    d = d_w @ w2o[:3, :3].T
    typ = g.quad_type[q]
    prm = g.quad_params[q]
    radius, zmin, zmax, phimax = prm[0], prm[1], prm[2], prm[3]
    height, inner_r = prm[4], prm[5]

    ox, oy, oz = o[0], o[1], o[2]
    dx, dy, dz = d[0], d[1], d[2]

    def clip_root(thit, ok_fn):
        """Try t0 then t1 against clipping predicate ok_fn(point, phi)."""
        return thit

    def phi_of(p):
        phi = jnp.arctan2(p[1], p[0])
        return jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)

    def pick(ok, t0, t1, valid_fn):
        """Choose nearest valid root with clip test (pbrt two-root pattern)."""
        p0 = o + t0 * d
        p1 = o + t1 * d
        v0 = ok & (t0 > tmin) & (t0 < tmax) & valid_fn(p0)
        v1 = ok & (t1 > tmin) & (t1 < tmax) & valid_fn(p1)
        t = jnp.where(v0, t0, jnp.where(v1, t1, jnp.inf))
        return v0 | v1, t

    eps_z = 1e-5

    # -- sphere (reference: shapes/sphere.cpp:90-150)
    def sphere():
        a = dx * dx + dy * dy + dz * dz
        b = 2.0 * (dx * ox + dy * oy + dz * oz)
        c = ox * ox + oy * oy + oz * oz - radius * radius
        ok, t0, t1 = _quadratic(a, b, c)

        def valid(p):
            return (
                (p[2] >= zmin - eps_z)
                & (p[2] <= zmax + eps_z)
                & (phi_of(p) <= phimax + 1e-6)
            )

        return pick(ok, t0, t1, valid)

    # -- cylinder (reference: shapes/cylinder.cpp:80-130)
    def cylinder():
        a = dx * dx + dy * dy
        b = 2.0 * (dx * ox + dy * oy)
        c = ox * ox + oy * oy - radius * radius
        ok, t0, t1 = _quadratic(a, b, c)

        def valid(p):
            return (p[2] >= zmin) & (p[2] <= zmax) & (phi_of(p) <= phimax + 1e-6)

        return pick(ok, t0, t1, valid)

    # -- disk (reference: shapes/disk.cpp:75-115)
    def disk():
        t = jnp.where(jnp.abs(dz) < 1e-9, jnp.inf, (height - oz) / dz)
        p = o + t * d
        r2 = p[0] * p[0] + p[1] * p[1]
        v = (
            (t > tmin)
            & (t < tmax)
            & jnp.isfinite(t)
            & (r2 <= radius * radius)
            & (r2 >= inner_r * inner_r)
            & (phi_of(p) <= phimax + 1e-6)
        )
        return v, jnp.where(v, t, jnp.inf)

    # -- cone (reference: shapes/cone.cpp): apex at z=height, base r at z=0
    def cone():
        k = (radius / height) ** 2
        a = dx * dx + dy * dy - k * dz * dz
        b = 2.0 * (dx * ox + dy * oy - k * dz * (oz - height))
        c = ox * ox + oy * oy - k * (oz - height) * (oz - height)
        ok, t0, t1 = _quadratic(a, b, c)

        def valid(p):
            return (p[2] >= 0.0) & (p[2] <= height) & (phi_of(p) <= phimax + 1e-6)

        return pick(ok, t0, t1, valid)

    # -- paraboloid (reference: shapes/paraboloid.cpp): z = h*(x²+y²)/r²
    def paraboloid():
        k = height / (radius * radius)
        a = k * (dx * dx + dy * dy)
        b = 2.0 * k * (dx * ox + dy * oy) - dz
        c = k * (ox * ox + oy * oy) - oz
        ok, t0, t1 = _quadratic(a, b, c)

        def valid(p):
            return (p[2] >= zmin) & (p[2] <= zmax) & (phi_of(p) <= phimax + 1e-6)

        return pick(ok, t0, t1, valid)

    # -- hyperboloid (reference: shapes/hyperboloid.cpp): x²+y²-z²·k = c
    def hyperboloid():
        # params: prm[6] = a-coef, prm[7] = c-coef of x²+y²-(a/c)z² form
        ah, ch = prm[6], prm[7]
        a = ah * (dx * dx + dy * dy) - ch * dz * dz
        b = 2.0 * (ah * (dx * ox + dy * oy) - ch * dz * oz)
        c = ah * (ox * ox + oy * oy) - ch * oz * oz - 1.0
        ok, t0, t1 = _quadratic(a, b, c)

        def valid(p):
            return (p[2] >= zmin) & (p[2] <= zmax) & (phi_of(p) <= phimax + 1e-6)

        return pick(ok, t0, t1, valid)

    all_branches = [sphere, cylinder, disk, cone, paraboloid, hyperboloid]
    active = tuple(getattr(g, "quad_active_types", (0, 1, 2, 3, 4, 5)))
    if len(active) == 1:
        hit, t = all_branches[active[0]]()
    else:
        branches = [all_branches[c] for c in active]
        # compact dispatch index: position of typ within the active set
        disp = jnp.zeros_like(typ)
        for k, c in enumerate(active):
            disp = jnp.where(typ == c, k, disp)
        hit, t = jax.lax.switch(jnp.clip(disp, 0, len(branches) - 1), branches)
    # parametric coords for shading
    p = o + t * d
    u = phi_of(p) / jnp.maximum(phimax, 1e-9)
    vdenom = jnp.maximum(zmax - zmin, 1e-9)
    v = (p[2] - zmin) / vdenom
    return hit, t, jnp.where(hit, u, 0.0), jnp.where(hit, v, 0.0)


# ---------------------------------------------------------------------------
# BVH traversal (single ray; vmapped)
# ---------------------------------------------------------------------------


def _make_inv_dir(d):
    return jnp.where(jnp.abs(d) < 1e-20, jnp.float32(1e20) * jnp.sign(d + 1e-30), 1.0 / d)


def _slab(lo, hi, o, inv_d, tmin, tmax):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    enter = jnp.maximum(jnp.max(tn), tmin)
    exit_ = jnp.minimum(jnp.min(tf), tmax)
    return enter <= exit_


def _tri_test_packed(g: SceneGeometry, p, o, d, tmin, tmax, tw=None):
    """Möller–Trumbore against the packed (T, 9) row — one gather
    (two with motion: the shutter-end delta row, lerped by ``tw``)."""
    row = g.tri_packed[p]
    if g.has_motion and tw is not None:
        row = row + tw * g.tri_motion[p]
    v0 = row[0:3]
    e1 = row[3:6]
    e2 = row[6:9]
    pv = jnp.cross(d, e2)
    det = jnp.dot(e1, pv)
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tv = o - v0
    b1 = jnp.dot(tv, pv) * inv_det
    qv = jnp.cross(tv, e1)
    b2 = jnp.dot(d, qv) * inv_det
    t = jnp.dot(e2, qv) * inv_det
    hit = (
        (jnp.abs(det) >= 1e-12)
        & (b1 >= 0.0)
        & (b2 >= 0.0)
        & (b1 + b2 <= 1.0)
        & (t > tmin)
        & (t < tmax)
    )
    return hit, t, b1, b2


def _make_test_prim(g: SceneGeometry, o, d, tw=None):
    """Per-primitive closest-test closure over a global prim id — shared by
    all three accelerator traversals."""
    T = g.num_triangles
    Q = g.num_quadrics

    def test_prim(p, tmin_, tbest):
        # NOTE: no lax.cond here — under vmap a batched-predicate cond is
        # rewritten to select_n with every closed-over array broadcast
        # per-lane (a rays × triangles blowup). Masked evaluation of both
        # cheap tests is branch-free and keeps the scene arrays shared.
        if Q == 0:
            return _tri_test_packed(g, p, o, d, tmin_, tbest, tw)
        if T == 0:
            return _quad_test(g, p, o, d, tmin_, tbest)
        is_tri = p < T
        ht, tt_, b1t, b2t = _tri_test_packed(
            g, jnp.minimum(p, T - 1), o, d, tmin_, tbest, tw
        )
        hq, tq_, b1q, b2q = _quad_test(
            g, jnp.clip(p - T, 0, Q - 1), o, d, tmin_, tbest
        )
        return (
            jnp.where(is_tri, ht, hq),
            jnp.where(is_tri, tt_, tq_),
            jnp.where(is_tri, b1t, b1q),
            jnp.where(is_tri, b2t, b2q),
        )

    return test_prim


def _traverse_one(g: SceneGeometry, o, d, tmin, tmax, any_hit: bool, tw=None):
    """Closest-hit (or any-hit) traversal for a single ray. ``tw``: motion
    time weight in [0, 1] (None for static scenes)."""
    T = g.num_triangles
    Q = g.num_quadrics
    inv_d = _make_inv_dir(d)
    dir_neg = (d < 0.0).astype(jnp.int32)  # (3,)
    test_prim = _make_test_prim(g, o, d, tw)

    State = tuple  # (sp, stack, t_best, prim_best, b1, b2)
    stack0 = jnp.zeros(MAX_STACK, jnp.int32)
    init = (
        jnp.int32(1),
        stack0,
        jnp.asarray(tmax, jnp.float32),
        jnp.int32(-1),
        jnp.float32(0.0),
        jnp.float32(0.0),
    )

    def cond(s):
        sp, _, _, prim_best, _, _ = s
        alive = sp > 0
        if any_hit:
            alive = alive & (prim_best < 0)
        return alive

    def one_step(s):
        """Pop-and-process one node; no-op (fully masked) when sp == 0 —
        lets the while body unroll STEPS_PER_ITER of these so the loop's
        fixed per-iteration overhead amortizes."""
        sp, stack, t_best, prim_best, b1b, b2b = s
        active = sp > 0
        node = stack[jnp.maximum(sp - 1, 0)]
        sp = jnp.maximum(sp - 1, 0)
        row = g.node_packed[node]  # single gather: lo, hi, second, meta
        hit_box = active & _slab(row[0:3], row[3:6], o, inv_d, tmin, t_best)
        second = row[6].astype(jnp.int32)  # exact: values < 2^24
        meta = row[7].astype(jnp.int32)
        count = meta >> 2
        axis = meta & 3
        is_leaf = count > 0

        # --- leaf: test primitives, static MAX_LEAF unroll ---
        offset = second
        do_leaf = hit_box & is_leaf
        for i in range(MAX_LEAF):
            in_leaf = do_leaf & (i < count)
            p = g.prim_order[jnp.minimum(offset + i, g.prim_order.shape[0] - 1)]
            h, t, u1, u2 = test_prim(p, tmin, t_best)
            better = in_leaf & h & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            prim_best = jnp.where(better, p, prim_best)
            b1b = jnp.where(better, u1, b1b)
            b2b = jnp.where(better, u2, b2b)

        # --- interior: push children, near child on top ---
        push = hit_box & (~is_leaf)
        near_first = dir_neg[axis] == 0  # positive dir → left (node+1) first
        c_near = jnp.where(near_first, node + 1, second)
        c_far = jnp.where(near_first, second, node + 1)
        # push far then near (near popped first)
        stack = jnp.where(push, stack.at[sp].set(c_far), stack)
        sp1 = sp + push.astype(jnp.int32)
        stack = jnp.where(push, stack.at[sp1].set(c_near), stack)
        sp = sp1 + push.astype(jnp.int32)
        return (sp, stack, t_best, prim_best, b1b, b2b)

    def body(s):
        for _ in range(STEPS_PER_ITER):
            s = one_step(s)
        return s

    sp, _, t_best, prim_best, b1, b2 = jax.lax.while_loop(cond, body, init)
    return t_best, prim_best, b1, b2


# ---------------------------------------------------------------------------
# 8-wide unified-row traversal (the TPU fast path; see accel/wide.py)
# ---------------------------------------------------------------------------

#: shift-register stack depth: wide-tree depth ceil(log8 T) × up to 7
#: pushes (48 covers ~16M triangles); n_stack is clamped to this so
#: overflow degrades to dropped far subtrees instead of a popping livelock.
#: Kept tight because every step's push/pop runs select chains over the
#: whole register (stack width is pure VPU cost per step).
WIDE_STACK = 48

# Batcher odd-even merge network for 8 elements (19 compare-exchanges)
_SORT8 = (
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6),
    (0, 4), (1, 5), (2, 6), (3, 7),
    (2, 4), (3, 5),
    (1, 2), (3, 4), (5, 6),
)


def _quad_best(g: SceneGeometry, o, d, tmin, tmax):
    """Dense closest-hit over ALL quadrics for one ray (Q is tiny; this
    keeps the 6-way quadric switch out of the traversal loop entirely).
    Returns (t, prim, b1, b2) with prim a global id or -1."""
    T = g.num_triangles
    Q = g.num_quadrics

    def one(q):
        return _quad_test(g, q, o, d, tmin, tmax)

    hit, t, u, v = jax.vmap(one)(jnp.arange(Q))
    t = jnp.where(hit, t, jnp.inf)
    best = jnp.argmin(t)
    has = hit[best]
    return (
        jnp.where(has, t[best], tmax),
        jnp.where(has, best.astype(jnp.int32) + T, -1),
        jnp.where(has, u[best], 0.0),
        jnp.where(has, v[best], 0.0),
    )


def _traverse_wide_one(g: SceneGeometry, o, d, tmin, tmax, any_hit: bool,
                       tw=None):
    """Closest-hit (or any-hit) over the unified wide table, single ray.

    Per step: ONE row gather + (as masked VPU work) both the node
    interpretation — 8 slab tests, sort-by-entry, push — and the leaf
    interpretation — 8 Möller–Trumbore tests. The stack is a shift
    register (static roll + slot-0 writes), never a scatter.
    Replaces the reference's LinearBVHNode stack walk (bvh.cpp:105-200).
    """
    rows = g.wide_rows
    inv_d = _make_inv_dir(d)

    # quadrics first: their result seeds t_best so the tree prunes on it
    if g.num_quadrics > 0:
        qt, qp, qb1, qb2 = _quad_best(g, o, d, tmin, tmax)
    else:
        qt, qp = jnp.asarray(tmax, jnp.float32), jnp.int32(-1)
        qb1 = qb2 = jnp.float32(0.0)

    if g.num_triangles == 0 or rows is None:
        return qt, qp, qb1, qb2

    stack0 = jnp.zeros(WIDE_STACK, jnp.int32)
    init = (
        jnp.int32(0),          # cur ref (row 0 is always a node row)
        stack0,
        jnp.int32(0),          # live stack entries
        qt, qp, qb1, qb2,
        jnp.bool_(True),
    )

    def cond(s):
        alive, prim_best = s[7], s[4]
        if any_hit:
            alive = alive & (prim_best < 0)
        return alive

    def body(s):
        cur, stack, n_stack, t_best, prim_best, b1b, b2b, alive = s
        is_node = cur >= 0
        row_idx = jnp.where(is_node, cur, -cur - 1)
        row = rows[row_idx]  # THE gather (one per step)
        if g.has_motion and tw is not None:
            row = row + tw * g.wide_motion[row_idx]

        # ---- node interpretation: slab-test 8 children ----
        lo = jnp.stack([row[0:8], row[16:24], row[32:40]])    # (3, 8)
        hi = jnp.stack([row[8:16], row[24:32], row[40:48]])
        t0 = (lo - o[:, None]) * inv_d[:, None]
        t1 = (hi - o[:, None]) * inv_d[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=0)
        tf = jnp.min(jnp.maximum(t0, t1), axis=0)
        enter = jnp.maximum(tn, tmin)
        exit_ = jnp.minimum(tf, t_best)
        # empty slots carry inverted boxes; the per-axis min/max swap in the
        # slab test would otherwise read them as infinite boxes
        valid8 = row[0:8] <= row[8:16]
        hit8 = (enter <= exit_) & valid8 & is_node & alive
        refs = row[48:56].astype(jnp.int32)  # exact: |ref| < 2^24

        # sort (entry, ref) ascending so the nearest child is visited first
        key = jnp.where(hit8, enter, jnp.inf)
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
        n_hit = jnp.sum(hit8.astype(jnp.int32))

        # ---- leaf interpretation: 8 Möller–Trumbore tests, vectorized
        # over the 8 aligned SoA slots (no per-triangle unrolling: odd
        # slice offsets would trigger lane-misaligned relayouts) ----
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

        # ---- control: descend to nearest child, push the rest ----
        descend = is_node & (n_hit > 0)
        pc = jnp.where(descend, n_hit - 1, 0)  # children to push
        cands = refs_l[1:8]  # 7 sorted candidates (hits first)
        variants = []
        for k in range(8):
            if k == 0:
                variants.append(stack)
            else:
                variants.append(
                    jnp.concatenate(
                        [jnp.stack(cands[:k]), stack[: WIDE_STACK - k]]
                    )
                )
        stack = variants[0]
        for k in range(1, 8):
            stack = jnp.where(pc == k, variants[k], stack)
        n_stack = jnp.minimum(n_stack + pc, WIDE_STACK)

        pop = ~descend
        cur = jnp.where(descend, refs_l[0], stack[0])
        stack_pop = jnp.concatenate([stack[1:], jnp.zeros(1, jnp.int32)])
        stack = jnp.where(pop, stack_pop, stack)
        alive = alive & ~(pop & (n_stack == 0))
        n_stack = jnp.maximum(n_stack - pop.astype(jnp.int32), 0)
        return (cur, stack, n_stack, t_best, prim_best, b1b, b2b, alive)

    out = jax.lax.while_loop(cond, body, init)
    return out[3], out[4], out[5], out[6]


import os as _os

#: compacted straggler batch width (must divide nothing — just a static
#: sub-batch size; lanes beyond the active count are harmless repeats)
WIDE_COMPACT = int(_os.environ.get("PBRT_TPU_WIDE_COMPACT", "2048"))
#: warm-phase stack width: every push/pop streams the whole (Ws, R)
#: register, so a narrow warm stack is ~W/Ws cheaper per iteration; lanes
#: that would overflow freeze and finish in the full-width straggler phase
WIDE_WARM_STACK = int(_os.environ.get("PBRT_TPU_WIDE_WARM_STACK", "24"))
#: opt-in Pallas kernel for the traversal step's interpret phase
#: (accel/pallas_step.py) — measured slower than the XLA fusion on v5e,
#: kept as a tuning hook (see PERF.md r5)
_PALLAS_STEP = _os.environ.get("PBRT_TPU_PALLAS_STEP", "0") == "1"


def _step_control(act, is_node, n_hit, refs_l, cur, stack, n_stack,
                  t_best, prim_best, b1b, b2b, alive, extra):
    """Shared traversal control tail: descend to the nearest child, push
    the remaining sorted candidates, pop on dead ends."""
    Ws = stack.shape[0]
    descend = is_node & (n_hit > 0)
    pc = jnp.where(descend, n_hit - 1, 0)  # (R,) children to push
    cands = refs_l[1:8]                    # 7 sorted candidates
    stack_new = stack
    for k in range(1, 8):
        variant = jnp.concatenate(
            [jnp.stack(cands[:k]), stack[: Ws - k]], axis=0
        )
        stack_new = jnp.where(pc == k, variant, stack_new)
    stack = stack_new
    n_stack = jnp.minimum(n_stack + pc, Ws)

    pop = act & ~descend
    # inactive/frozen lanes must keep their pending node: overwriting
    # cur with stack[0] without popping would drop it
    cur = jnp.where(
        act, jnp.where(descend, refs_l[0], stack[0]), cur
    )
    stack_pop = jnp.concatenate(
        [stack[1:], jnp.zeros((1, cur.shape[0]), jnp.int32)], axis=0
    )
    stack = jnp.where(pop, stack_pop, stack)
    alive = alive & ~(pop & (n_stack == 0))
    n_stack = jnp.maximum(n_stack - pop.astype(jnp.int32), 0)
    return (cur, stack, n_stack, t_best, prim_best, b1b, b2b,
            alive) + extra


def _traverse_wide_batch(g: SceneGeometry, o, d, tmin, tmax, any_hit: bool,
                         tw=None):
    """Whole-wavefront 8-wide traversal — the batched rewrite of
    ``_traverse_wide_one`` (same algorithm, same results), laid out for the
    TPU's (8 sublane × 128 lane) registers:

      - slot-major math: the 8 child slots live on the SUBLANE axis and the
        R rays on the LANE axis, so every slab/Möller–Trumbore op runs at
        full (8, R) vector width. The vmapped per-ray version put the 8
        slots on the lane axis, padding every (R, 8) intermediate to
        (R, 128) — a measured ~16× lane-occupancy waste per op
        (scripts/trav_lab.py: 315 µs per 32k-lane step, stack ops and
        8-wide math dominating).
      - the traversal stack is one (W, R) i32 array (W on sublanes — no
        lane padding) with W = the build-time EXACT worst-case need
        (g.wide_stack), so overflow is impossible and no subtree is ever
        dropped.
      - step counts are wildly skewed (killeroo incoherent batch: mean 1.5
        steps, p99 3, max 26 — scripts/trav_lab.py), so a single
        full-width while_loop runs ~26 iterations with ~5% lane
        utilization. Instead: a full-width warm phase runs until fewer
        than WIDE_COMPACT unfrozen lanes remain, then the stragglers are
        compacted (jnp.nonzero) into WIDE_COMPACT-lane sub-batches that
        loop to completion at 1/16th the per-iteration cost — the
        wavefront analogue of the reference's per-ray early loop exit
        (bvh.cpp:105-200).

    o, d: (R, 3); tmin/tmax/tw: (R,). Returns (t, prim, b1, b2) each (R,).
    """
    rows = g.wide_rows
    W = g.wide_stack
    R = o.shape[0]

    # quadrics first: their result seeds t_best so the tree prunes on it
    if g.num_quadrics > 0:
        f = jax.vmap(
            lambda oo, dd, a, b: _quad_best(g, oo, dd, a, b)
        )
        qt, qp, qb1, qb2 = f(o, d, tmin, jnp.asarray(tmax, jnp.float32))
    else:
        qt = jnp.asarray(jnp.broadcast_to(tmax, (R,)), jnp.float32)
        qp = jnp.full((R,), -1, jnp.int32)
        qb1 = qb2 = jnp.zeros((R,), jnp.float32)

    if (g.num_triangles == 0 or rows is None) and g.inst_rows is None:
        return qt, qp, qb1, qb2, None

    inv = _make_inv_dir(d)
    consts0 = (
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        inv[:, 0], inv[:, 1], inv[:, 2], jnp.asarray(tmin, jnp.float32),
        (tw if (g.has_motion and tw is not None)
         else jnp.zeros((R,), jnp.float32)),
    )
    # warm phase carries a NARROW stack (the per-iteration concatenates
    # stream the whole (Ws, R) register; lanes needing more than Ws
    # entries freeze and resume at full width in the compaction phase)
    W1 = min(W, WIDE_WARM_STACK)
    init = (
        jnp.zeros((R,), jnp.int32),          # cur (row 0 is a node row)
        jnp.zeros((W1, R), jnp.int32),       # stack, slot-major
        jnp.zeros((R,), jnp.int32),          # n_stack
        qt, qp, qb1, qb2,
        jnp.ones((R,), bool),                # alive
    ) + (() if isinstance(any_hit, bool) else (any_hit,))

    def active_of(s):
        alive, prim_best = s[7], s[4]
        # any_hit may be a static bool OR a per-lane (R,) mask carried in
        # the state (s[8]) — the merged shadow+closest batch runs both
        # kinds in one traversal
        if isinstance(any_hit, bool):
            if any_hit:
                alive = alive & (prim_best < 0)
        else:
            alive = alive & ~(s[8] & (prim_best >= 0))
        return alive

    def step(consts, s, freeze_overflow=False, rows_tab=None, motion=True):
        (ox, oy, oz, dx, dy, dz, ix, iy, iz, tmin_, tw_) = consts
        tab = rows if rows_tab is None else rows_tab
        cur, stack, n_stack, t_best, prim_best, b1b, b2b, alive = s[:8]
        extra = s[8:]  # (any-hit mask,) when per-lane, else ()
        Ws = stack.shape[0]
        act = active_of(s)
        if freeze_overflow:
            # warm phase runs a NARROW stack; lanes that might need more
            # than Ws entries freeze here and resume in the compaction
            # phase, which carries the full exact-bound width
            act = act & (n_stack <= Ws - 7)
        is_node = cur >= 0
        row_idx = jnp.where(is_node, cur, -cur - 1)
        row = tab[row_idx]                   # (C, 80) — THE gather
        if motion and g.has_motion and tw is not None:
            row = row + tw_[:, None] * g.wide_motion[row_idx]
        if _PALLAS_STEP and cur.shape[0] % 256 == 0:
            # hand-written Pallas kernel for the interpret phase (slab +
            # MT + sort fused in VMEM). Validated bit-exact vs the XLA
            # fusion below; measured ~2× SLOWER on v5e (PERF.md r5), so
            # off by default — kept as the tuning hook for future parts.
            from pbrt_tpu.accel.pallas_step import step_interpret

            refs_s, n_hit, tsel, psel, b1s, b2s = step_interpret(
                row, jnp.stack([ox, oy, oz], -1),
                jnp.stack([dx, dy, dz], -1),
                jnp.stack([ix, iy, iz], -1), tmin_, t_best, is_node, act,
            )
            refs_l = [refs_s[k] for k in range(8)]
            any_ok = tsel < t_best
            t_best = jnp.where(any_ok, tsel, t_best)
            prim_best = jnp.where(any_ok, psel, prim_best)
            b1b = jnp.where(any_ok, b1s, b1b)
            b2b = jnp.where(any_ok, b2s, b2b)
            return _step_control(
                act, is_node, n_hit, refs_l, cur, stack, n_stack,
                t_best, prim_best, b1b, b2b, alive, extra,
            )
        rt = row.T                           # (80, C) slot-major relayout

        # ---- node interpretation: slab-test 8 children, (8, R) wide ----
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
        valid8 = lox <= hix  # empty slots carry inverted boxes
        hit8 = (enter <= exit_) & valid8 & is_node & act
        refs = rt[48:56].astype(jnp.int32)   # (8, C), exact |ref| < 2^24

        # sort (entry, ref) ascending so the nearest child is visited first
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
        n_hit = jnp.sum(hit8.astype(jnp.int32), axis=0)  # (R,)

        # ---- leaf interpretation: 8 Möller–Trumbore tests, (8, R) ----
        is_leaf = ~is_node
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
            is_leaf & act & (pid >= 0)
            & (jnp.abs(det) >= 1e-12)
            & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
            & (t > tmin_) & (t < t_best)
        )
        tcand = jnp.where(ok8, t, jnp.inf)
        jbest = jnp.argmin(tcand, axis=0)    # (C,)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (8, cur.shape[0]), 0)
            == jbest[None, :]
        )
        tsel = jnp.min(tcand, axis=0)
        any_ok = tsel < t_best
        t_best = jnp.where(any_ok, tsel, t_best)
        prim_best = jnp.where(
            any_ok, jnp.sum(jnp.where(sel, pid, 0), axis=0), prim_best
        )
        b1b = jnp.where(any_ok, jnp.sum(jnp.where(sel, b1, 0.0), axis=0), b1b)
        b2b = jnp.where(any_ok, jnp.sum(jnp.where(sel, b2, 0.0), axis=0), b2b)

        # ---- control: descend to nearest child, push the rest ----
        return _step_control(
            act, is_node, n_hit, refs_l, cur, stack, n_stack,
            t_best, prim_best, b1b, b2b, alive, extra,
        )

    if rows is not None and g.num_triangles > 0:
        # ---- phase 1: full-width while, until few lanes remain ----------
        # Runs while more than WIDE_COMPACT lanes can still make progress:
        # incoherent batches (mean 1.5 steps) leave it after a few
        # iterations, coherent primary batches (everyone traversing deep)
        # stay full-width instead of being chopped into compacted
        # sub-passes (measured: a fixed 10-iteration warm made primaries
        # 2.6× slower than letting the full-width loop run)
        thresh = min(WIDE_COMPACT, R) if R > WIDE_COMPACT else 0

        def warm_cond(s):
            act = active_of(s)
            if W1 < W:
                act = act & (s[2] <= W1 - 7)  # frozen lanes can't progress
            return jnp.sum(act.astype(jnp.int32)) > thresh

        state = jax.lax.while_loop(
            warm_cond,
            lambda s: step(consts0, s, freeze_overflow=W1 < W),
            init,
        )

        # ---- phase 2: straggler compaction loop -------------------------
        # The outer carry keeps the NARROW warm stack: only the C-lane
        # sub-batch is widened to the exact bound W. Lanes return from the
        # sub-loop FINISHED (the inner while runs them to completion), so
        # only the scalar results + alive scatter back — the (W, R) stack
        # gather/scatter-back that dominated the r4 profile (4.7 ms per
        # 32k-lane traversal in the op trace, ~2× the warm loop itself) is
        # dead weight and is gone.
        C = min(WIDE_COMPACT, R)

        def outer_cond(s):
            return jnp.any(active_of(s))

        def outer_body(s):
            act = active_of(s)
            # padding uses the OUT-OF-BOUNDS index R: gathers clamp
            # (harmless duplicate compute of lane R-1, whose scattered
            # write is then shadowed only by itself), scatters DROP — so
            # no duplicate-index write races with a genuine lane update.
            # Stream compaction via cumsum+scatter — jnp.nonzero lowers to
            # a 32k sort on TPU (~1.5 ms per call in the op trace); the
            # scan+scatter form is ~10× cheaper.
            pos = jnp.cumsum(act.astype(jnp.int32)) - 1
            valid = act & (pos < C)
            sel = jnp.full((C,), R, jnp.int32).at[
                jnp.where(valid, pos, C)
            ].set(jnp.arange(R, dtype=jnp.int32), mode="drop")
            sub = tuple(a[:, sel] if a.ndim == 2 else a[sel] for a in s)
            if W > W1:
                # widen the SUB stack to the exact worst-case bound so the
                # resumed traversal cannot overflow
                sub = (
                    sub[0],
                    jnp.concatenate(
                        [sub[1], jnp.zeros((W - W1, C), jnp.int32)], axis=0
                    ),
                ) + sub[2:]
            subc = tuple(c[sel] for c in consts0)

            def sub_cond(ss):
                return jnp.any(active_of(ss))

            sub = jax.lax.while_loop(
                sub_cond, lambda ss: step(subc, ss), sub
            )
            # finished lanes: stacks are dead state — scatter back only
            # the 1-D results (t/prim/b1/b2/cur/n_stack/alive)
            return tuple(
                a if a.ndim == 2 else a.at[sel].set(b)
                for a, b in zip(s, sub)
            )

        state = jax.lax.while_loop(outer_cond, outer_body, state)
    else:
        state = init
    t_best, prim_best, b1b, b2b = state[3], state[4], state[5], state[6]

    # ---- phase 3: instances (TLAS) --------------------------------------
    # (reference: TransformedPrimitive::Intersect, primitive.cpp — ray is
    # transformed into instance space and handed to the shared BLAS; t is
    # invariant because the object-space direction stays unnormalized)
    if g.inst_rows is None:
        return t_best, prim_best, b1b, b2b, None

    I = g.inst_root.shape[0]
    W2 = max(8, g.inst_stack)
    tmin_f = jnp.asarray(tmin, jnp.float32)
    inst_best = jnp.full((R,), -1, jnp.int32)

    def inst_body(i, st):
        t_b, p_b, b1_, b2_, in_b = st
        m = g.inst_w2o[i]
        o2 = o @ m[:3, :3].T + m[:3, 3]
        d2 = d @ m[:3, :3].T
        inv2 = _make_inv_dir(d2)
        # world-space AABB prune against the current best hit
        t0 = (g.inst_lo[i][None, :] - o) * inv
        t1 = (g.inst_hi[i][None, :] - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=1)
        pre = jnp.maximum(tn, tmin_f) <= jnp.minimum(tf, t_b)
        if isinstance(any_hit, bool):
            if any_hit:
                pre = pre & (p_b < 0)
        else:
            pre = pre & ~(any_hit & (p_b >= 0))
        consts_i = (
            o2[:, 0], o2[:, 1], o2[:, 2], d2[:, 0], d2[:, 1], d2[:, 2],
            inv2[:, 0], inv2[:, 1], inv2[:, 2], tmin_f,
            jnp.zeros((R,), jnp.float32),
        )
        sub = (
            jnp.broadcast_to(g.inst_root[i], (R,)).astype(jnp.int32),
            jnp.zeros((W2, R), jnp.int32),
            jnp.zeros((R,), jnp.int32),
            t_b, p_b, b1_, b2_, pre,
        ) + (() if isinstance(any_hit, bool) else (any_hit,))
        sub = jax.lax.while_loop(
            lambda ss: jnp.any(active_of(ss)),
            lambda ss: step(
                consts_i, ss, rows_tab=g.inst_rows, motion=False
            ),
            sub,
        )
        nt, np_, nb1, nb2 = sub[3], sub[4], sub[5], sub[6]
        changed = (nt != t_b) | (np_ != p_b)
        return (nt, np_, nb1, nb2, jnp.where(changed, i, in_b))

    t_best, prim_best, b1b, b2b, inst_best = jax.lax.fori_loop(
        0, I, inst_body, (t_best, prim_best, b1b, b2b, inst_best)
    )
    return t_best, prim_best, b1b, b2b, inst_best


#: leaf/voxel primitive tests run in statically-unrolled chunks of this size
#: inside an inner while_loop (bounds leaf sizes without a build-time cap)
CHUNK = 4


def _leaf_chunk_loop(test_prim, ids, off, count, tmin, state, active_pred):
    """Test ``count`` prims starting at ``ids[off]`` in CHUNK-wide waves.
    state = (t_best, prim_best, b1, b2); ``active_pred`` masks the whole
    leaf (e.g. interior node / pop mode)."""

    def cond(s):
        c = s[0]
        return active_pred & (c < count)

    def body(s):
        c, t_best, prim_best, b1b, b2b = s
        for k in range(CHUNK):
            idx = off + c + k
            in_leaf = (c + k) < count
            p = ids[jnp.minimum(idx, ids.shape[0] - 1)]
            h, t, u1, u2 = test_prim(p, tmin, t_best)
            better = in_leaf & h & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            prim_best = jnp.where(better, p, prim_best)
            b1b = jnp.where(better, u1, b1b)
            b2b = jnp.where(better, u2, b2b)
        return (c + CHUNK, t_best, prim_best, b1b, b2b)

    out = jax.lax.while_loop(cond, body, (jnp.int32(0),) + state)
    return out[1:]


def _traverse_kd_one(g: SceneGeometry, o, d, tmin, tmax, any_hit: bool,
                     tw=None):
    """kd-tree traversal for one ray (reference: KdTreeAccel::Intersect,
    kdtreeaccel.cpp:374-462 — (node, tmin, tmax) todo stack, near child
    first, early out when the closest hit precedes the next segment)."""
    inv_d = _make_inv_dir(d)
    test_prim = _make_test_prim(g, o, d, tw)
    # clip against the scene bound
    t0w = tmin
    t1w = jnp.asarray(tmax, jnp.float32)
    ok_box = _slab(g.world_lo, g.world_hi, o, inv_d, tmin, t1w)
    enter = jnp.max(jnp.minimum((g.world_lo - o) * inv_d,
                                (g.world_hi - o) * inv_d))
    exit_ = jnp.min(jnp.maximum((g.world_lo - o) * inv_d,
                                (g.world_hi - o) * inv_d))
    t0w = jnp.maximum(t0w, enter)
    t1w = jnp.minimum(t1w, exit_)

    stack_n = jnp.zeros(MAX_STACK, jnp.int32)
    stack_t0 = jnp.zeros(MAX_STACK, jnp.float32)
    stack_t1 = jnp.zeros(MAX_STACK, jnp.float32)
    # node = -1 → pop next; alive flag folds in the initial box miss
    init = (
        jnp.where(ok_box, jnp.int32(0), jnp.int32(-1)),
        t0w, t1w,
        jnp.int32(0), stack_n, stack_t0, stack_t1,
        jnp.asarray(tmax, jnp.float32), jnp.int32(-1),
        jnp.float32(0.0), jnp.float32(0.0),
        ok_box,
    )

    def cond(s):
        alive, prim_best = s[11], s[8]
        if any_hit:
            alive = alive & (prim_best < 0)
        return alive

    def body(s):
        (node, t0n, t1n, sp, st_n, st_t0, st_t1,
         t_best, prim_best, b1b, b2b, alive) = s
        pop_mode = node < 0
        node_c = jnp.maximum(node, 0)
        axis = g.kd_axis[node_c]
        is_leaf = (~pop_mode) & (axis == 3)

        # --- leaf: chunked prim tests ---
        t_best, prim_best, b1b, b2b = _leaf_chunk_loop(
            test_prim, g.kd_prim_ids, g.kd_prim_off[node_c],
            jnp.where(is_leaf, g.kd_prim_cnt[node_c], 0), tmin,
            (t_best, prim_best, b1b, b2b), is_leaf,
        )

        # --- interior: descend / push far child ---
        ax = jnp.minimum(axis, 2)
        split = g.kd_split[node_c]
        tplane = (split - o[ax]) * inv_d[ax]
        below_first = (o[ax] < split) | ((o[ax] == split) & (d[ax] <= 0.0))
        above = g.kd_above[node_c]
        first = jnp.where(below_first, node_c + 1, above)
        second = jnp.where(below_first, above, node_c + 1)
        only_first = (tplane > t1n) | (tplane <= 0.0)
        # ordered tests as in the reference (kdtreeaccel.cpp:419-424):
        # the tplane<=0 / >t1 case wins over the <t0 case
        only_second = (tplane < t0n) & ~only_first
        both = (~only_first) & (~only_second)
        interior = (~pop_mode) & (axis != 3)
        push = interior & both
        st_n = jnp.where(push, st_n.at[sp].set(second), st_n)
        st_t0 = jnp.where(push, st_t0.at[sp].set(tplane), st_t0)
        st_t1 = jnp.where(push, st_t1.at[sp].set(t1n), st_t1)
        sp = sp + push.astype(jnp.int32)
        node_next = jnp.where(only_second, second, first)
        t1_next = jnp.where(both, tplane, t1n)

        # --- pop (leaf done, or explicit pop mode) ---
        want_pop = pop_mode | is_leaf
        can_pop = sp > 0
        sp_p = jnp.maximum(sp - 1, 0)
        p_node = st_n[sp_p]
        p_t0 = st_t0[sp_p]
        p_t1 = st_t1[sp_p]
        # popped segment fully behind the best hit → keep popping
        again = t_best < p_t0
        node = jnp.where(
            want_pop,
            jnp.where(can_pop & ~again, p_node, jnp.int32(-1)),
            jnp.where(interior, node_next, node),
        )
        t0n = jnp.where(want_pop & can_pop, p_t0, t0n)
        t1n = jnp.where(want_pop & can_pop, p_t1,
                        jnp.where(interior, t1_next, t1n))
        sp = jnp.where(want_pop & can_pop, sp_p, sp)
        alive = alive & ~(want_pop & ~can_pop)
        return (node, t0n, t1n, sp, st_n, st_t0, st_t1,
                t_best, prim_best, b1b, b2b, alive)

    out = jax.lax.while_loop(cond, body, init)
    return out[7], out[8], out[9], out[10]


def _traverse_grid_one(g: SceneGeometry, o, d, tmin, tmax, any_hit: bool,
                       tw=None):
    """Uniform-grid 3D-DDA for one ray (reference: GridAccel::Intersect,
    grid.cpp:157-230 — walk voxels front-to-back, test each voxel's prims,
    stop once the best hit precedes the next voxel crossing)."""
    inv_d = _make_inv_dir(d)
    test_prim = _make_test_prim(g, o, d, tw)
    nx, ny, nz = g.grid_dims
    dims = jnp.asarray([nx, ny, nz], jnp.int32)
    dims_f = dims.astype(jnp.float32)
    lo = g.world_lo
    hi = g.world_hi
    width = jnp.maximum((hi - lo) / dims_f, 1e-12)

    enter = jnp.max(jnp.minimum((lo - o) * inv_d, (hi - o) * inv_d))
    exit_ = jnp.min(jnp.maximum((lo - o) * inv_d, (hi - o) * inv_d))
    t_enter = jnp.maximum(enter, tmin)
    ok_box = (enter <= exit_) & (exit_ >= tmin) & (t_enter <= tmax)

    p_in = o + t_enter * d
    vox = jnp.clip(((p_in - lo) / width).astype(jnp.int32), 0, dims - 1)
    step = jnp.where(d >= 0.0, 1, -1).astype(jnp.int32)
    # parametric distance to the next crossing per axis and per-cell delta
    next_edge = lo + (vox + (step > 0).astype(jnp.int32)).astype(
        jnp.float32
    ) * width
    big = jnp.float32(1e30)
    next_t = jnp.where(d != 0.0, (next_edge - o) * inv_d, big)
    delta_t = jnp.where(d != 0.0, width * jnp.abs(inv_d), big)

    init = (
        vox, next_t,
        jnp.asarray(tmax, jnp.float32), jnp.int32(-1),
        jnp.float32(0.0), jnp.float32(0.0),
        ok_box,
    )

    def cond(s):
        alive, prim_best = s[6], s[3]
        if any_hit:
            alive = alive & (prim_best < 0)
        return alive

    def body(s):
        vox, next_t, t_best, prim_best, b1b, b2b, alive = s
        vid = vox[2] + nz * (vox[1] + ny * vox[0])
        vid = jnp.clip(vid, 0, g.grid_cnt.shape[0] - 1)
        t_best, prim_best, b1b, b2b = _leaf_chunk_loop(
            test_prim, g.grid_ids, g.grid_off[vid],
            jnp.where(alive, g.grid_cnt[vid], 0), tmin,
            (t_best, prim_best, b1b, b2b), alive,
        )
        # advance to the next voxel along the smallest next_t
        ax = jnp.argmin(next_t)
        t_exit = next_t[ax]
        # hits found in this voxel that precede the voxel exit are final
        done_hit = (prim_best >= 0) & (t_best <= t_exit)
        vox = vox.at[ax].add(step[ax])
        out = (vox[ax] < 0) | (vox[ax] >= dims[ax])
        next_t = next_t.at[ax].add(delta_t[ax])
        alive = alive & ~done_hit & ~out & (t_exit <= t_best)
        return (vox, next_t, t_best, prim_best, b1b, b2b, alive)

    out = jax.lax.while_loop(cond, body, init)
    return out[2], out[3], out[4], out[5]


def intersect(g: SceneGeometry, ray: geom.Ray, any_hit=False) -> Hit:
    """Batched closest-hit (or any-hit) intersection.

    ``any_hit`` may be a static bool or a per-lane (R,) bool mask (the
    merged shadow+closest batch; wide-BVH path only).
    """
    if isinstance(any_hit, bool):
        return _intersect_static(g, ray, any_hit=any_hit)
    return _intersect_masked(g, ray, any_hit)


@functools.partial(jax.jit, static_argnames=("any_hit",))
def _intersect_static(g, ray, any_hit=False):
    return _intersect_impl(g, ray, any_hit)


@jax.jit
def _intersect_masked(g, ray, any_mask):
    return _intersect_impl(g, ray, any_mask)


def _intersect_impl(g: SceneGeometry, ray: geom.Ray, any_hit) -> Hit:
    """ray fields are (R, …); returns Hit with (R,) fields. Equivalent of
    Scene::Intersect / Scene::IntersectP (reference: core/scene.h:42-53).

    Traversal is DETACHED from differentiation (integrators/grad.py's
    detached-sampling estimator): visibility is discontinuous, so gradients
    through the hit search are zero by design — and the data-dependent
    while_loops are not reverse-differentiable anyway.
    """
    ray = jax.tree_util.tree_map(jax.lax.stop_gradient, ray)
    if g.num_triangles + g.num_quadrics == 0:
        R = ray.origin.shape[0]
        return Hit(
            t=jnp.full((R,), jnp.inf, jnp.float32),
            prim=jnp.full((R,), -1, jnp.int32),
            b1=jnp.zeros((R,), jnp.float32),
            b2=jnp.zeros((R,), jnp.float32),
        )
    if g.accel_kind == "bvh" and (
        g.wide_rows is not None or g.inst_rows is not None
    ):
        # batched fast path (no vmap): slot-major (8, R) math + (W, R) stack
        if g.has_motion:
            tw = motion_weight(g, ray.time)
        else:
            tw = None
        t, prim, b1, b2, inst = _traverse_wide_batch(
            g, ray.origin, ray.direction, ray.tmin, ray.tmax, any_hit, tw
        )
        return Hit(t=t, prim=prim, b1=b1, b2=b2, inst=inst)
    if g.accel_kind == "bvh" and g.num_triangles == 0:
        # pure-quadric scene: dense quadric pass only
        traverse = lambda g_, o, d, t0, t1, ah, tw=None: _quad_best(
            g_, o, d, t0, t1
        )
    else:
        traverse = {
            "bvh": _traverse_one,
            "kdtree": _traverse_kd_one,
            "grid": _traverse_grid_one,
        }[g.accel_kind]
    if g.has_motion:
        tw = motion_weight(g, ray.time)
        f = jax.vmap(
            lambda o, d, t0, t1, w: traverse(g, o, d, t0, t1, any_hit, w),
            in_axes=(0, 0, 0, 0, 0),
        )
        t, prim, b1, b2 = f(
            ray.origin, ray.direction, ray.tmin, ray.tmax, tw
        )
    else:
        f = jax.vmap(
            lambda o, d, t0, t1: traverse(g, o, d, t0, t1, any_hit),
            in_axes=(0, 0, 0, 0),
        )
        t, prim, b1, b2 = f(ray.origin, ray.direction, ray.tmin, ray.tmax)
    return Hit(t=t, prim=prim, b1=b1, b2=b2)


def motion_weight(g: SceneGeometry, time):
    """Normalize ray time into the transform interval → lerp weight."""
    t0, t1 = g.motion_time[0], g.motion_time[1]
    return jnp.clip((time - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)


def intersect_brute(g: SceneGeometry, ray: geom.Ray) -> Hit:
    """Exhaustive all-primitives loop — the correctness oracle the reference
    uses in its aggregatetest fuzzer (renderers/aggregatetest.cpp:53-112)."""
    R = ray.origin.shape[0]
    T = g.num_triangles

    def one(o, d, tmin, tmax):
        tb, pb, b1b, b2b = tmax, jnp.int32(-1), jnp.float32(0), jnp.float32(0)

        def body(p, c):
            tb, pb, x1, x2 = c
            if T > 0:
                pass
            is_tri = p < T
            if g.num_quadrics == 0:
                h, t, u1, u2 = _tri_test(g, p, o, d, tmin, tb)
            elif T == 0:
                h, t, u1, u2 = _quad_test(g, p, o, d, tmin, tb)
            else:
                ht, tt_, b1t, b2t = _tri_test(g, jnp.minimum(p, T - 1), o, d, tmin, tb)
                hq, tq_, b1q, b2q = _quad_test(
                    g, jnp.clip(p - T, 0, g.num_quadrics - 1), o, d, tmin, tb
                )
                h = jnp.where(is_tri, ht, hq)
                t = jnp.where(is_tri, tt_, tq_)
                u1 = jnp.where(is_tri, b1t, b1q)
                u2 = jnp.where(is_tri, b2t, b2q)
            better = h & (t < tb)
            return (
                jnp.where(better, t, tb),
                jnp.where(better, p, pb),
                jnp.where(better, u1, x1),
                jnp.where(better, u2, x2),
            )

        n_prims = T + g.num_quadrics
        return jax.lax.fori_loop(0, n_prims, body, (tb, pb, b1b, b2b))

    t, prim, b1, b2 = jax.vmap(one)(ray.origin, ray.direction, ray.tmin, ray.tmax)
    return Hit(t=t, prim=prim, b1=b1, b2=b2)
