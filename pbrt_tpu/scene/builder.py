"""Scene flattener: SceneDescription → device-ready RenderScene.

Reference flow: pbrtWorldEnd → RenderOptions::MakeScene (BVH over all
primitives, api.cpp:1309-1330) + MakeRenderer (camera/film/sampler/
integrator assembly, api.cpp:1333-1440).

TPU-native design: all shapes are refined on host (numpy) into one
world-space triangle soup + quadric table, materials dedupe into a
MaterialTable, area lights link light rows to geometry ranges, and a SAH
BVH is built over everything and shipped to the device as SoA arrays.
"""

from __future__ import annotations

import dataclasses

from pbrt_tpu.utils import error as err

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.accel import bvh as bvh_mod
from pbrt_tpu.accel.intersect import (
    CONE, CYLINDER, DISK, HYPERBOLOID, PARABOLOID, SPHERE, SceneGeometry,
    pack_geometry,
)
from pbrt_tpu.cameras.cameras import make_camera
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.core import transform as xf
from pbrt_tpu.core.filters import make_filter
from pbrt_tpu.core.transform import AnimatedTransform
from pbrt_tpu.film.film import FilmConfig
from pbrt_tpu.integrators.path import IntegratorConfig, RenderScene
from pbrt_tpu.lights import table as lt_mod
from pbrt_tpu.materials.table import build_material_table
from pbrt_tpu.scene.api import SceneDescription, ShapeRecord
from pbrt_tpu.shapes.loopsubdiv import refine_loopsubdiv
from pbrt_tpu.shapes.mesh import MeshData, compute_vertex_normals, make_heightfield, make_mesh

_QUADRIC_TYPES = {
    "sphere": SPHERE,
    "cylinder": CYLINDER,
    "disk": DISK,
    "cone": CONE,
    "paraboloid": PARABOLOID,
    "hyperboloid": HYPERBOLOID,
}


@dataclasses.dataclass
class BuiltScene:
    """Everything render.py needs."""

    scene: RenderScene
    camera: object
    film_config: FilmConfig
    filter_table: np.ndarray
    sampler_name: str
    pixel_samples: int
    integrator: IntegratorConfig
    renderer_name: str
    renderer_params: object
    description: SceneDescription


def _refine_shape(rec: ShapeRecord, o2w: np.ndarray) -> MeshData | None:
    st = rec.shape_type
    if st == "trianglemesh":
        return make_mesh(rec.params, o2w, rec.reverse_orientation)
    if st == "loopsubdiv":
        return refine_loopsubdiv(rec.params, o2w, rec.reverse_orientation)
    if st == "heightfield":
        return make_heightfield(rec.params, o2w, rec.reverse_orientation)
    if st == "nurbs":
        from pbrt_tpu.shapes.nurbs import refine_nurbs

        return refine_nurbs(rec.params, o2w, rec.reverse_orientation)
    return None


def _quadric_params(rec: ShapeRecord) -> np.ndarray:
    p = rec.params
    prm = np.zeros(8, np.float32)
    st = rec.shape_type
    if st == "sphere":
        r = p.find_one_float("radius", 1.0)
        prm[0] = r
        prm[1] = p.find_one_float("zmin", -r)
        prm[2] = p.find_one_float("zmax", r)
        prm[3] = np.deg2rad(p.find_one_float("phimax", 360.0))
    elif st == "cylinder":
        prm[0] = p.find_one_float("radius", 1.0)
        prm[1] = p.find_one_float("zmin", -1.0)
        prm[2] = p.find_one_float("zmax", 1.0)
        prm[3] = np.deg2rad(p.find_one_float("phimax", 360.0))
    elif st == "disk":
        prm[0] = p.find_one_float("radius", 1.0)
        prm[3] = np.deg2rad(p.find_one_float("phimax", 360.0))
        prm[4] = p.find_one_float("height", 0.0)
        prm[5] = p.find_one_float("innerradius", 0.0)
    elif st == "cone":
        prm[0] = p.find_one_float("radius", 1.0)
        prm[3] = np.deg2rad(p.find_one_float("phimax", 360.0))
        prm[4] = p.find_one_float("height", 1.0)
        prm[1], prm[2] = 0.0, prm[4]
    elif st == "paraboloid":
        prm[0] = p.find_one_float("radius", 1.0)
        prm[1] = p.find_one_float("zmin", 0.0)
        prm[2] = p.find_one_float("zmax", 1.0)
        prm[3] = np.deg2rad(p.find_one_float("phimax", 360.0))
        prm[4] = prm[2]
    elif st == "hyperboloid":
        # simplified canonical form; full two-point form is a TODO
        prm[0] = 1.0
        prm[1] = p.find_one_float("zmin", -1.0)
        prm[2] = p.find_one_float("zmax", 1.0)
        prm[3] = np.deg2rad(p.find_one_float("phimax", 360.0))
        prm[6], prm[7] = 1.0, 1.0
    return prm


def _quadric_bounds(qtype: int, prm: np.ndarray, o2w: np.ndarray):
    r = float(prm[0])
    if qtype == SPHERE:
        lo = np.array([-r, -r, prm[1]])
        hi = np.array([r, r, prm[2]])
    elif qtype == CYLINDER:
        lo = np.array([-r, -r, prm[1]])
        hi = np.array([r, r, prm[2]])
    elif qtype == DISK:
        lo = np.array([-r, -r, prm[4] - 1e-4])
        hi = np.array([r, r, prm[4] + 1e-4])
    elif qtype == CONE:
        lo = np.array([-r, -r, 0.0])
        hi = np.array([r, r, prm[4]])
    elif qtype == PARABOLOID:
        lo = np.array([-r, -r, min(prm[1], prm[2])])
        hi = np.array([r, r, max(prm[1], prm[2])])
    else:
        m = max(r, abs(prm[1]), abs(prm[2])) * 2.0
        lo = np.array([-m, -m, prm[1]])
        hi = np.array([m, m, prm[2]])
    return xf.apply_bbox(o2w, lo, hi)


def _triangle_areas(v0, e1, e2):
    return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)


def build(desc: SceneDescription) -> BuiltScene:
    cfg = desc.spectral_config
    S = cfg.n_bins

    # --- expand object instances into plain shape records -----------------
    # each entry carries BOTH keyframe transforms; a difference marks an
    # animated TransformedPrimitive (reference: core/primitive.h:89 +
    # api.cpp:1071-1105 animated-shape handling)
    shape_records: list[tuple[ShapeRecord, np.ndarray, np.ndarray]] = []
    for rec in desc.shapes:
        shape_records.append(
            (rec, rec.object_to_world.m[0], rec.object_to_world.m[1])
        )
    # Memory-shared instancing (reference: TransformedPrimitive,
    # primitive.h:89 + api.cpp:1159-1212): an object referenced by ≥2
    # STATIC ObjectInstance uses keeps ONE object-space copy of its
    # geometry + BLAS; each use is a row in the instance table traversed
    # through a per-instance ray transform. Animated uses, single uses,
    # quadric-containing objects, and non-BVH accelerators fall back to
    # flattening (which duplicates geometry but supports everything).
    from collections import Counter

    accel_is_bvh = desc.accelerator[0] not in ("kdtree", "kdtreeaccel", "grid")
    use_count = Counter(i.name for i in desc.instances)

    def _tlas_eligible(name):
        recs = desc.objects.get(name, [])
        if not recs or use_count[name] < 2 or not accel_is_bvh:
            return False
        for rec in recs:
            if rec.shape_type in _QUADRIC_TYPES:
                return False
            if not np.allclose(rec.object_to_world.m[0],
                               rec.object_to_world.m[1], atol=1e-12):
                return False
            if rec.area_light is not None:
                return False  # reference: area lights in instances warn
        return True

    tlas_uses: list = []  # (name, o2w 4x4) static instance uses
    for inst in desc.instances:
        static = np.allclose(
            inst.instance_to_world.m[0], inst.instance_to_world.m[1],
            atol=1e-12,
        )
        if static and _tlas_eligible(inst.name):
            tlas_uses.append((inst.name, inst.instance_to_world.m[0]))
            continue
        for rec in desc.objects.get(inst.name, []):
            o2w0 = inst.instance_to_world.m[0] @ rec.object_to_world.m[0]
            o2w1 = inst.instance_to_world.m[1] @ rec.object_to_world.m[1]
            shape_records.append((rec, o2w0, o2w1))

    # --- materials: dedupe by identity -------------------------------------
    mat_records = []
    mat_index: dict[int, int] = {}
    def mat_id_for(m):
        if id(m) not in mat_index:
            mat_index[id(m)] = len(mat_records)
            mat_records.append(m)
        return mat_index[id(m)]

    # --- flatten geometry ---------------------------------------------------
    tri_v0 = []
    tri_e1 = []
    tri_e2 = []
    tri_n = []  # (n0, n1, n2)
    tri_uv = []
    tri_mat = []
    tri_al = []
    tri_mid = []
    quads = []  # dicts
    # area lights: (emit spectrum, nsamples, linkage)
    area_lights = []

    tri_dv = []  # motion deltas of (v0, e1, e2), zeros for static meshes
    tri_dn = []  # motion deltas of (n0, n1, n2)
    any_motion = False
    motion_times = (0.0, 1.0)

    for rec, o2w, o2w_end in shape_records:
        mat_i = mat_id_for(rec.material)
        al_id = -1
        if rec.area_light is not None:
            al_id = len(area_lights)
        mesh = _refine_shape(rec, o2w)
        animated = not np.allclose(o2w, o2w_end, atol=1e-12)
        if mesh is not None:
            start = sum(len(v) for v in tri_v0)
            idx = mesh.indices
            p = mesh.positions
            v0 = p[idx[:, 0]]
            v1 = p[idx[:, 1]]
            v2 = p[idx[:, 2]]
            e1 = v1 - v0
            e2 = v2 - v0
            if mesh.normals is not None:
                n0, n1, n2 = (
                    mesh.normals[idx[:, 0]],
                    mesh.normals[idx[:, 1]],
                    mesh.normals[idx[:, 2]],
                )
            else:
                fn = np.cross(e1, e2)
                fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
                if rec.reverse_orientation:
                    fn = -fn
                n0 = n1 = n2 = fn
            if mesh.uvs is not None:
                uv0, uv1, uv2 = (
                    mesh.uvs[idx[:, 0]],
                    mesh.uvs[idx[:, 1]],
                    mesh.uvs[idx[:, 2]],
                )
            else:
                z = np.zeros((len(idx), 2), np.float32)
                uv0 = z
                uv1 = z + [1.0, 0.0]
                uv2 = z + [1.0, 1.0]
            count = len(idx)
            tri_v0.append(v0.astype(np.float32))
            tri_e1.append(e1.astype(np.float32))
            tri_e2.append(e2.astype(np.float32))
            tri_n.append((n0.astype(np.float32), n1.astype(np.float32), n2.astype(np.float32)))
            tri_uv.append((uv0, uv1, uv2))
            tri_mat.append(np.full(count, mat_i, np.int32))
            tri_al.append(np.full(count, al_id, np.int32))
            tri_mid.append(np.full(count, rec.primitive_id, np.int32))
            if animated:
                any_motion = True
                motion_times = tuple(rec.transform_times[:2])
                mesh_e = _refine_shape(rec, o2w_end)
                pe = mesh_e.positions
                v0e = pe[idx[:, 0]]
                e1e = pe[idx[:, 1]] - v0e
                e2e = pe[idx[:, 2]] - v0e
                dv = np.concatenate(
                    [v0e - v0, e1e - e1, e2e - e2], axis=1
                ).astype(np.float32)
                if mesh_e.normals is not None:
                    n0e = mesh_e.normals[idx[:, 0]]
                    n1e = mesh_e.normals[idx[:, 1]]
                    n2e = mesh_e.normals[idx[:, 2]]
                else:
                    fne = np.cross(e1e, e2e)
                    fne /= np.maximum(
                        np.linalg.norm(fne, axis=-1, keepdims=True), 1e-20
                    )
                    if rec.reverse_orientation:
                        fne = -fne
                    n0e = n1e = n2e = fne
                dn = np.concatenate(
                    [n0e - n0, n1e - n1, n2e - n2], axis=1
                ).astype(np.float32)
                tri_dv.append(dv)
                tri_dn.append(dn)
            else:
                tri_dv.append(np.zeros((count, 9), np.float32))
                tri_dn.append(np.zeros((count, 9), np.float32))
            if al_id >= 0:
                areas = _triangle_areas(v0, e1, e2)
                area_lights.append(
                    dict(
                        rec=rec,
                        kind="mesh",
                        tri_start=start,
                        tri_count=count,
                        areas=areas,
                    )
                )
        elif rec.shape_type in _QUADRIC_TYPES:
            if animated:
                err.warning(
                    f"animated quadric {rec.shape_type!r}: motion blur is "
                    "supported for meshes only; using the start transform"
                )
            qtype = _QUADRIC_TYPES[rec.shape_type]
            prm = _quadric_params(rec)
            reverse = rec.reverse_orientation ^ xf.swaps_handedness(o2w)
            qi = len(quads)
            quads.append(
                dict(
                    type=qtype,
                    o2w=o2w.astype(np.float64),
                    params=prm,
                    mat=mat_i,
                    al=al_id,
                    mid=rec.primitive_id,
                    reverse=reverse,
                )
            )
            if al_id >= 0:
                area_lights.append(dict(rec=rec, kind="quad", quad_idx=qi))
        else:
            err.warning(f"shape {rec.shape_type!r} not supported yet; skipped")
            if al_id >= 0:
                area_lights.append(None)  # keep ids aligned

    def cat(parts, width=None, dtype=np.float32):
        if parts:
            return np.concatenate(parts, axis=0).astype(dtype)
        return np.zeros((0,) + ((width,) if width else ()), dtype)

    v0 = cat(tri_v0, 3)
    e1 = cat(tri_e1, 3)
    e2 = cat(tri_e2, 3)
    if tri_n:
        n0 = np.concatenate([t[0] for t in tri_n])
        n1 = np.concatenate([t[1] for t in tri_n])
        n2 = np.concatenate([t[2] for t in tri_n])
        uv0 = np.concatenate([t[0] for t in tri_uv]).astype(np.float32)
        uv1 = np.concatenate([t[1] for t in tri_uv]).astype(np.float32)
        uv2 = np.concatenate([t[2] for t in tri_uv]).astype(np.float32)
    else:
        n0 = n1 = n2 = np.zeros((0, 3), np.float32)
        uv0 = uv1 = uv2 = np.zeros((0, 2), np.float32)
    T = len(v0)
    Q = len(quads)

    dv = cat(tri_dv, 9) if any_motion else None
    dn = cat(tri_dn, 9) if any_motion else None

    # --- instanced objects: ONE object-space copy + per-object BLAS -------
    # (reference: TransformedPrimitive sharing, primitive.h:89). Object
    # triangles are appended to the global tables AFTER the world tris
    # ([T_world, T) below); only [0, T_world) enters the world BVH. Their
    # normals/tangents are object-space — surface_interaction rotates them
    # by the hit instance's transform.
    T_world = T
    inst_extra = {}
    if tlas_uses:
        from pbrt_tpu.accel.wide import build_wide_bvh as _bwb, LEAF_TRIS

        obj_names = list(dict.fromkeys(n for n, _ in tlas_uses))
        obj_info = {}
        blas_rows = []
        row_off = 0
        add_v0, add_e1, add_e2 = [], [], []
        add_n, add_uv, add_mat, add_al, add_mid = [], [], [], [], []
        for name in obj_names:
            ov0, oe1, oe2 = [], [], []
            for rec in desc.objects[name]:
                mesh = _refine_shape(rec, rec.object_to_world.m[0])
                if mesh is None:
                    continue
                idx = mesh.indices
                p = mesh.positions
                a0 = p[idx[:, 0]]
                a1 = p[idx[:, 1]] - a0
                a2 = p[idx[:, 2]] - a0
                cnt = len(idx)
                ov0.append(a0.astype(np.float32))
                oe1.append(a1.astype(np.float32))
                oe2.append(a2.astype(np.float32))
                if mesh.normals is not None:
                    nn = (mesh.normals[idx[:, 0]], mesh.normals[idx[:, 1]],
                          mesh.normals[idx[:, 2]])
                else:
                    fn = np.cross(a1, a2)
                    fn /= np.maximum(
                        np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20
                    )
                    if rec.reverse_orientation:
                        fn = -fn
                    nn = (fn, fn, fn)
                if mesh.uvs is not None:
                    uvv = (mesh.uvs[idx[:, 0]], mesh.uvs[idx[:, 1]],
                           mesh.uvs[idx[:, 2]])
                else:
                    z = np.zeros((cnt, 2), np.float32)
                    uvv = (z, z + [1.0, 0.0], z + [1.0, 1.0])
                add_n.append(tuple(x.astype(np.float32) for x in nn))
                add_uv.append(tuple(x.astype(np.float32) for x in uvv))
                add_mat.append(np.full(cnt, mat_id_for(rec.material), np.int32))
                add_al.append(np.full(cnt, -1, np.int32))
                add_mid.append(np.full(cnt, rec.primitive_id, np.int32))
            o_v0 = np.concatenate(ov0)
            o_e1 = np.concatenate(oe1)
            o_e2 = np.concatenate(oe2)
            lo_o = np.minimum(np.minimum(o_v0, o_v0 + o_e1), o_v0 + o_e2)
            hi_o = np.maximum(np.maximum(o_v0, o_v0 + o_e1), o_v0 + o_e2)
            tree_o = bvh_mod.build_bvh(
                lo_o, hi_o, method="sah", max_prims_in_node=LEAF_TRIS
            )
            wide_o = _bwb(
                tree_o, o_v0, o_e1, o_e2, row_base=row_off, pid_base=T
            )
            obj_info[name] = dict(
                root=row_off, stack=wide_o.max_stack,
                lo=lo_o.min(axis=0), hi=hi_o.max(axis=0),
            )
            blas_rows.append(wide_o.rows)
            row_off += len(wide_o.rows)
            add_v0.append(o_v0)
            add_e1.append(o_e1)
            add_e2.append(o_e2)
            T += len(o_v0)
        # append object-space triangles to the global tables
        v0 = np.concatenate([v0] + add_v0).astype(np.float32)
        e1 = np.concatenate([e1] + add_e1).astype(np.float32)
        e2 = np.concatenate([e2] + add_e2).astype(np.float32)
        n0 = np.concatenate([n0] + [t[0] for t in add_n])
        n1 = np.concatenate([n1] + [t[1] for t in add_n])
        n2 = np.concatenate([n2] + [t[2] for t in add_n])
        uv0 = np.concatenate([uv0] + [t[0] for t in add_uv]).astype(np.float32)
        uv1 = np.concatenate([uv1] + [t[1] for t in add_uv]).astype(np.float32)
        uv2 = np.concatenate([uv2] + [t[2] for t in add_uv]).astype(np.float32)
        tri_mat.append(np.concatenate(add_mat))
        tri_al.append(np.concatenate(add_al))
        tri_mid.append(np.concatenate(add_mid))
        if any_motion:
            pad9 = np.zeros((T - T_world, 9), np.float32)
            dv = np.concatenate([dv, pad9])
            dn = np.concatenate([dn, pad9])
        # instance table: each use gets its own fresh mesh id (reference:
        # TransformedPrimitive carries its own primitiveId, primitive.h:40)
        mid_base = 1 + max(
            [int(r.primitive_id) for r in desc.shapes]
            + [int(r.primitive_id) for rs in desc.objects.values()
               for r in rs]
            + [0]
        )
        i_o2w, i_w2o, i_root, i_lo, i_hi, i_mid = [], [], [], [], [], []
        for k, (name, m) in enumerate(tlas_uses):
            info = obj_info[name]
            i_o2w.append(m.astype(np.float32))
            i_w2o.append(np.linalg.inv(m).astype(np.float32))
            i_root.append(info["root"])
            blo, bhi = xf.apply_bbox(m, info["lo"], info["hi"])
            i_lo.append(blo.astype(np.float32))
            i_hi.append(bhi.astype(np.float32))
            i_mid.append(mid_base + k)
        # child refs / triangle ids stored in BLAS rows are OFFSET values
        # (c + row_base, pid + T) kept in f32 — guard the concatenated
        # totals, not just per-object row counts (a large concatenation
        # would otherwise silently corrupt references)
        assert row_off < (1 << 24), "instance BLAS row offset exceeds f32"
        assert T < (1 << 24), "instanced triangle id exceeds exact-f32"
        inst_extra = dict(
            inst_rows=jnp.asarray(np.concatenate(blas_rows), jnp.float32),
            inst_o2w=jnp.asarray(np.stack(i_o2w)),
            inst_w2o=jnp.asarray(np.stack(i_w2o)),
            inst_root=jnp.asarray(np.asarray(i_root, np.int32)),
            inst_lo=jnp.asarray(np.stack(i_lo)),
            inst_hi=jnp.asarray(np.stack(i_hi)),
            inst_mesh_id=jnp.asarray(np.asarray(i_mid, np.int32)),
            inst_stack=max(
                [info["stack"] for info in obj_info.values()] + [8]
            ),
        )

    # --- BVH ----------------------------------------------------------------
    # world BVH over the WORLD triangles only ([0, T_world)); object-space
    # instanced triangles are reached through the instance phase
    w_v0, w_e1, w_e2 = v0[:T_world], e1[:T_world], e2[:T_world]
    lo_t = (np.minimum(np.minimum(w_v0, w_v0 + w_e1), w_v0 + w_e2)
            if T_world else np.zeros((0, 3)))
    hi_t = (np.maximum(np.maximum(w_v0, w_v0 + w_e1), w_v0 + w_e2)
            if T_world else np.zeros((0, 3)))
    if any_motion and T_world:
        # union with shutter-end bounds so the static BVH covers the sweep
        w_dv = dv[:T_world]
        v0e = w_v0 + w_dv[:, 0:3]
        e1e = w_e1 + w_dv[:, 3:6]
        e2e = w_e2 + w_dv[:, 6:9]
        lo_e = np.minimum(np.minimum(v0e, v0e + e1e), v0e + e2e)
        hi_e = np.maximum(np.maximum(v0e, v0e + e1e), v0e + e2e)
        lo_t = np.minimum(lo_t, lo_e)
        hi_t = np.maximum(hi_t, hi_e)
    lo_q = np.zeros((Q, 3))
    hi_q = np.zeros((Q, 3))
    for i, q in enumerate(quads):
        lo_q[i], hi_q[i] = _quadric_bounds(q["type"], q["params"], q["o2w"])
    lo = np.concatenate([lo_t, lo_q])
    hi = np.concatenate([hi_t, hi_q])
    accel_name = desc.accelerator[0]
    method = "sah"
    split = desc.accelerator[1].find_one_string("splitmethod", "sah")
    if split in ("middle", "equal"):
        method = split
    tree = bvh_mod.build_bvh(lo, hi, method=method)
    # 8-wide unified BVH over triangles only (the TPU fast path;
    # accel/wide.py). Quadrics are tested densely by the traversal.
    wide = None
    if T_world and accel_name not in ("kdtree", "kdtreeaccel", "grid"):
        from pbrt_tpu.accel.wide import build_wide_bvh, LEAF_TRIS

        tri_tree = bvh_mod.build_bvh(
            lo_t, hi_t, method=method, max_prims_in_node=LEAF_TRIS
        )
        wide = build_wide_bvh(
            tri_tree, w_v0, w_e1, w_e2,
            tri_motion=dv[:T_world] if any_motion else None,
        )
    # alternative accelerators (reference: kdtreeaccel.cpp, grid.cpp) —
    # attached alongside the BVH arrays; traversal dispatches on accel_kind
    accel_extra = {}
    if accel_name in ("kdtree", "kdtreeaccel") and len(lo):
        from pbrt_tpu.accel.kdtree import build_kdtree

        ap = desc.accelerator[1]
        kd = build_kdtree(
            lo, hi,
            isect_cost=ap.find_one_float("intersectcost", 80.0),
            trav_cost=ap.find_one_float("traversalcost", 1.0),
            empty_bonus=ap.find_one_float("emptybonus", 0.5),
            max_prims=ap.find_one_int("maxprims", 8),
        )
        accel_extra = dict(
            accel_kind="kdtree",
            kd_split=jnp.asarray(kd.node_split),
            kd_axis=jnp.asarray(kd.node_axis),
            kd_above=jnp.asarray(kd.node_above),
            kd_prim_off=jnp.asarray(kd.node_prim_off),
            kd_prim_cnt=jnp.asarray(kd.node_prim_cnt),
            kd_prim_ids=jnp.asarray(kd.prim_ids),
        )
    elif accel_name == "grid" and len(lo):
        from pbrt_tpu.accel.grid import build_grid

        gr = build_grid(lo, hi)
        accel_extra = dict(
            accel_kind="grid",
            grid_dims=gr.dims,
            grid_off=jnp.asarray(gr.voxel_off),
            grid_cnt=jnp.asarray(gr.voxel_cnt),
            grid_ids=jnp.asarray(gr.prim_ids),
        )
    world_lo = lo.min(axis=0) if len(lo) else np.zeros(3)
    world_hi = hi.max(axis=0) if len(hi) else np.ones(3)
    if inst_extra:
        world_lo = np.minimum(world_lo, np.asarray(inst_extra["inst_lo"]).min(axis=0))
        world_hi = np.maximum(world_hi, np.asarray(inst_extra["inst_hi"]).max(axis=0))

    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
    i32 = lambda a: jnp.asarray(np.asarray(a, np.int32))
    geometry = SceneGeometry(
        tri_v0=f32(v0), tri_e1=f32(e1), tri_e2=f32(e2),
        tri_n0=f32(n0), tri_n1=f32(n1), tri_n2=f32(n2),
        tri_uv0=f32(uv0), tri_uv1=f32(uv1), tri_uv2=f32(uv2),
        tri_material=i32(cat(tri_mat, dtype=np.int32)),
        tri_area_light=i32(cat(tri_al, dtype=np.int32)),
        tri_mesh_id=i32(cat(tri_mid, dtype=np.int32)),
        quad_type=i32([q["type"] for q in quads]),
        quad_o2w=f32(np.asarray([q["o2w"] for q in quads]).reshape(Q, 4, 4)),
        quad_w2o=f32(
            np.asarray([np.linalg.inv(q["o2w"]) for q in quads]).reshape(Q, 4, 4)
        ),
        quad_params=f32(np.asarray([q["params"] for q in quads]).reshape(Q, 8)),
        quad_material=i32([q["mat"] for q in quads]),
        quad_area_light=i32([q["al"] for q in quads]),
        quad_mesh_id=i32([q["mid"] for q in quads]),
        quad_reverse=jnp.asarray([bool(q["reverse"]) for q in quads], bool),
        quad_active_types=tuple(sorted({int(q["type"]) for q in quads}))
        or (0,),
        node_lo=f32(tree.node_lo), node_hi=f32(tree.node_hi),
        node_second=i32(tree.node_second), node_count=i32(tree.node_count),
        node_axis=i32(tree.node_axis), prim_order=i32(tree.prim_order),
        world_lo=f32(world_lo), world_hi=f32(world_hi),
        tri_motion=f32(dv) if any_motion else None,
        tri_n_motion=f32(dn) if any_motion else None,
        motion_time=f32(np.asarray(motion_times)) if any_motion else None,
        has_motion=bool(any_motion),
        wide_rows=f32(wide.rows) if wide is not None else None,
        wide_motion=(
            f32(wide.motion_rows)
            if wide is not None and wide.motion_rows is not None
            else None
        ),
        wide_stack=wide.max_stack if wide is not None else 8,
        **accel_extra,
        **inst_extra,
    )
    geometry = pack_geometry(geometry)

    # --- lights -------------------------------------------------------------
    lights = _build_lights(desc, area_lights, world_lo, world_hi, cfg)

    # --- textures ------------------------------------------------------------
    from pbrt_tpu.textures.texture import build_texture_table

    # resolve mix materials' named sub-materials into table rows (sub-rows
    # may be used by no shape; mat_id_for appends them). Index loop so rows
    # appended mid-scan (nested mixes) are themselves resolved.
    named_mats = getattr(desc, "named_materials", None) or {}
    scan = 0
    while scan < len(mat_records):
        m = mat_records[scan]
        if m.mat_type == "mix" and not hasattr(m, "mix_rows"):
            self_row = mat_index[id(m)]
            rows = []
            for pname in ("namedmaterial1", "namedmaterial2"):
                nm = m.params.find_one_string(pname, "")
                sub = named_mats.get(nm)
                if sub is None or sub is m:
                    err.warning(
                        f"mix material: named material {nm!r} not found"
                    )
                    rows.append(self_row)
                else:
                    rows.append(mat_id_for(sub))
            m.mix_rows = tuple(rows)
        scan += 1

    tex_records: dict = {}
    for m in mat_records:
        tex_records.update(m.float_textures)
        tex_records.update(m.spectrum_textures)
    textures, tex_index = build_texture_table(tex_records, cfg)

    materials = build_material_table(mat_records, cfg, tex_index)

    # --- volumes -------------------------------------------------------------
    from pbrt_tpu.media.volumes import build_volume_table

    volumes = build_volume_table(desc.volumes, cfg)

    scene = RenderScene(
        geometry=geometry,
        materials=materials,
        lights=lights,
        textures=textures,
        volumes=volumes,
        has_textures=len(tex_records) > 0,
        has_volumes=len(desc.volumes) > 0,
    )

    # --- film / camera / sampler / integrator -------------------------------
    film_name, film_params = desc.film
    filt = make_filter(
        desc.filter[0],
        {k: v[1][0] for k, v in desc.filter[1].entries.items() if v[1]},
    )
    crop = film_params.find_floats("cropwindow")
    film_cfg = FilmConfig(
        xres=film_params.find_one_int("xresolution", 640),
        yres=film_params.find_one_int("yresolution", 480),
        n_bins=S,
        filter=filt,
        crop=tuple(crop) if crop is not None else (0.0, 1.0, 0.0, 1.0),
        filename=film_params.find_one_string("filename", "pbrt.dat"),
        kind=film_name,
    )
    cam_name, cam_params, cam2world_ts, times = desc.camera
    cam2world = AnimatedTransform.from_matrices(
        cam2world_ts.m[0], cam2world_ts.m[1], times[0], times[1]
    )
    camera = make_camera(cam_name, cam_params, cam2world, film_cfg)
    film_cfg = dataclasses.replace(
        film_cfg,
        fov=getattr(camera, "fov_deg", 0.0),
        focal_length=getattr(camera, "focal_length_mm", 0.0),
        f_stop=getattr(camera, "f_stop", 0.0),
    )
    # pixel ray-cone spread for mip-filtered texture lookups (fov spans the
    # shorter image axis — reference: core/camera.cpp ProjectiveCamera screen
    # window convention)
    cam_fov = getattr(camera, "fov_deg", 0.0)
    if 0.0 < cam_fov < 360.0 and len(tex_records) > 0:
        res_short = max(min(film_cfg.xres, film_cfg.yres), 1)
        spread = 2.0 * np.tan(np.deg2rad(cam_fov) / 2.0) / res_short
        scene = dataclasses.replace(scene, pixel_spread=float(spread))

    sampler_name, sampler_params = desc.sampler
    spp = sampler_params.find_one_int("pixelsamples", 4)

    integ_name, integ_params = desc.surface_integrator
    ikind = {
        "path": "path",
        "directlighting": "directlighting",
        "whitted": "whitted",
        "ambientocclusion": "ambientocclusion",
        "metadata": "metadata",
        "dipolesubsurface": "dipolesubsurface",
        "igi": "igi",
        "photonmap": "photonmap",
        "exphotonmap": "photonmap",
        "irradiancecache": "irradiancecache",
        "useprobes": "useprobes",
        "diffuseprt": "diffuseprt",
        "glossyprt": "glossyprt",
    }.get(integ_name, "path")
    vol_name = desc.volume_integrator[0]
    vol_kind = {"emission": "emission", "single": "single"}.get(vol_name, "emission")
    integrator = IntegratorConfig(
        kind=ikind,
        max_depth=integ_params.find_one_int("maxdepth", 5),
        strategy=integ_params.find_one_string("strategy", "all"),
        ao_nsamples=integ_params.find_one_int("nsamples", 4),
        ao_maxdist=integ_params.find_one_float("maxdist", 1e30),
        metadata_channel=integ_params.find_one_string("strategy", "depth"),
        volume_kind=vol_kind,
        n_bins=S,
        # reference default is 4096 per-hit samples (diffuseprt.cpp:93);
        # the wavefront evaluates all lanes in parallel, so a per-lane
        # budget this size is capped (quality knob, documented divergence)
        prt_nsamples=min(integ_params.find_one_int("nsamples", 4096), 64)
        if integ_name in ("diffuseprt", "glossyprt") else 32,
        # irradiance-cache parameters (reference: irradiancecache.cpp:377-383)
        ic_minweight=integ_params.find_one_float("minweight", 0.5),
        ic_minspacing=integ_params.find_one_float("minpixelspacing", 2.5),
        ic_maxspacing=integ_params.find_one_float("maxpixelspacing", 15.0),
        ic_maxangle=integ_params.find_one_float("maxangledifference", 10.0),
    )

    # PRT preprocess: SH-project incident radiance at the scene center
    # (reference: diffuseprt.cpp:48-56 / glossyprt.cpp Preprocess)
    if ikind in ("diffuseprt", "glossyprt"):
        from pbrt_tpu.integrators.prt import project_incident_radiance

        prt_data = project_incident_radiance(
            scene, integrator,
            lmax=integ_params.find_one_int("lmax", 4),
            nsamples=min(integ_params.find_one_int("nsamples", 4096), 4096),
        )
        scene = dataclasses.replace(scene, prt=prt_data)

    # IGI preprocess: generate the VPL sets (reference: igi.cpp Preprocess)
    if ikind == "igi":
        from pbrt_tpu.integrators.igi import generate_vpls

        n_vpl_paths = integ_params.find_one_int("nlights", 64) * 4
        vpls = generate_vpls(scene, n_paths=max(n_vpl_paths, 256),
                             max_depth=integ_params.find_one_int("maxdepth", 5))
        scene = dataclasses.replace(scene, vpls=vpls, has_vpls=True)

    # useprobes: load + grid the probe file (reference: useprobes.cpp)
    if ikind == "useprobes":
        pf = integ_params.find_one_filename("filename", "")
        if pf:
            from pbrt_tpu.renderers.probes import read_probe_file
            from pbrt_tpu.integrators.irradiance import ProbeGrid

            lmax_p, lo_p, hi_p, dims_p, coeffs_p = read_probe_file(pf, S)
            grid = coeffs_p.reshape(dims_p + coeffs_p.shape[1:])
            scene = dataclasses.replace(
                scene,
                probes=ProbeGrid(
                    lo=jnp.asarray(lo_p, jnp.float32),
                    hi=jnp.asarray(hi_p, jnp.float32),
                    coeffs=jnp.asarray(grid),
                    lmax=lmax_p,
                ),
            )
        else:
            err.warning("useprobes without a probe file; falling back to "
                          "irradiancecache behavior")
            integrator = dataclasses.replace(integrator, kind="irradiancecache")

    # photon map preprocess (reference: photonmap.cpp Preprocess)
    if ikind == "photonmap":
        from pbrt_tpu.integrators.photonmap import shoot_photons

        n_ind = integ_params.find_one_int("indirectphotons", 100000)
        photons = shoot_photons(
            scene, n_paths=min(max(n_ind // 16, 1024), 8192),
            max_depth=integ_params.find_one_int("maxphotondepth", 5),
        )
        scene = dataclasses.replace(scene, photons=photons, has_photons=True)

    # dipole subsurface preprocess (reference: Preprocess →
    # FindPoissonPointDistribution + irradiance, dipolesubsurface.cpp:189)
    if ikind == "dipolesubsurface":
        from pbrt_tpu.integrators.dipole import prepare_subsurface

        ssdata = prepare_subsurface(
            BuiltScene(
                scene=scene, camera=camera, film_config=film_cfg,
                filter_table=filt.table(), sampler_name=sampler_name,
                pixel_samples=spp, integrator=integrator,
                renderer_name=desc.renderer[0],
                renderer_params=desc.renderer[1], description=desc,
            )
        )
        if ssdata is not None:
            scene = dataclasses.replace(
                scene, subsurface=ssdata, has_subsurface=True
            )

    return BuiltScene(
        scene=scene,
        camera=camera,
        film_config=film_cfg,
        filter_table=filt.table(),
        sampler_name=sampler_name,
        pixel_samples=spp,
        integrator=integrator,
        renderer_name=desc.renderer[0],
        renderer_params=desc.renderer[1],
        description=desc,
    )


def _stack_maps(lmaps, S):
    """Stack projection/gonio maps to a common resolution (host bilinear)."""
    if not lmaps:
        return np.ones((1, 1, 1, S), np.float32)
    Hm = max(m.shape[0] for m in lmaps)
    Wm = max(m.shape[1] for m in lmaps)
    out = []
    for m in lmaps:
        if m.shape[:2] != (Hm, Wm):
            ys = np.clip(
                (np.arange(Hm) + 0.5) * m.shape[0] / Hm - 0.5, 0, m.shape[0] - 1
            )
            xs = np.clip(
                (np.arange(Wm) + 0.5) * m.shape[1] / Wm - 0.5, 0, m.shape[1] - 1
            )
            y0 = np.floor(ys).astype(int); y1 = np.minimum(y0 + 1, m.shape[0] - 1)
            x0 = np.floor(xs).astype(int); x1 = np.minimum(x0 + 1, m.shape[1] - 1)
            fy = (ys - y0)[:, None, None]
            fx = (xs - x0)[None, :, None]
            m = (
                m[y0][:, x0] * (1 - fy) * (1 - fx)
                + m[y0][:, x1] * (1 - fy) * fx
                + m[y1][:, x0] * fy * (1 - fx)
                + m[y1][:, x1] * fy * fx
            )
        out.append(m.astype(np.float32))
    return np.stack(out)


def _build_lights(desc, area_lights, world_lo, world_hi, cfg):
    S = cfg.n_bins
    center = 0.5 * (world_lo + world_hi)
    radius = float(np.linalg.norm(world_hi - world_lo) * 0.5 + 1e-6)

    rows = []  # per-light dict
    for rec in desc.lights:
        p = rec.params
        l2w = rec.light_to_world
        t = rec.light_type
        if t == "point":
            I = p.find_one_spectrum("I", 1.0, "illuminant") * p.find_one_float(
                "scale", 1.0
            )
            frm = p.find_one_point("from", (0.0, 0.0, 0.0))
            pos = frm @ l2w[:3, :3].T + l2w[:3, 3]
            rows.append(dict(type=lt_mod.POINT, emit=I, pos=pos, l2w=l2w))
        elif t == "spot":
            I = p.find_one_spectrum("I", 1.0, "illuminant") * p.find_one_float(
                "scale", 1.0
            )
            frm = p.find_one_point("from", (0.0, 0.0, 0.0))
            to = p.find_one_point("to", (0.0, 0.0, 1.0))
            pos = frm @ l2w[:3, :3].T + l2w[:3, 3]
            tow = to @ l2w[:3, :3].T + l2w[:3, 3]
            d = tow - pos
            d = d / max(np.linalg.norm(d), 1e-12)
            cone = p.find_one_float("coneangle", 30.0)
            delta = p.find_one_float("conedeltaangle", 5.0)
            rows.append(
                dict(
                    type=lt_mod.SPOT, emit=I, pos=pos, dirw=d, l2w=l2w,
                    cos_total=np.cos(np.deg2rad(cone)),
                    cos_falloff=np.cos(np.deg2rad(cone - delta)),
                )
            )
        elif t == "distant":
            L = p.find_one_spectrum("L", 1.0, "illuminant") * p.find_one_float(
                "scale", 1.0
            )
            frm = p.find_one_point("from", (0.0, 0.0, 0.0))
            to = p.find_one_point("to", (0.0, 0.0, 1.0))
            d = (to - frm) @ l2w[:3, :3].T
            d = d / max(np.linalg.norm(d), 1e-12)
            rows.append(dict(type=lt_mod.DISTANT, emit=L, dirw=d, l2w=l2w))
        elif t == "infinite":
            from pbrt_tpu.core import spectrum as spec_mod

            L = p.find_one_spectrum("L", 1.0, "illuminant") * p.find_one_float(
                "scale", 1.0
            )
            # Reference pipeline (infinite.cpp:60-77): texel_rgb *=
            # L.ToRGBSpectrum() at load, then Spectrum(texel, ILLUMINANT)
            # at lookup — i.e. the L spectrum modulates the map THROUGH an
            # RGB roundtrip (white L ≈ flat 0.998 → rgb (1.202,.947,.905)),
            # and even the no-map constant goes through ILLUM(ToRGB(L)).
            L_rgb = np.asarray(spec_mod.to_rgb(jnp.asarray(L), cfg))
            mapname = p.find_one_filename("mapname", "")
            env = None
            emit = None
            if mapname:
                try:
                    from pbrt_tpu.film.imageio import read_image

                    img = read_image(mapname)  # (H, W, 3) linear RGB
                    img = img * L_rgb[None, None, :]
                    env = np.asarray(
                        spec_mod.from_rgb(jnp.asarray(img), "illuminant", cfg)
                    )
                    emit = np.ones(cfg.n_bins, np.float32)
                except Exception as e:  # missing codec etc.
                    err.warning(f"infinite light map {mapname!r}: {e}; using constant")
            if emit is None:
                emit = np.asarray(
                    spec_mod.from_rgb(
                        jnp.asarray(np.maximum(L_rgb, 0.0), jnp.float32),
                        "illuminant", cfg,
                    )
                )
            rows.append(dict(type=lt_mod.INFINITE, emit=emit, l2w=l2w, env=env))
        elif t in ("projection", "goniometric"):
            I = p.find_one_spectrum("I", 1.0, "illuminant") * p.find_one_float(
                "scale", 1.0
            )
            pos = l2w[:3, 3]
            mapname = p.find_one_filename("mapname", "")
            img = None
            if mapname:
                try:
                    from pbrt_tpu.film.imageio import read_image
                    from pbrt_tpu.core import spectrum as spec_mod

                    rgb = read_image(mapname)
                    img = np.asarray(
                        spec_mod.from_rgb(jnp.asarray(rgb), "illuminant", cfg)
                    )
                except Exception as e:
                    err.warning(f"light map {mapname!r}: {e}; using constant")
            if img is None:
                img = np.ones((1, 1, S), np.float32)
            if t == "projection":
                # perspective screen window (reference: projection.cpp ctor)
                fov = p.find_one_float("fov", 45.0)
                aspect = img.shape[1] / img.shape[0]
                if aspect > 1.0:
                    screen = (-aspect, aspect, -1.0, 1.0)
                else:
                    screen = (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)
                rows.append(
                    dict(
                        type=lt_mod.PROJECTION, emit=I, pos=pos, l2w=l2w,
                        lmap=img, proj_screen=screen,
                        proj_invtan=1.0 / np.tan(0.5 * np.deg2rad(fov)),
                    )
                )
            else:
                rows.append(
                    dict(type=lt_mod.GONIO, emit=I, pos=pos, l2w=l2w, lmap=img)
                )
        else:
            err.warning(f"light {t!r} not supported yet; skipped")

    for al in area_lights:
        if al is None:
            continue
        rec = al["rec"]
        lp = rec.area_light[1]
        L = lp.find_one_spectrum("L", 1.0, "illuminant") * lp.find_one_float(
            "scale", 1.0
        )
        ns = lp.find_one_int("nsamples", 1)
        row = dict(type=lt_mod.AREA, emit=L, nsamples=ns, l2w=np.eye(4))
        if al["kind"] == "quad":
            row["shape_kind"] = 1
            row["quad_idx"] = al["quad_idx"]
        else:
            row["shape_kind"] = 2
            row["tri_start"] = al["tri_start"]
            row["tri_count"] = al["tri_count"]
            row["areas"] = al["areas"]
        rows.append(row)

    L = max(len(rows), 1)
    typ = np.zeros(L, np.int32)
    l2w = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    emit = np.zeros((L, S), np.float32)
    pos = np.zeros((L, 3), np.float32)
    dirw = np.tile(np.asarray([0, 0, 1], np.float32), (L, 1))
    cos_total = np.full(L, -1.0, np.float32)
    cos_falloff = np.full(L, -1.0, np.float32)
    nsamples = np.ones(L, np.int32)
    shape_kind = np.zeros(L, np.int32)
    quad_idx = np.zeros(L, np.int32)
    tri_start = np.zeros(L, np.int32)
    tri_count = np.zeros(L, np.int32)
    cdf_offset = np.zeros(L, np.int32)
    total_area = np.ones(L, np.float32)
    env_id = np.full(L, -1, np.int32)
    cdfs = []
    env_map = None
    power = np.ones(L, np.float32)
    lmap_id = np.full(L, -1, np.int32)
    lmaps = []
    proj_screen = np.tile(
        np.asarray([-1.0, 1.0, -1.0, 1.0], np.float32), (L, 1)
    )
    proj_invtan = np.ones(L, np.float32)

    if not rows:
        typ[0] = lt_mod.POINT  # dummy dark light
    for i, r in enumerate(rows):
        typ[i] = r["type"]
        l2w[i] = r.get("l2w", np.eye(4))
        emit[i] = r["emit"]
        pos[i] = r.get("pos", (0, 0, 0))
        dirw[i] = r.get("dirw", (0, 0, 1))
        cos_total[i] = r.get("cos_total", -1.0)
        cos_falloff[i] = r.get("cos_falloff", -1.0)
        nsamples[i] = r.get("nsamples", 1)
        shape_kind[i] = r.get("shape_kind", 0)
        quad_idx[i] = r.get("quad_idx", 0)
        power[i] = max(float(np.mean(r["emit"])), 1e-6)
        if r.get("shape_kind") == 2:
            tri_start[i] = r["tri_start"]
            tri_count[i] = r["tri_count"]
            cdf_offset[i] = sum(len(c) for c in cdfs)
            areas = r["areas"]
            total_area[i] = float(areas.sum())
            cdfs.append(np.cumsum(areas) / max(areas.sum(), 1e-20))
        if r.get("env") is not None and env_map is None:
            env_map = r["env"]
            env_id[i] = 0
        if r.get("lmap") is not None:
            lmap_id[i] = len(lmaps)
            lmaps.append(r["lmap"])
            proj_screen[i] = r.get("proj_screen", (-1.0, 1.0, -1.0, 1.0))
            proj_invtan[i] = r.get("proj_invtan", 1.0)

    tri_cdf = (
        np.concatenate(cdfs).astype(np.float32) if cdfs else np.zeros(1, np.float32)
    )
    if env_map is None:
        env_map = np.ones((1, 1, S), np.float32)
        env_lum = np.ones((1, 1), np.float32)
    else:
        env_lum = env_map.mean(axis=-1) + 1e-6

    active_types = tuple(sorted({int(t) for t in typ})) or (0,)
    remap = {code: k for k, code in enumerate(active_types)}
    dispatch = np.asarray([remap[int(t)] for t in typ], np.int32)
    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
    i32 = lambda a: jnp.asarray(np.asarray(a, np.int32))
    return lt_mod.LightTable(
        type=i32(typ),
        dispatch=i32(dispatch),
        l2w=f32(l2w),
        w2l=f32(np.linalg.inv(l2w)),
        emit=f32(emit),
        pos=f32(pos),
        dirw=f32(dirw),
        cos_total=f32(cos_total),
        cos_falloff=f32(cos_falloff),
        nsamples=i32(nsamples),
        shape_kind=i32(shape_kind),
        quad_idx=i32(quad_idx),
        tri_start=i32(tri_start),
        tri_count=i32(tri_count),
        cdf_offset=i32(cdf_offset),
        total_area=f32(total_area),
        tri_cdf=f32(tri_cdf),
        env_id=i32(env_id),
        env_map=f32(env_map),
        env_dist=smp.Distribution2D.build(f32(env_lum)),
        lmap_id=i32(lmap_id),
        lmap=f32(_stack_maps(lmaps, S)),
        proj_screen=f32(proj_screen),
        proj_invtan=f32(proj_invtan),
        world_center=f32(center),
        world_radius=jnp.float32(radius),
        power_dist=smp.Distribution1D.build(f32(power)),
        active_types=active_types,
    )
