"""Surface interactions: differential geometry at hit points.

Reference: src/core/{intersection,diffgeom}.{h,cpp} — Intersection holds a
DifferentialGeometry (p, nn, u/v, dpdu/dpdv), the o2w transform, shape /
primitive / **material id (fork, intersection.h:42,54)** and rayEpsilon.

TPU-native design: the traversal returns only (t, prim, b1, b2); this module
reconstructs the full interaction SoA for the whole wavefront in one
vectorized pass (gathers by prim id) — the analogue of pbrt's per-hit
DifferentialGeometry fill-in, hoisted out of the traversal loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.accel.intersect import SceneGeometry, Hit
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import transform as xf
from pbrt_tpu.utils import pytree_dataclass


@pytree_dataclass
class SurfaceInteraction:
    """SoA over the ray batch. Invalid lanes hold harmless defaults."""

    valid: jnp.ndarray  # (R,) bool
    t: jnp.ndarray  # (R,)
    p: jnp.ndarray  # (R, 3) hit position
    ng: jnp.ndarray  # (R, 3) geometric normal (faceforwarded to shading)
    ns: jnp.ndarray  # (R, 3) shading normal
    uv: jnp.ndarray  # (R, 2)
    dpdu: jnp.ndarray  # (R, 3) parametric ∂p/∂u (shading frame s-axis seed;
    #   world units per uv unit — magnitude matters for bump mapping)
    wo: jnp.ndarray  # (R, 3) -ray.direction
    material: jnp.ndarray  # (R,) i32, -1 invalid
    area_light: jnp.ndarray  # (R,) i32, -1 none
    mesh_id: jnp.ndarray  # (R,) i32 (fork metadata channel)
    prim: jnp.ndarray  # (R,) i32
    ray_epsilon: jnp.ndarray  # (R,)
    # texture-space ray-cone footprint for mip filtering (the TPU-native
    # replacement of DifferentialGeometry::ComputeDifferentials — ray cones
    # instead of per-ray differential rays; zero when no spread given)
    uv_sigma: jnp.ndarray = None  # (R,) minor-axis radius in uv units
    uv_major: jnp.ndarray = None  # (R, 2) major-axis vector in uv units
    # parametric ∂p/∂v and shading-normal derivatives ∂n/∂u, ∂n/∂v —
    # needed by the exact Material::Bump chain (material.cpp:40-84).
    # None when the scene has no bump maps (compile-time gate).
    dpdv: jnp.ndarray = None  # (R, 3) world units per uv unit
    dndu: jnp.ndarray = None  # (R, 3)
    dndv: jnp.ndarray = None  # (R, 3)
    # raw per-pixel-axis uv differentials (dudx,dvdx)/(dudy,dvdy) — the
    # bump chain's du/dv source (reference: DifferentialGeometry dudx..dvdy)
    duvdx: jnp.ndarray = None  # (R, 2)
    duvdy: jnp.ndarray = None  # (R, 2)


def surface_interaction(
    g: SceneGeometry, ray: geom.Ray, hit: Hit, spread=None, diffs=None
) -> SurfaceInteraction:
    """``spread``: optional pixel cone half-width per unit distance (scalar
    or (R,)) used to derive the uv-space texture footprint at the hit.
    ``diffs``: optional exact ray differentials (rx_o, rx_d, ry_o, ry_d)
    world-space (R, 3) each — plane-projected to (dudx,dvdx)/(dudy,dvdy)
    exactly like DifferentialGeometry::ComputeDifferentials
    (diffgeom.cpp:63-100); takes precedence over ``spread``."""
    T = g.num_triangles
    Q = g.num_quadrics
    valid = hit.valid
    prim_safe = jnp.maximum(hit.prim, 0)
    p = ray.at(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0))
    wo = -geom.normalize(ray.direction)
    if T == 0 and Q == 0:
        R = valid.shape[0]
        z3 = jnp.zeros((R, 3), jnp.float32)
        neg1 = jnp.full((R,), -1, jnp.int32)
        up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
        return SurfaceInteraction(
            valid=jnp.zeros((R,), bool), t=hit.t, p=p, ng=up, ns=up,
            uv=jnp.zeros((R, 2)), dpdu=jnp.broadcast_to(
                jnp.asarray([1.0, 0.0, 0.0]), (R, 3)
            ),
            wo=wo, material=neg1, area_light=neg1, mesh_id=neg1,
            prim=hit.prim, ray_epsilon=jnp.zeros((R,)),
            uv_sigma=jnp.zeros((R,)), uv_major=jnp.zeros((R, 2)),
            dpdv=jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (R, 3)),
            dndu=z3, dndv=z3,
            duvdx=jnp.zeros((R, 2)), duvdy=jnp.zeros((R, 2)),
        )

    if T > 0:
        ti = jnp.clip(prim_safe, 0, T - 1)
        b1 = hit.b1
        b2 = hit.b2
        b0 = 1.0 - b1 - b2
        # ONE aligned row gather for all per-triangle shading fields
        # (see pack_geometry: tri_shade_rows layout)
        row = g.tri_shade_rows[ti]
        e1 = row[:, 0:3]
        e2 = row[:, 3:6]
        n0, n1, n2 = row[:, 6:9], row[:, 9:12], row[:, 12:15]
        uv0, uv1, uv2 = row[:, 15:17], row[:, 17:19], row[:, 19:21]
        mat_t = row[:, 21].astype(jnp.int32)
        al_t = row[:, 22].astype(jnp.int32)
        mid_t = row[:, 23].astype(jnp.int32)
        # (mid_t overridden below for instanced hits)
        if g.has_motion:
            from pbrt_tpu.accel.intersect import motion_weight

            tw = motion_weight(g, ray.time)[:, None]
            dm = g.tri_motion[ti]
            e1 = e1 + tw * dm[:, 3:6]
            e2 = e2 + tw * dm[:, 6:9]
            dn = g.tri_n_motion[ti]
            n0 = n0 + tw * dn[:, 0:3]
            n1 = n1 + tw * dn[:, 3:6]
            n2 = n2 + tw * dn[:, 6:9]
        ng_t = geom.normalize(jnp.cross(e1, e2))
        ns_t = geom.normalize(
            b0[:, None] * n0 + b1[:, None] * n1 + b2[:, None] * n2
        )
        ng_t = geom.face_forward(ng_t, ns_t)
        uv_t = b0[:, None] * uv0 + b1[:, None] * uv1 + b2[:, None] * uv2
        # parametric ∂p/∂u from the uv-edge system (reference:
        # Triangle::Intersect partial-derivative solve,
        # trianglemesh.cpp:150-180); degenerate uv → normalized e1
        duv1p = uv1 - uv0
        duv2p = uv2 - uv0
        detp = duv1p[:, 0] * duv2p[:, 1] - duv1p[:, 1] * duv2p[:, 0]
        okp = jnp.abs(detp) > 1e-12
        invp = jnp.where(okp, 1.0 / jnp.where(okp, detp, 1.0), 0.0)
        dpdu_p = (
            duv2p[:, 1:2] * e1 - duv1p[:, 1:2] * e2
        ) * invp[:, None]
        dpdu_t = jnp.where(okp[:, None], dpdu_p, geom.normalize(e1))
        # parametric ∂p/∂v from the same system (trianglemesh.cpp:150-180:
        # dpdv = (-duv2[0]*dp1 + duv1[0]*dp2)/det); degenerate uv →
        # orthogonal completion
        dpdv_p = (
            -duv2p[:, 0:1] * e1 + duv1p[:, 0:1] * e2
        ) * invp[:, None]
        dpdv_t = jnp.where(
            okp[:, None], dpdv_p, jnp.cross(ng_t, geom.normalize(e1))
        )
        # shading-normal derivatives (Triangle::GetShadingGeometry solves
        # the identical uv-edge system with normal deltas) — consumed by
        # the exact bump chain's displace·dndu terms
        dn1 = n1 - n0
        dn2 = n2 - n0
        dndu_t = jnp.where(
            okp[:, None],
            (duv2p[:, 1:2] * dn1 - duv1p[:, 1:2] * dn2) * invp[:, None],
            0.0,
        )
        dndv_t = jnp.where(
            okp[:, None],
            (-duv2p[:, 0:1] * dn1 + duv1p[:, 0:1] * dn2) * invp[:, None],
            0.0,
        )
        if g.inst_rows is not None and hit.inst is not None:
            # instanced hit: the gathered normals/tangents are OBJECT-space
            # — rotate into world by the instance transform (normals by the
            # inverse-transpose, i.e. n @ w2o_rot, same convention as the
            # quadric path below; reference: TransformedPrimitive
            # w2p(in) → world dg, primitive.cpp)
            ii = jnp.maximum(hit.inst, 0)
            w2o_r = g.inst_w2o[ii][:, :3, :3]
            o2w_r = g.inst_o2w[ii][:, :3, :3]
            is_inst = (hit.inst >= 0)[:, None]
            ns_w = geom.normalize(jnp.einsum("ri,rij->rj", ns_t, w2o_r))
            ng_w = geom.normalize(jnp.einsum("ri,rij->rj", ng_t, w2o_r))
            # tangents transform WITHOUT normalization — the parametric
            # magnitude (world units per uv unit, incl. instance scale) is
            # load-bearing for bump mapping
            dp_w = jnp.einsum("rij,rj->ri", o2w_r, dpdu_t)
            dpv_w = jnp.einsum("rij,rj->ri", o2w_r, dpdv_t)
            # normal derivatives transform like normals (inverse
            # transpose), unnormalized — matches Transform::operator()
            # on DifferentialGeometry
            dnu_w = jnp.einsum("ri,rij->rj", dndu_t, w2o_r)
            dnv_w = jnp.einsum("ri,rij->rj", dndv_t, w2o_r)
            ns_t = jnp.where(is_inst, ns_w, ns_t)
            ng_t = jnp.where(is_inst, ng_w, ng_t)
            dpdu_t = jnp.where(is_inst, dp_w, dpdu_t)
            dpdv_t = jnp.where(is_inst, dpv_w, dpdv_t)
            dndu_t = jnp.where(is_inst, dnu_w, dndu_t)
            dndv_t = jnp.where(is_inst, dnv_w, dndv_t)
            # each instance use carries its own primitive id (reference:
            # TransformedPrimitive primitiveId, primitive.h:40-44)
            mid_t = jnp.where(hit.inst >= 0, g.inst_mesh_id[ii], mid_t)
        if spread is not None or diffs is not None:
            # world→uv Jacobian shared by both footprint modes
            # (barycentric solve via the edge Gram matrix)
            duv1 = uv1 - uv0
            duv2 = uv2 - uv0
            g11 = geom.dot(e1, e1)
            g12 = geom.dot(e1, e2)
            g22 = geom.dot(e2, e2)
            det = jnp.maximum(g11 * g22 - g12 * g12, 1e-20)

            def to_uv(delta):
                d1 = geom.dot(e1, delta)
                d2 = geom.dot(e2, delta)
                a = (g22 * d1 - g12 * d2) / det
                b = (g11 * d2 - g12 * d1) / det
                return a[:, None] * duv1 + b[:, None] * duv2

        if diffs is not None:
            # EXACT reference semantics: intersect the offset rays with the
            # hit's tangent plane, take the world deltas, solve for
            # (dudx,dvdx)/(dudy,dvdy) (diffgeom.cpp:63-100). Degenerate
            # (grazing-parallel offset ray, nonfinite) lanes → zero
            # differentials, i.e. the unfiltered fallback — same as the
            # reference's !solved path.
            rx_o, rx_d, ry_o, ry_d = diffs
            d_pl = geom.dot(ng_t, p)

            def proj_delta(o_, dr):
                den = geom.dot(ng_t, dr)
                ok = jnp.abs(den) > 1e-12
                tpr = (d_pl - geom.dot(ng_t, o_)) / jnp.where(ok, den, 1.0)
                dp = o_ + tpr[:, None] * dr - p
                good = (ok & jnp.isfinite(tpr))[:, None]
                return jnp.where(
                    good & jnp.isfinite(dp), dp, 0.0
                )

            ax1 = to_uv(proj_delta(rx_o, rx_d))
            ax2 = to_uv(proj_delta(ry_o, ry_d))
            ax1 = jnp.where(jnp.isfinite(ax1), ax1, 0.0)
            ax2 = jnp.where(jnp.isfinite(ax2), ax2, 0.0)
        elif spread is not None:
            # ray-cone approximation (no per-ray differentials available):
            # the cone's circular cross-section (radius t·spread) projected
            # onto the surface is an ellipse — minor axis ⊥ the view
            # projection, major stretched by 1/cosθ. No aggressive grazing
            # clamp: the reference's plane-projected differentials stretch
            # unboundedly (the EWA lookup separately clamps eccentricity).
            w_fp = (jnp.abs(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0))
                    * spread)
            perp = jnp.cross(ng_t, wo)
            pl = jnp.linalg.norm(perp, axis=-1, keepdims=True)
            perp = jnp.where(pl > 1e-8, perp / jnp.maximum(pl, 1e-20),
                             dpdu_t)
            par = geom.normalize(jnp.cross(perp, ng_t))
            cos_i = jnp.clip(jnp.abs(geom.dot(wo, ng_t)), 1e-3, 1.0)
            ax1 = to_uv(w_fp[:, None] * perp)
            ax2 = to_uv((w_fp / cos_i)[:, None] * par)

        if spread is not None or diffs is not None:
            l1 = jnp.linalg.norm(ax1, axis=-1)
            l2 = jnp.linalg.norm(ax2, axis=-1)
            sigma_t = jnp.minimum(l1, l2)
            major_t = jnp.where((l1 >= l2)[:, None], ax1, ax2)
            duvdx_t, duvdy_t = ax1, ax2
        else:
            sigma_t = jnp.zeros(valid.shape)
            major_t = jnp.zeros(valid.shape + (2,))
            duvdx_t = jnp.zeros(valid.shape + (2,))
            duvdy_t = jnp.zeros(valid.shape + (2,))

    if Q > 0:
        qi = jnp.clip(prim_safe - T, 0, Q - 1)
        w2o = g.quad_w2o[qi]
        o2w = g.quad_o2w[qi]
        p_obj = jnp.einsum("rij,rj->ri", w2o[:, :3, :3], p) + w2o[:, :3, 3]
        typ = g.quad_type[qi]
        prm = g.quad_params[qi]
        radius = prm[:, 0]
        height = prm[:, 4]
        x, y, z = p_obj[:, 0], p_obj[:, 1], p_obj[:, 2]
        # implicit gradients per type (object space)
        n_sphere = p_obj
        n_cyl = jnp.stack([x, y, jnp.zeros_like(z)], -1)
        n_disk = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), p_obj.shape)
        k_cone = (radius / jnp.maximum(height, 1e-9)) ** 2
        n_cone = jnp.stack([x, y, -k_cone * (z - height)], -1)
        k_par = height / jnp.maximum(radius * radius, 1e-9)
        n_par = jnp.stack([2 * k_par * x, 2 * k_par * y, -jnp.ones_like(z)], -1)
        ah, ch = prm[:, 6], prm[:, 7]
        n_hyp = jnp.stack([ah * x, ah * y, -ch * z], -1)
        n_obj = jnp.select(
            [(typ == i)[:, None] for i in range(6)],
            [n_sphere, n_cyl, n_disk, n_cone, n_par, n_hyp],
            n_sphere,
        )
        # normals transform by inverse-transpose: n_world = n_obj @ w2o[:3,:3]
        n_w = jnp.einsum("ri,rij->rj", n_obj, w2o[:, :3, :3])
        n_w = geom.normalize(n_w)
        n_w = jnp.where(g.quad_reverse[qi][:, None], -n_w, n_w)
        # dpdu: φ-direction tangent
        dpdu_obj = jnp.stack([-y, x, jnp.zeros_like(z)], -1)
        dpdu_q = geom.normalize(
            jnp.einsum("rij,rj->ri", o2w[:, :3, :3], dpdu_obj)
        )
        # dpdv: θ-direction tangent = dpdu × n (checked against the sphere
        # parameterization; normalized — quadric bump amplitude is a
        # documented approximation, parametric magnitudes kept only for
        # triangles)
        dpdv_q = geom.normalize(jnp.cross(dpdu_q, n_w))
        uv_q = jnp.stack([hit.b1, hit.b2], -1)
        mat_q = g.quad_material[qi]
        al_q = g.quad_area_light[qi]
        mid_q = g.quad_mesh_id[qi]

    if T > 0 and Q > 0:
        is_tri = (hit.prim < T)[:, None]
        ng = jnp.where(is_tri, ng_t, n_w)
        ns = jnp.where(is_tri, ns_t, n_w)
        uv = jnp.where(is_tri, uv_t, uv_q)
        dpdu = jnp.where(is_tri, dpdu_t, dpdu_q)
        dpdv = jnp.where(is_tri, dpdv_t, dpdv_q)
        dndu = jnp.where(is_tri, dndu_t, 0.0)
        dndv = jnp.where(is_tri, dndv_t, 0.0)
        is_tri1 = hit.prim < T
        material = jnp.where(is_tri1, mat_t, mat_q)
        area_light = jnp.where(is_tri1, al_t, al_q)
        mesh_id = jnp.where(is_tri1, mid_t, mid_q)
        # quadric footprint: isotropic level-0 (uv params are angular; mip
        # filtering on quadrics is a documented gap)
        uv_sigma = jnp.where(is_tri1, sigma_t, 0.0)
        uv_major = jnp.where(is_tri1[:, None], major_t, 0.0)
        duvdx = jnp.where(is_tri1[:, None], duvdx_t, 0.0)
        duvdy = jnp.where(is_tri1[:, None], duvdy_t, 0.0)
    elif T > 0:
        ng, ns, uv, dpdu = ng_t, ns_t, uv_t, dpdu_t
        dpdv, dndu, dndv = dpdv_t, dndu_t, dndv_t
        material, area_light, mesh_id = mat_t, al_t, mid_t
        uv_sigma, uv_major = sigma_t, major_t
        duvdx, duvdy = duvdx_t, duvdy_t
    else:
        ng, ns, uv, dpdu = n_w, n_w, uv_q, dpdu_q
        dpdv = dpdv_q
        dndu = jnp.zeros_like(dpdv_q)
        dndv = jnp.zeros_like(dpdv_q)
        material, area_light, mesh_id = mat_q, al_q, mid_q
        uv_sigma = jnp.zeros(valid.shape)
        uv_major = jnp.zeros(valid.shape + (2,))
        duvdx = jnp.zeros(valid.shape + (2,))
        duvdy = jnp.zeros(valid.shape + (2,))

    neg1 = jnp.full(valid.shape, -1, jnp.int32)
    return SurfaceInteraction(
        valid=valid,
        t=hit.t,
        p=p,
        ng=ng,
        ns=ns,
        uv=uv,
        dpdu=dpdu,
        wo=wo,
        material=jnp.where(valid, material, neg1),
        area_light=jnp.where(valid, area_light, neg1),
        mesh_id=jnp.where(valid, mesh_id, neg1),
        prim=hit.prim,
        ray_epsilon=1e-3 * jnp.abs(hit.t),
        uv_sigma=uv_sigma,
        uv_major=uv_major,
        dpdv=dpdv,
        dndu=dndu,
        dndv=dndv,
        duvdx=duvdx,
        duvdy=duvdy,
    )


def offset_ray_origin(p, ng, w, eps):
    """Spawn-point offset along the geometric normal, signed toward w."""
    sign = jnp.where(geom.dot(ng, w) >= 0.0, 1.0, -1.0)
    return p + (sign * eps)[..., None] * ng
