"""Host-side triangle mesh processing.

Reference: src/shapes/trianglemesh.{h,cpp} — indexed meshes with optional
per-vertex normals/tangents/uvs and alpha-texture cutouts.

TPU-native design: meshes are flattened at scene-build time into a world-
space triangle soup (SoA numpy arrays) — no per-shape virtual dispatch at
render time. Vertices are pre-transformed to world space (the reference
does the same for mesh vertices, trianglemesh.cpp:61: "Transform mesh
vertices to world space"), so ray-triangle tests need no per-primitive
transforms.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pbrt_tpu.core import transform as xf


@dataclasses.dataclass
class MeshData:
    """World-space triangle soup for one shape record."""

    positions: np.ndarray  # (V, 3) world space
    indices: np.ndarray  # (F, 3) int32
    normals: np.ndarray | None  # (V, 3) world-space shading normals
    uvs: np.ndarray | None  # (V, 2)

    @property
    def num_faces(self) -> int:
        return len(self.indices)


def make_mesh(
    params,
    object_to_world: np.ndarray,
    reverse_orientation: bool = False,
) -> MeshData:
    """Build world-space mesh from 'trianglemesh' params
    (reference: CreateTriangleMeshShape, trianglemesh.cpp:330+)."""
    P = params.find_points("P")
    idx = params.find_ints("indices")
    if P is None or idx is None:
        raise ValueError("trianglemesh needs P and indices")
    indices = np.asarray(idx, np.int32).reshape(-1, 3)
    N = params.find_normals("N")
    uv = params.find_floats("uv")
    if uv is None:
        uv = params.find_floats("st")
    uvs = np.asarray(uv, np.float32).reshape(-1, 2) if uv is not None else None

    positions = _to_world_points(P, object_to_world)
    normals = None
    if N is not None:
        normals = _to_world_normals(np.asarray(N, np.float64), object_to_world)
        if reverse_orientation:
            normals = -normals
    return MeshData(
        positions=positions.astype(np.float32),
        indices=indices,
        normals=None if normals is None else normals.astype(np.float32),
        uvs=uvs,
    )


def _to_world_points(P: np.ndarray, m: np.ndarray) -> np.ndarray:
    P = np.asarray(P, np.float64)
    return P @ m[:3, :3].T + m[:3, 3]


def _to_world_normals(N: np.ndarray, m: np.ndarray) -> np.ndarray:
    inv = np.linalg.inv(m)
    n = N @ inv[:3, :3]
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    return n / np.maximum(ln, 1e-20)


def make_heightfield(params, object_to_world, reverse_orientation=False) -> MeshData:
    """Heightfield → regular-grid mesh (reference: shapes/heightfield.cpp
    Refine(): nx×ny z-grid tessellated to triangles over [0,1]²)."""
    nu = params.find_one_int("nu", -1)
    nv = params.find_one_int("nv", -1)
    z = params.find_floats("Pz")
    if nu < 0 or nv < 0 or z is None or len(z) != nu * nv:
        raise ValueError("heightfield needs nu, nv, Pz[nu*nv]")
    xs, ys = np.meshgrid(
        np.linspace(0.0, 1.0, nu), np.linspace(0.0, 1.0, nv), indexing="xy"
    )
    pts = np.stack([xs.ravel(), ys.ravel(), np.asarray(z)], axis=-1)
    uvs = pts[:, :2].astype(np.float32)
    faces = []
    for y in range(nv - 1):
        for x in range(nu - 1):
            v0 = y * nu + x
            v1 = v0 + 1
            v2 = v0 + nu + 1
            v3 = v0 + nu
            faces.append((v0, v1, v2))
            faces.append((v0, v2, v3))
    return MeshData(
        positions=_to_world_points(pts, object_to_world).astype(np.float32),
        indices=np.asarray(faces, np.int32),
        normals=None,
        uvs=uvs,
    )


def compute_vertex_normals(mesh: MeshData) -> np.ndarray:
    """Area-weighted vertex normals (used when a refined shape has none)."""
    p = mesh.positions.astype(np.float64)
    i = mesh.indices
    fn = np.cross(p[i[:, 1]] - p[i[:, 0]], p[i[:, 2]] - p[i[:, 0]])
    vn = np.zeros_like(p)
    for k in range(3):
        np.add.at(vn, i[:, k], fn)
    ln = np.linalg.norm(vn, axis=-1, keepdims=True)
    return (vn / np.maximum(ln, 1e-20)).astype(np.float32)
