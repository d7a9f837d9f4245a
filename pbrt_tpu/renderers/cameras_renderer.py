"""CamerasRenderer: the fork's multi-view renderer.

Reference: src/renderers/camerasrenderer.{h,cpp} — reads a float file of
4×4 camera transforms (ReadCameraFile:196-240), renders the whole image
once per camera by mutating ``camera->CameraToWorld`` (:242-300), renaming
the output per camera. Enables light-field / multi-view captures for ISET.

TPU-native design: the camera-to-world matrix is a pytree leaf, so "mutating
the camera" is a functional ``dataclasses.replace`` — every view reuses the
same compiled render kernel (shapes unchanged, only weights differ).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core.transform import AnimatedTransform
from pbrt_tpu.scene.paramset import read_float_file


def read_camera_file(path: str) -> list[np.ndarray]:
    """Float file of concatenated 4×4 matrices (row-major)
    (reference: camerasrenderer.cpp:196-240)."""
    vals = read_float_file(path)
    if len(vals) % 16 != 0:
        raise ValueError(f"{path}: expected a multiple of 16 floats")
    return [vals[i : i + 16].reshape(4, 4) for i in range(0, len(vals), 16)]


def render_cameras(built, spp=None, seed=0, quick=False, verbose=True):
    """Render once per camera transform. Returns [(state, suffix), ...]."""
    from pbrt_tpu.renderers.sampler import render

    params = built.renderer_params
    cam_file = params.find_one_filename("cameraTransforms", "")
    if not cam_file:
        raise ValueError("cameras renderer needs a cameraTransforms file")
    mats = read_camera_file(cam_file)
    results = []
    for i, m in enumerate(mats):
        c2w = AnimatedTransform.from_matrices(m, m, 0.0, 1.0)
        camera = dataclasses.replace(built.camera, cam_to_world=c2w)
        view = dataclasses.replace(built, camera=camera)
        state = render(view, spp=spp, seed=seed, quick=quick, verbose=verbose)
        results.append((state, f"_cam{i}"))
    return results
