"""Projective cameras: perspective, orthographic, pinhole, environment.

Reference: src/cameras/{perspective,orthographic,environment}.{h,cpp} and
the fork's pinhole (src/cameras/pinhole.{h,cpp}: sensor plane at
``filmDistance``). The lens-simulation cameras (realisticDiffraction,
realisticEye, idealDiffraction) live in cameras/realistic.py / eye.py.

TPU-native design: a camera is a small pytree whose ``generate_rays``
produces a whole wavefront of world-space rays from continuous raster
coordinates + lens/time uniforms in one vectorized call. The animated
camera-to-world transform interpolates per-ray (motion blur) with the
quaternion slerp path of core/transform.py. The fork's per-ray
``wavelength`` is threaded through unchanged
(reference: camera.cpp:55-74 preserving ray->wavelength).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.core import transform as xf
from pbrt_tpu.core.transform import AnimatedTransform
from pbrt_tpu.utils import pytree_dataclass, static_field


def screen_window(xres: int, yres: int, params=None):
    """Default screen window from aspect
    (reference: api.cpp MakeCamera → film aspect logic, camera.cpp:78-87)."""
    if params is not None:
        sw = params.find_floats("screenwindow")
        if sw is not None and len(sw) == 4:
            return tuple(float(v) for v in sw)
    aspect = xres / yres
    if aspect > 1.0:
        return (-aspect, aspect, -1.0, 1.0)
    return (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)


def _screen_to_raster(xres, yres, window):
    x0, x1, y0, y1 = window
    return (
        xf.scale(xres, yres, 1.0)
        @ xf.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0)
        @ xf.translate((-x0, -y1, 0.0))
    )


@pytree_dataclass
class ProjectiveCamera:
    """Shared perspective/orthographic machinery
    (reference: camera.h:54-66)."""

    raster_to_camera: jnp.ndarray  # (4, 4)
    cam_to_world: AnimatedTransform
    lens_radius: jnp.ndarray  # ()
    focal_distance: jnp.ndarray  # ()
    shutter_open: jnp.ndarray  # ()
    shutter_close: jnp.ndarray  # ()
    kind: str = static_field(default="perspective")
    # lens metadata exposed to the film (reference: api.cpp:1423-1440)
    focal_length_mm: float = static_field(default=0.0)
    f_stop: float = static_field(default=0.0)
    fov_deg: float = static_field(default=0.0)

    def generate_rays(self, px, py, u_lens1, u_lens2, u_time, wavelength=None,
                      keys=None):
        """px, py: (R,) continuous raster coords; uniforms (R,).
        Returns world-space Ray (reference: perspective.cpp:55-97)."""
        R = px.shape[0]
        p_ras = jnp.stack([px, py, jnp.zeros_like(px)], axis=-1)
        p_cam = xf.apply_point(self.raster_to_camera, p_ras)
        if self.kind == "orthographic":
            o = p_cam
            d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
        else:
            o = jnp.zeros((R, 3), px.dtype)
            d = geom.normalize(p_cam)
        # thin-lens depth of field (reference: perspective.cpp:72-88)
        lx, ly = smp.concentric_sample_disk(u_lens1, u_lens2)
        lx = lx * self.lens_radius
        ly = ly * self.lens_radius
        ft = self.focal_distance / jnp.maximum(d[..., 2], 1e-9)
        p_focus = o + ft[..., None] * d
        o_lens = o.at[..., 0].add(lx).at[..., 1].add(ly)
        use_lens = self.lens_radius > 0.0
        o = jnp.where(use_lens, o_lens, o)
        d = jnp.where(use_lens, geom.normalize(p_focus - o_lens), d)
        time = self.shutter_open + u_time * (self.shutter_close - self.shutter_open)
        c2w = self.cam_to_world.interpolate(time)  # (R, 4, 4)
        o_w = xf.apply_point(c2w, o)
        d_w = xf.apply_vector(c2w, d)
        return geom.Ray.make(o_w, d_w, time=time, wavelength=wavelength)

    def ray_differentials(self, px, py, ray):
        """One-raster-pixel offset differentials for the generated rays
        (reference: PerspectiveCamera::GenerateRayDifferential,
        perspective.cpp:99-130 — same lens origin, direction shifted by the
        precomputed dxCamera/dyCamera; OrthoCamera shifts the origin,
        orthographic.cpp:63-76). Returns world (rx_o, rx_d, ry_o, ry_d)."""
        p_ras = jnp.stack([px, py, jnp.zeros_like(px)], axis=-1)
        p_cam = xf.apply_point(self.raster_to_camera, p_ras)
        dx = xf.apply_point(
            self.raster_to_camera, p_ras + jnp.asarray([1.0, 0.0, 0.0])
        ) - p_cam
        dy = xf.apply_point(
            self.raster_to_camera, p_ras + jnp.asarray([0.0, 1.0, 0.0])
        ) - p_cam
        c2w = self.cam_to_world.interpolate(ray.time)
        if self.kind == "orthographic":
            rx_o = ray.origin + xf.apply_vector(c2w, dx)
            ry_o = ray.origin + xf.apply_vector(c2w, dy)
            return rx_o, ray.direction, ry_o, ray.direction
        rx_d = xf.apply_vector(c2w, geom.normalize(p_cam + dx))
        ry_d = xf.apply_vector(c2w, geom.normalize(p_cam + dy))
        return ray.origin, rx_d, ray.origin, ry_d


@pytree_dataclass
class PinholeCamera:
    """Fork's simple pinhole: film plane at filmDistance behind an ideal
    pinhole, rays through the origin (reference: pinhole.h:27-34)."""

    raster_to_camera: jnp.ndarray
    cam_to_world: AnimatedTransform
    film_distance: jnp.ndarray
    shutter_open: jnp.ndarray
    shutter_close: jnp.ndarray
    fov_deg: float = static_field(default=0.0)
    focal_length_mm: float = static_field(default=0.0)
    f_stop: float = static_field(default=0.0)

    def generate_rays(self, px, py, u_lens1, u_lens2, u_time, wavelength=None,
                      keys=None):
        p_ras = jnp.stack([px, py, jnp.zeros_like(px)], axis=-1)
        p_film = xf.apply_point(self.raster_to_camera, p_ras)
        # sensor at -filmDistance; ray from film point through pinhole at 0
        p_film = p_film.at[..., 2].set(-self.film_distance)
        d = geom.normalize(-p_film)
        o = jnp.zeros_like(p_film)
        time = self.shutter_open + u_time * (self.shutter_close - self.shutter_open)
        c2w = self.cam_to_world.interpolate(time)
        return geom.Ray.make(
            xf.apply_point(c2w, o), xf.apply_vector(c2w, d),
            time=time, wavelength=wavelength,
        )


@pytree_dataclass
class EnvironmentCamera:
    """360° lat-long camera (reference: cameras/environment.cpp:48-75)."""

    cam_to_world: AnimatedTransform
    shutter_open: jnp.ndarray
    shutter_close: jnp.ndarray
    xres: int = static_field(default=256)
    yres: int = static_field(default=256)
    fov_deg: float = static_field(default=360.0)
    focal_length_mm: float = static_field(default=0.0)
    f_stop: float = static_field(default=0.0)

    def generate_rays(self, px, py, u_lens1, u_lens2, u_time, wavelength=None,
                      keys=None):
        theta = jnp.pi * py / self.yres
        phi = 2.0 * jnp.pi * px / self.xres
        d = jnp.stack(
            [
                jnp.sin(theta) * jnp.cos(phi),
                jnp.cos(theta),
                jnp.sin(theta) * jnp.sin(phi),
            ],
            axis=-1,
        )
        time = self.shutter_open + u_time * (self.shutter_close - self.shutter_open)
        c2w = self.cam_to_world.interpolate(time)
        o = jnp.zeros_like(d)
        return geom.Ray.make(
            xf.apply_point(c2w, o), xf.apply_vector(c2w, d),
            time=time, wavelength=wavelength,
        )


# ---------------------------------------------------------------------------
# Factories from ParamSets (defaults per reference Create*Camera)
# ---------------------------------------------------------------------------


def make_camera(name, params, cam_to_world: AnimatedTransform, film_cfg):
    xres, yres = film_cfg.xres, film_cfg.yres
    shutter_open = params.find_one_float("shutteropen", 0.0)
    shutter_close = params.find_one_float("shutterclose", 1.0)
    so = jnp.float32(shutter_open)
    sc = jnp.float32(shutter_close)
    if name in ("perspective", "orthographic"):
        window = screen_window(xres, yres, params)
        s2r = _screen_to_raster(xres, yres, window)
        if name == "perspective":
            fov = params.find_one_float("fov", 90.0)
            c2s = xf.perspective(fov, 1e-2, 1000.0)
        else:
            fov = 0.0
            c2s = xf.orthographic(0.0, 1.0)
        r2c = xf.inverse(c2s) @ xf.inverse(s2r)
        return ProjectiveCamera(
            raster_to_camera=jnp.asarray(r2c, jnp.float32),
            cam_to_world=cam_to_world,
            lens_radius=jnp.float32(params.find_one_float("lensradius", 0.0)),
            focal_distance=jnp.float32(params.find_one_float("focaldistance", 1e30)),
            shutter_open=so,
            shutter_close=sc,
            kind=name,
            fov_deg=float(fov),
        )
    if name == "pinhole":
        window = screen_window(xres, yres, params)
        s2r = _screen_to_raster(xres, yres, window)
        fd = params.find_one_float("filmdistance", 1.0)
        # raster → film plane in camera units (film diag maps via screen win)
        r2c = xf.inverse(s2r)
        return PinholeCamera(
            raster_to_camera=jnp.asarray(r2c, jnp.float32),
            cam_to_world=cam_to_world,
            film_distance=jnp.float32(fd),
            shutter_open=so,
            shutter_close=sc,
        )
    if name == "idealDiffraction":
        from pbrt_tpu.cameras.realistic import make_ideal_diffraction

        return make_ideal_diffraction(params, cam_to_world, film_cfg)
    if name in ("realistic", "realisticDiffraction", "perspectiveDiffraction"):
        from pbrt_tpu.cameras.realistic import make_realistic_diffraction

        return make_realistic_diffraction(params, cam_to_world, film_cfg)
    if name == "realisticEye":
        from pbrt_tpu.cameras.eye import make_realistic_eye

        return make_realistic_eye(params, cam_to_world, film_cfg)
    if name == "environment":
        return EnvironmentCamera(
            cam_to_world=cam_to_world,
            shutter_open=so,
            shutter_close=sc,
            xres=xres,
            yres=yres,
        )
    raise ValueError(f"unknown camera {name!r}")
