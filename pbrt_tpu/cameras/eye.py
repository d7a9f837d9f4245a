"""RealisticEye camera: schematic human-eye optics with biconic surfaces,
spectral ocular media, and a curved retina.

Reference: src/cameras/realisticEye.{h,cpp} (918 LoC). Behavior reproduced:
  - lens file: effective focal length, then rows of 7 — [radiusX radiusY
    thickness mediumIndex semiDiameter conicConstantX conicConstantY]
    (realisticEye.cpp:192-212); ``flipLensRadius`` Zemax-convention flag
    (:213-220); aperture rows (both radii 0) sized by ``pupilDiameter``
    (:223-226); semi-diameter sanity clamp vs conic (:228-236);
  - per-medium spectral IOR from the ``ior1``..``ior6`` spectrum params
    indexed by mediumIndex, looked up at the ray wavelength
    (lookUpIOR :899-918);
  - curved retina: film point mapped onto a sphere of ``retinaRadius``
    bounded by ``retinaSemiDiam`` at ``retinaDistance`` (:608-654);
  - rays aim at the rear biconic surface's disk (BiconicZ at the semi-
    diameter, :660-672) and trace rear→front: aperture plane or biconic
    intersection (root-solve of the sag equation — fixed-iteration
    bisection replaces GSL Brent, IntersectLensElAspheric :364-470), then
    vector Snell with the wavelength-dependent media indices (:780-845).
  - GRIN (gradient-index) lens coefficients are parsed but the gradient
    march is not wired into the reference's trace loop either
    (SURVEY.md §2.4) — we match that: homogeneous media between interfaces.

TPU-native design: static element unroll, vectorized bisection (40 fixed
iterations ≈ 1e-12 relative bracket) over the whole wavefront.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling as smp
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core import transform as xf
from pbrt_tpu.core.transform import AnimatedTransform
from pbrt_tpu.scene.paramset import read_float_file
from pbrt_tpu.utils import pytree_dataclass, static_field

_BISECT_ITERS = 48


def _biconic_z(x, y, rx, ry, cx, cy):
    """Sag z(x, y) of a biconic surface (reference: BiconicZ :877-895)."""
    f = (x * x) / rx + (y * y) / ry
    g_term = 1.0 - (1.0 + cx) * (x * x) / (rx * rx) - (1.0 + cy) * (y * y) / (ry * ry)
    g_term = jnp.maximum(g_term, 0.001)
    return f / (1.0 + jnp.sqrt(g_term))


@pytree_dataclass
class RealisticEyeCamera:
    el_rx: jnp.ndarray  # (E,) trace order (rear → front)
    el_ry: jnp.ndarray
    el_thickness: jnp.ndarray
    el_medium: jnp.ndarray  # (E,) i32 medium index (0 = aperture/none)
    el_semidiam: jnp.ndarray
    el_cx: jnp.ndarray
    el_cy: jnp.ndarray
    ior_spectra: jnp.ndarray  # (6, n_bins) media dispersion curves
    cam_to_world: AnimatedTransform
    retina_distance: jnp.ndarray
    retina_radius: jnp.ndarray
    retina_semidiam: jnp.ndarray
    pupil_diameter: jnp.ndarray
    lens_decenter: jnp.ndarray  # (2,)
    lens_tilt: jnp.ndarray  # (2,) degrees
    shutter_open: jnp.ndarray
    shutter_close: jnp.ndarray
    xres: int = static_field(default=256)
    yres: int = static_field(default=256)
    film_diag: float = static_field(default=10.0)
    focal_length_mm: float = static_field(default=16.7)
    f_stop: float = static_field(default=4.0)
    fov_deg: float = static_field(default=0.0)

    def _medium_ior(self, medium_index, lam):
        """Spectral IOR of 1-based medium index at λ; 550nm when λ=0
        (reference: lookUpIOR :899-918)."""
        lam_eff = jnp.where(lam == 0.0, 550.0, lam)
        idx = jnp.clip(medium_index - 1, 0, self.ior_spectra.shape[0] - 1)
        curve = self.ior_spectra[idx]
        from pbrt_tpu.config import DEFAULT_SPECTRAL

        n = spec.value_at_wavelength(
            jnp.broadcast_to(curve, lam_eff.shape + (curve.shape[-1],)), lam_eff
        )
        return jnp.where(medium_index <= 0, 1.0, n)

    def generate_rays(self, px, py, u_lens1, u_lens2, u_time,
                      wavelength=None, keys=None):
        R = px.shape[0]
        f32 = jnp.float32
        lam = (
            jnp.broadcast_to(jnp.asarray(wavelength, f32), (R,))
            if wavelength is not None
            else jnp.zeros((R,), f32)
        )
        ar = self.xres / self.yres
        width = self.film_diag / np.sqrt(1.0 + 1.0 / (ar * ar))
        height = width / ar
        sx = -((px) - self.xres / 2.0 - 0.25) / (self.xres / 2.0)
        sy = ((py) - self.yres / 2.0 - 0.25) / (self.yres / 2.0)
        x0 = sx * width / 2.0
        y0 = sy * height / 2.0
        z0 = jnp.full_like(x0, -self.retina_distance)
        alive = jnp.ones((R,), bool)

        # curved retina (reference :608-654)
        def curved():
            in_semi = (x0 * x0 + y0 * y0) <= self.retina_semidiam**2
            z_disc = -jnp.sqrt(
                jnp.maximum(
                    self.retina_radius**2 - self.retina_semidiam**2, 1e-12
                )
            )
            el = jnp.arctan(x0 / z_disc)
            az = jnp.arctan(y0 / z_disc)
            xc = -self.retina_radius * jnp.sin(el)
            rcos = self.retina_radius * jnp.cos(el)
            zc = -(rcos * jnp.cos(az))
            yc = -rcos * jnp.sin(az)
            zc = zc - self.retina_distance + self.retina_radius
            return xc, yc, zc, in_semi

        use_curve = self.retina_radius != 0.0
        xc, yc, zc, in_semi = curved()
        x0 = jnp.where(use_curve, xc, x0)
        y0 = jnp.where(use_curve, yc, y0)
        z0 = jnp.where(use_curve, zc, z0)
        alive = alive & jnp.where(use_curve, in_semi, True)
        o = jnp.stack([x0, y0, z0], -1)

        # aim at rear biconic surface disk (reference :660-676)
        lu, lv = smp.concentric_sample_disk(u_lens1, u_lens2)
        semi0 = self.el_semidiam[0]
        r0 = self.el_rx[0]
        # signed radius, like the reference's
        # sgn(radius)·BiconicZ(semiDiam, 0) (:666-668)
        disc_z = jnp.sign(r0) * _biconic_z(
            semi0, jnp.float32(0.0),
            jnp.where(r0 == 0, 1e9, r0),
            jnp.where(self.el_ry[0] == 0, 1e9, self.el_ry[0]),
            self.el_cx[0], self.el_cy[0],
        )
        disc_z = jnp.where(r0 == 0.0, 0.0, disc_z)
        target = jnp.stack(
            [lu * semi0, lv * semi0, jnp.full_like(lu, disc_z)], -1
        )
        d = geom.normalize(target - o)

        n_els = self.el_rx.shape[0]
        lens_dist = jnp.float32(0.0)
        for i in range(n_els):
            rx = self.el_rx[i]
            ry = self.el_ry[i]
            lens_dist = lens_dist + self.el_thickness[i]
            semi = self.el_semidiam[i]
            is_stop = (rx == 0.0) & (ry == 0.0)

            dz_safe = jnp.where(jnp.abs(d[:, 2]) < 1e-12, 1e-12, d[:, 2])
            t_ap = jnp.where(
                i == 0,
                self.retina_distance / dz_safe,
                (lens_dist - o[:, 2]) / dz_safe,
            )
            p_ap = o + t_ap[:, None] * d
            ap_ok = (p_ap[:, 0] ** 2 + p_ap[:, 1] ** 2) <= semi * semi

            # --- biconic intersection by bisection (reference :364-470) ---
            z_shift = -lens_dist
            oz = o[:, 2] + z_shift

            def sag_f(t):
                x = o[:, 0] + t * d[:, 0]
                y = o[:, 1] + t * d[:, 1]
                z = oz + t * d[:, 2]
                return z - _biconic_z(
                    x, y,
                    jnp.where(rx == 0, 1e9, rx),
                    jnp.where(ry == 0, 1e9, ry),
                    self.el_cx[i], self.el_cy[i],
                )

            t_hi0 = jnp.where(
                self.el_thickness[i] == 0.0,
                self.retina_distance * 2.0,
                self.el_thickness[i] * 1.5,
            )
            lo_t = jnp.zeros((R,))
            hi_t = jnp.full((R,), t_hi0)
            f_lo = sag_f(lo_t)
            f_hi = sag_f(hi_t)
            bracket = f_lo * f_hi < 0.0
            for _ in range(_BISECT_ITERS):
                mid = 0.5 * (lo_t + hi_t)
                f_mid = sag_f(mid)
                go_lo = f_lo * f_mid < 0.0
                hi_t = jnp.where(go_lo, mid, hi_t)
                lo_t = jnp.where(go_lo, lo_t, mid)
                f_lo = jnp.where(go_lo, f_lo, f_mid)
            t_hit = 0.5 * (lo_t + hi_t)
            p_hit = o + t_hit[:, None] * d
            within = (p_hit[:, 0] ** 2 + p_hit[:, 1] ** 2) <= semi * semi
            sph_ok = bracket & within

            # --- normal: ∂z/∂x, ∂z/∂y of the sag (reference :470-500) -----
            rx_s = jnp.where(rx == 0, 1e9, rx)
            ry_s = jnp.where(ry == 0, 1e9, ry)
            hx, hy = p_hit[:, 0], p_hit[:, 1]
            term1 = ((1 + self.el_cx[i]) * hx * hx) / (rx_s * rx_s)
            term2 = ((1 + self.el_cy[i]) * hy * hy) / (ry_s * ry_s)
            root = jnp.sqrt(jnp.maximum(1.0 - term1 - term2, 1e-6))
            fq = (hx * hx) / rx_s + (hy * hy) / ry_s
            gq = 1.0 + root
            fprime_x = 2.0 * hx / rx_s
            gprime_x = (-(1 + self.el_cx[i]) * hx) / (rx_s * rx_s * root)
            fprime_y = 2.0 * hy / ry_s
            gprime_y = (-(1 + self.el_cy[i]) * hy) / (ry_s * ry_s * root)
            zprime_x = (fprime_x * gq - gprime_x * fq) / (gq * gq)
            zprime_y = (fprime_y * gq - gprime_y * fq) / (gq * gq)
            v_x = jnp.stack([jnp.ones_like(hx), jnp.zeros_like(hx), zprime_x], -1)
            v_y = jnp.stack([jnp.zeros_like(hy), jnp.ones_like(hy), zprime_y], -1)
            normal = geom.normalize(jnp.cross(v_x, v_y))
            normal = geom.face_forward(normal, -d)

            # --- Snell with spectral media (reference :806-845) ------------
            n1 = self._medium_ior(self.el_medium[i], lam)
            if i + 1 < n_els:
                # medium on the scene side: next element's medium, skipping
                # aperture rows
                nm = self.el_medium[i + 1]
                j = i + 2
                nm = jnp.where((nm == 0) & (j < n_els),
                               self.el_medium[min(j, n_els - 1)], nm)
                n2 = self._medium_ior(nm, lam)
            else:
                n2 = jnp.ones_like(lam)
            eta = n1 / n2
            cos_i = -jnp.sum(normal * d, -1)
            sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
            tir = sin2_t > 1.0
            cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
            d_refr = geom.normalize(
                eta[:, None] * d + (eta * cos_i - cos_t)[:, None] * normal
            )

            new_o = jnp.where(is_stop, p_ap, p_hit)
            new_d = jnp.where(is_stop, d, d_refr)
            ok = jnp.where(is_stop, ap_ok, sph_ok & (~tir))
            alive = alive & ok
            o = jnp.where(alive[:, None], new_o, o)
            d = jnp.where(alive[:, None], new_d, d)

        d = jnp.where(alive[:, None], d, 0.0)
        time = self.shutter_open + u_time * (self.shutter_close - self.shutter_open)
        c2w = self.cam_to_world.interpolate(time)
        return geom.Ray.make(
            xf.apply_point(c2w, o),
            geom.normalize(xf.apply_vector(c2w, d)) * alive[:, None],
            time=time,
            wavelength=lam,
        )


def make_realistic_eye(params, cam_to_world, film_cfg):
    """Factory (reference: CreateRealisticEyeCamera :60-135)."""
    specfile = params.find_one_filename("specfile", "")
    if not specfile:
        raise ValueError("realisticEye needs a specfile")
    vals = read_float_file(specfile)
    if (len(vals) - 1) % 7 != 0:
        raise ValueError(f"{specfile}: rows must be [rx ry thick medium semidiam cx cy]")
    efl = float(vals[0])
    rows = vals[1:].reshape(-1, 7)
    pupil = params.find_one_float("pupilDiameter", 4.0)
    flip = params.find_one_bool("flipLensRadius", False)
    rx = rows[:, 0].copy()
    ry = rows[:, 1].copy()
    cx = rows[:, 5].copy()
    cy = rows[:, 6].copy()
    if flip:
        rx, ry, cx, cy = -rx, -ry, -cx, -cy
    semidiam = rows[:, 4].copy()
    stop = (rx == 0) & (ry == 0)
    semidiam[stop] = pupil / 2.0
    # semi-diameter sanity clamp (reference :228-236)
    for i in range(len(rows)):
        if stop[i]:
            continue
        smaller_r = min(rx[i], ry[i])
        bigger_k = max(cx[i], cy[i])
        if smaller_r != 0 and semidiam[i] ** 2 * (1 + bigger_k) / smaller_r**2 > 1.0:
            semidiam[i] = 0.95 * np.sqrt(smaller_r**2 / (1 + bigger_k))
    # reverse to trace order (rear → front)
    order = np.arange(len(rows))[::-1]
    from pbrt_tpu.config import DEFAULT_SPECTRAL

    S = DEFAULT_SPECTRAL.n_bins
    iors = np.ones((6, S), np.float32)
    for k in range(6):
        iors[k] = params.find_one_spectrum(f"ior{k+1}", 1.0)
    f32 = jnp.float32
    return RealisticEyeCamera(
        el_rx=jnp.asarray(rx[order], f32),
        el_ry=jnp.asarray(ry[order], f32),
        el_thickness=jnp.asarray(rows[:, 2][order], f32),
        el_medium=jnp.asarray(rows[:, 3][order], jnp.int32),
        el_semidiam=jnp.asarray(semidiam[order], f32),
        el_cx=jnp.asarray(cx[order], f32),
        el_cy=jnp.asarray(cy[order], f32),
        ior_spectra=jnp.asarray(iors),
        cam_to_world=cam_to_world,
        retina_distance=f32(params.find_one_float("retinaDistance", 16.32)),
        retina_radius=f32(params.find_one_float("retinaRadius", 0.0)),
        retina_semidiam=f32(params.find_one_float("retinaSemiDiam", 0.0)),
        pupil_diameter=f32(pupil),
        lens_decenter=jnp.asarray(
            [params.find_one_float("lensDecenterX", 0.0),
             params.find_one_float("lensDecenterY", 0.0)], f32),
        lens_tilt=jnp.asarray(
            [params.find_one_float("lensTiltX", 0.0),
             params.find_one_float("lensTiltY", 0.0)], f32),
        shutter_open=f32(params.find_one_float("shutteropen", 0.0)),
        shutter_close=f32(params.find_one_float("shutterclose", 1.0)),
        xres=film_cfg.xres,
        yres=film_cfg.yres,
        film_diag=params.find_one_float("filmdiag", 10.0),
        focal_length_mm=efl,
        f_stop=efl / max(pupil, 1e-9),
    )
