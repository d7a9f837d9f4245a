"""idealDiffraction thin-lens camera (reference:
src/cameras/idealDiffraction.cpp:336-505)."""

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core.transform import AnimatedTransform
from pbrt_tpu.cameras.cameras import make_camera
from pbrt_tpu.scene.paramset import ParamSet


def _cam(extra=None, xres=64, yres=64):
    vals = {
        "focal_length": [50.0],
        "filmdistance": [70.0],
        "aperture_diameter": [4.0],
        "diffractionEnabled": [0.0],
    }
    for t, k, v in extra or []:
        vals[k] = v
    p = ParamSet()
    for k, v in vals.items():
        p.add("float", k, v)

    class FC:
        pass

    fc = FC()
    fc.xres, fc.yres = xres, yres
    c2w = AnimatedTransform.from_matrices(np.eye(4), np.eye(4), 0.0, 1.0)
    return make_camera("idealDiffraction", p, c2w, fc)


def test_thin_lens_focus():
    """All rays from one film point must converge at the thin-lens focus
    distance 1/(1/f − 1/d_film) = 175 mm regardless of the lens sample."""
    cam = _cam()
    R = 64
    px = jnp.full((R,), 20.0)
    py = jnp.full((R,), 40.0)
    u1 = jnp.linspace(0.01, 0.99, R)
    u2 = jnp.linspace(0.99, 0.01, R)
    rays = cam.generate_rays(px, py, u1, u2, jnp.zeros(R))
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)
    # march each ray to z = 175 (camera looks down +z here; direction z > 0)
    t = (175.0 - o[:, 2]) / d[:, 2]
    pts = o + t[:, None] * d
    assert pts[:, 0].std() < 1e-3 and pts[:, 1].std() < 1e-3
    # and the focus point is off-axis (pixel 20,40 of 64² is off-center)
    assert abs(pts[:, 0].mean()) > 1.0


def test_diffraction_spreads_with_wavelength():
    """HURB-style noise: enabled → directions spread; long λ spreads more."""
    R = 512
    px = jnp.full((R,), 32.0)
    py = jnp.full((R,), 32.0)
    u1 = jnp.full((R,), 0.5)
    u2 = jnp.full((R,), 0.5)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.key(7), jnp.arange(R, dtype=jnp.uint32)
    )

    def spread(lam, diff):
        cam = _cam([("float", "diffractionEnabled", [1.0 if diff else 0.0])])
        rays = cam.generate_rays(
            px, py, u1, u2, jnp.zeros(R),
            wavelength=jnp.full((R,), lam), keys=keys,
        )
        return float(np.asarray(rays.direction)[:, 0].std())

    off = spread(550.0, False)
    blue = spread(400.0, True)
    red = spread(700.0, True)
    assert off < 1e-9
    assert blue > 0.0
    assert red > blue
