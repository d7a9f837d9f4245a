"""Mip-mapped texture filtering (reference: core/mipmap.h — Lanczos pow-2
resample :59-140, trilinear :84, EWA :288-372; here ray-cone footprints +
static-cost EWA: Gaussian-weighted Feline probes along the major axis with
the reference's eccentricity clamp and minor-axis mip level)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene.paramset import ParamSet
from pbrt_tpu.film.imageio import write_image
from pbrt_tpu.scene.api import TextureRecord
from pbrt_tpu.textures import texture as tex
from pbrt_tpu.config import SpectralConfig


def _pyramid_table(tmp_path, img):
    path = str(tmp_path / "t.exr")
    write_image(path, img.astype(np.float32))
    ps = ParamSet()
    ps.add("string", "filename", [path])
    rec = TextureRecord(
        name="t", data_type="spectrum", tex_class="imagemap", params=ps,
        tex_to_world=np.eye(4),
    )
    cfg = SpectralConfig()
    tt, index = tex.build_texture_table({"t": rec}, cfg)
    return tt, index[("spectrum", "t")]


def test_pyramid_levels_and_energy(tmp_path):
    """Non-pow2 image → pow2 level 0; every level preserves the mean
    (box downsample is an averaging filter)."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0.2, 0.8, (6, 10, 3))
    tt, tid = _pyramid_table(tmp_path, img)
    w0 = int(tt.img_w[tid])
    h0 = int(tt.img_h[tid])
    assert (w0, h0) == (16, 8)
    n_lev = int(tt.img_n_levels[tid])
    assert n_lev == 5  # 16x8, 8x4, 4x2, 2x1, 1x1
    pool = np.asarray(tt.pool_rgb)
    offs = np.asarray(tt.img_level_off[tid])
    mean0 = pool[offs[0] : offs[0] + w0 * h0].mean()
    for l in range(1, n_lev):
        w, h = max(w0 >> l, 1), max(h0 >> l, 1)
        m = pool[offs[l] : offs[l] + w * h].mean()
        assert abs(m - mean0) < 1e-4
    # 1x1 level equals the image mean
    top = pool[offs[n_lev - 1]]
    assert np.allclose(top.mean(), mean0, atol=1e-4)


def test_trilinear_minification_returns_mean(tmp_path):
    """A huge footprint must land at the coarsest level → image mean; a
    zero footprint stays sharp at level 0."""
    img = np.zeros((8, 8, 3), np.float32)
    img[::2, ::2] = 1.0  # quarter white
    tt, tid = _pyramid_table(tmp_path, img)
    tids = jnp.full((4,), tid, jnp.int32)
    # texel centers: (k + .5)/8 — cols/rows 0 (white) and 1 (black)
    u = jnp.asarray([0.0625, 0.0625, 0.1875, 0.1875])
    v = jnp.asarray([0.0625, 0.1875, 0.0625, 0.1875])

    sharp = tex._image_lookup(tt, tids, u, v)
    big = tex._image_lookup(tt, tids, u, v, uv_sigma=jnp.full((4,), 4.0))
    assert float(jnp.ptp(sharp[:, 0])) > 0.3  # sharp varies texel to texel
    assert np.allclose(np.asarray(big), 0.25, atol=0.02)  # mean everywhere


def test_trilinear_level_interpolation(tmp_path):
    """Footprints between two levels blend their values monotonically."""
    # level 0: vertical stripes → level1 blends to 0.5 uniformly
    img = np.zeros((8, 8, 3), np.float32)
    img[:, ::2] = 1.0
    tt, tid = _pyramid_table(tmp_path, img)
    tids = jnp.full((3,), tid, jnp.int32)
    u = jnp.full((3,), 0.0625)  # center of a white texel
    v = jnp.full((3,), 0.5)
    sig = jnp.asarray([1.0 / 8.0, 1.0 / 8.0 * 1.4, 1.0 / 4.0])  # lvl 0→1
    out = np.asarray(tex._image_lookup(tt, tids, u, v, uv_sigma=sig))[:, 0]
    assert out[0] > out[1] > out[2] - 1e-6
    assert abs(out[2] - 0.5) < 0.05


def test_aniso_taps_average_along_major_axis(tmp_path):
    """Anisotropic lookup averages along the major axis: on vertical
    stripes, a u-directed major axis blurs but a v-directed one doesn't."""
    img = np.zeros((32, 32, 3), np.float32)
    img[:, ::2] = 1.0
    tt, tid = _pyramid_table(tmp_path, img)
    tids = jnp.full((1,), tid, jnp.int32)
    u = jnp.full((1,), 0.5 + 1.0 / 64.0)
    v = jnp.full((1,), 0.5)
    sig = jnp.full((1,), 1.0 / 64.0)  # sub-texel minor → level 0
    along_u = tex._image_lookup(
        tt, tids, u, v, uv_sigma=sig, uv_major=jnp.asarray([[0.125, 0.0]])
    )
    along_v = tex._image_lookup(
        tt, tids, u, v, uv_sigma=sig, uv_major=jnp.asarray([[0.0, 0.125]])
    )
    # stripes along v: v-major taps all hit the same stripe (stays white),
    # u-major taps cross stripes (→ gray)
    assert float(along_v[0, 0]) > 0.9
    assert 0.2 < float(along_u[0, 0]) < 0.8


def test_ewa_beats_trilinear_at_grazing_angle(tmp_path):
    """The EWA contract (reference: mipmap.h:288-372): a grazing footprint
    whose major axis runs ALONG the stripes must keep the stripe contrast,
    where an isotropic trilinear lookup at the same (conservative, major-
    axis) width is forced to the blurred mip level → gray. Also checks the
    eccentricity clamp: an extreme footprint is bounded by maxAnisotropy."""
    img = np.zeros((32, 32, 3), np.float32)
    img[:, ::2] = 1.0  # vertical stripes (constant along v)
    tt, tid = _pyramid_table(tmp_path, img)
    tids = jnp.full((1,), tid, jnp.int32)
    u = jnp.full((1,), 0.5 + 1.0 / 64.0)  # center of a white stripe
    v = jnp.full((1,), 0.5)
    minor = jnp.full((1,), 1.0 / 64.0)
    major_v = jnp.asarray([[0.0, 0.25]])  # grazing along the stripes
    ewa = tex._image_lookup(tt, tids, u, v, uv_sigma=minor, uv_major=major_v)
    tri = tex._image_lookup(tt, tids, u, v, uv_sigma=jnp.full((1,), 0.25))
    assert float(ewa[0, 0]) > 0.85  # EWA keeps the white stripe sharp
    assert abs(float(tri[0, 0]) - 0.5) < 0.1  # isotropic blurs to mean
    # eccentricity clamp: a 64:1 footprint behaves like maxAniso:1 — the
    # minor axis (hence the mip level) is widened, blurring across stripes
    extreme = tex._image_lookup(
        tt, tids, u, v, uv_sigma=jnp.full((1,), 1.0 / 2048.0),
        uv_major=jnp.asarray([[0.5, 0.0]]),
    )
    assert 0.2 < float(extreme[0, 0]) < 0.8


def test_textured_scene_footprint_end_to_end(tmp_path):
    """A textured ground plane under a perspective camera produces nonzero
    uv footprints that grow with distance (ray-cone model)."""
    img = np.full((16, 16, 3), 0.5, np.float32)
    path = str(tmp_path / "g.exr")
    write_image(path, img)
    scene_txt = f"""
LookAt 0 2 -6  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "random" "integer pixelsamples" [1]
SurfaceIntegrator "directlighting"
WorldBegin
LightSource "distant" "rgb L" [3 3 3]
Texture "gtex" "spectrum" "imagemap" "string filename" ["{path}"]
Material "matte" "texture Kd" "gtex"
Shape "trianglemesh" "point P" [-50 0 -50  50 0 -50  50 0 50  -50 0 50]
  "float uv" [0 0 8 0 8 8 0 8]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""
    from pbrt_tpu.scene.api import load_scene_string
    from pbrt_tpu.scene.builder import build
    from pbrt_tpu.accel.intersect import intersect
    from pbrt_tpu.core.interaction import surface_interaction
    from pbrt_tpu.core import geometry as geom

    built = build(load_scene_string(scene_txt))
    assert built.scene.pixel_spread > 0.0
    # rays through the image center column, hitting near → far
    o = jnp.asarray([[0.0, 2.0, -6.0]] * 2)
    d = geom.normalize(jnp.asarray([[0.0, -0.5, 1.0], [0.0, -0.12, 1.0]]))
    ray = geom.Ray.make(o, d)
    hit = intersect(built.scene.geometry, ray)
    si = surface_interaction(
        built.scene.geometry, ray, hit, spread=built.scene.pixel_spread
    )
    s = np.asarray(si.uv_sigma)
    assert si.valid.all()
    assert (s > 0).all()
    assert s[1] > 2.0 * s[0]  # farther hit → bigger footprint
    # grazing incidence → anisotropy: major axis longer than minor
    maj = np.linalg.norm(np.asarray(si.uv_major), axis=-1)
    assert maj[1] > 2.0 * s[1]
