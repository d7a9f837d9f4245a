
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.config import DEFAULT_SPECTRAL
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.scene.api import load_scene_string
from pbrt_tpu.scene.builder import build
from pbrt_tpu.textures import texture as tex


def build_table(scene_text):
    built = build(load_scene_string(scene_text))
    return built


def eval_tex(built, name, uv, p=None):
    tt = built.scene.textures
    # look up row id by evaluating on material kd binding
    mats = built.scene.materials
    tid = int(np.asarray(mats.kd_tex)[len(np.asarray(mats.kd_tex)) - 1])
    n = len(uv)
    uv = jnp.asarray(uv, jnp.float32)
    p = jnp.zeros((n, 3)) if p is None else jnp.asarray(p, jnp.float32)
    return tex.eval_spectrum(tt, jnp.full((n,), tid, jnp.int32), uv, p)


def test_checkerboard():
    built = build_table(
        """
        WorldBegin
        Texture "ch" "spectrum" "checkerboard" "float uscale" [2]
          "float vscale" [2] "rgb tex1" [1 0 0] "rgb tex2" [0 0 1]
        Material "matte" "texture Kd" "ch"
        Shape "sphere"
        WorldEnd
        """
    )
    # uscale 2 → cells of 0.5 pitch: (.25,.25) is cell (0,0) red,
    # (.75,.25) is cell (1,0) blue, (1.25,.25) wraps back to red
    out = eval_tex(built, "ch", [[0.25, 0.25], [0.75, 0.25], [1.25, 0.25]])
    rgb = np.asarray(spec.to_rgb(out))
    assert rgb[0, 0] > 0.5 and rgb[0, 2] < 0.3  # red cell
    assert rgb[1, 2] > 0.5 and rgb[1, 0] < 0.3  # blue cell
    np.testing.assert_allclose(rgb[0], rgb[2], atol=1e-5)  # period 1


def test_scale_of_checkerboard_nesting():
    built = build_table(
        """
        WorldBegin
        Texture "ch" "spectrum" "checkerboard" "float uscale" [2]
          "float vscale" [2] "rgb tex1" [1 1 1] "rgb tex2" [0 0 0]
        Texture "sc" "spectrum" "scale"
          "texture tex1" "ch" "rgb tex2" [.5 .5 .5]
        Material "matte" "texture Kd" "sc"
        Shape "sphere"
        WorldEnd
        """
    )
    out = eval_tex(built, "sc", [[0.25, 0.25], [0.75, 0.25]])
    lum = np.asarray(spec.luminance(out))
    assert abs(lum[0] - 0.5) < 0.05  # white cell × 0.5
    assert lum[1] < 0.02  # black cell


def test_uv_scaling():
    built = build_table(
        """
        WorldBegin
        Texture "ch" "spectrum" "checkerboard" "float uscale" [2]
          "float vscale" [2] "rgb tex1" [1 1 1] "rgb tex2" [0 0 0]
        Material "matte" "texture Kd" "ch"
        Shape "sphere"
        WorldEnd
        """
    )
    # with uscale 2, the pattern repeats with period 1 in u
    out = eval_tex(built, "ch", [[0.1, 0.1], [1.1, 0.1]])
    lum = np.asarray(spec.luminance(out))
    np.testing.assert_allclose(lum[0], lum[1], atol=1e-5)


def test_imagemap_from_exr(tmp_path):
    from pbrt_tpu.film.imageio import write_exr

    img = np.zeros((4, 8, 3), np.float32)
    img[:, :4] = [1.0, 0.0, 0.0]
    img[:, 4:] = [0.0, 1.0, 0.0]
    path = str(tmp_path / "t.exr")
    write_exr(path, img)
    built = build_table(
        f"""
        WorldBegin
        Texture "im" "spectrum" "imagemap" "string filename" ["{path}"]
        Material "matte" "texture Kd" "im"
        Shape "sphere"
        WorldEnd
        """
    )
    out = eval_tex(built, "im", [[0.25, 0.5], [0.75, 0.5]])
    rgb = np.asarray(spec.to_rgb(out))
    assert rgb[0, 0] > 0.5 and rgb[0, 1] < 0.3  # left half red
    assert rgb[1, 1] > 0.5 and rgb[1, 0] < 0.3  # right half green


def test_noise_textures_bounded():
    built = build_table(
        """
        WorldBegin
        Texture "f" "float" "fbm"
        Material "matte" "texture Kd" "f"
        Shape "sphere"
        WorldEnd
        """
    )
    # fbm binds as float texture — check the material sees no spectrum tex;
    # then evaluate the table row directly
    tt = built.scene.textures
    n = 64
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32)
    out = tex.eval_spectrum(
        tt, jnp.zeros((n,), jnp.int32), jnp.zeros((n, 2)), p
    )
    v = np.asarray(out)
    assert np.isfinite(v).all()
    assert v.std() > 0.01  # actually varies


def test_textured_render_smoke():
    """Full render with a checkerboard floor doesn't explode."""
    from pbrt_tpu.renderers.sampler import render
    from pbrt_tpu.film import film as film_mod

    built = build(load_scene_string(
        """
        LookAt 0 2 -3  0 0 0  0 1 0
        Camera "perspective" "float fov" [50]
        Film "image" "integer xresolution" [12] "integer yresolution" [12]
        Sampler "lowdiscrepancy" "integer pixelsamples" [2]
        SurfaceIntegrator "path" "integer maxdepth" [2]
        WorldBegin
        LightSource "infinite" "rgb L" [.8 .8 .8]
        Texture "ch" "spectrum" "checkerboard" "float uscale" [4]
          "float vscale" [4] "rgb tex1" [.9 .1 .1] "rgb tex2" [.1 .1 .9]
        Material "matte" "texture Kd" "ch"
        Shape "trianglemesh" "point P" [-5 0 -5  5 0 -5  5 0 5  -5 0 5]
          "float uv" [0 0 1 0 1 1 0 1]
          "integer indices" [0 1 2 2 3 0]
        WorldEnd
        """
    ))
    state = render(built, verbose=False)
    rgb = film_mod.to_rgb_image(state, built.film_config)
    assert np.isfinite(rgb).all()
    # the floor shows both colors: red-dominant and blue-dominant pixels
    red = (rgb[..., 0] > rgb[..., 2]).sum()
    blue = (rgb[..., 2] > rgb[..., 0]).sum()
    assert red > 3 and blue > 3
