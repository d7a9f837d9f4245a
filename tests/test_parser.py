import numpy as np

from pbrt_tpu.scene.api import load_scene, load_scene_string

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"


def test_parse_killeroo_simple():
    d = load_scene(KILLEROO)
    assert d.camera[0] == "perspective"
    assert d.camera[1].find_one_float("fov", 90) == 39.0
    assert d.film[0] == "image"
    assert d.film[1].find_one_int("xresolution", 0) == 700
    assert d.sampler[0] == "lowdiscrepancy"
    assert d.sampler[1].find_one_int("pixelsamples", 0) == 64
    assert d.surface_integrator[0] == "directlighting"
    # shapes: 1 area-light sphere, 2 ground quads (trianglemesh), 2 killeroo
    # loopsubdiv models pulled in via Include
    types = [s.shape_type for s in d.shapes]
    assert "sphere" in types
    assert types.count("trianglemesh") == 2
    assert types.count("loopsubdiv") == 2
    sphere = next(s for s in d.shapes if s.shape_type == "sphere")
    assert sphere.area_light is not None
    assert sphere.area_light[0] == "area"
    np.testing.assert_allclose(
        sphere.area_light[1].find_one_spectrum("L", 1.0, "illuminant").shape, (32,)
    )
    assert sphere.params.find_one_float("radius", 1.0) == 3.0
    # attribute scoping: killeroo materials are plastic
    k = [s for s in d.shapes if s.material.mat_type == "plastic"]
    assert len(k) >= 2


def test_transform_stack_scoping():
    d = load_scene_string(
        """
        WorldBegin
        AttributeBegin
          Translate 1 0 0
          Shape "sphere" "float radius" [2]
        AttributeEnd
        Shape "sphere"
        WorldEnd
        """
    )
    s0, s1 = d.shapes
    np.testing.assert_allclose(s0.object_to_world.m[0][:3, 3], [1, 0, 0])
    np.testing.assert_allclose(s1.object_to_world.m[0][:3, 3], [0, 0, 0])


def test_named_material_and_texture():
    d = load_scene_string(
        """
        WorldBegin
        Texture "tex1" "spectrum" "checkerboard" "rgb tex1" [1 0 0] "rgb tex2" [0 1 0]
        MakeNamedMaterial "shiny" "string type" "metal" "float roughness" [.05]
        NamedMaterial "shiny"
        Shape "sphere"
        Material "matte" "texture Kd" "tex1"
        Shape "sphere"
        WorldEnd
        """
    )
    s0, s1 = d.shapes
    assert s0.material.mat_type == "metal"
    assert s0.material.params.find_one_float("roughness", 1.0) == 0.05
    assert s1.material.mat_type == "matte"
    assert s1.material.params.find_texture("Kd") == "tex1"
    assert "tex1" in s1.material.spectrum_textures
    assert s1.material.spectrum_textures["tex1"].tex_class == "checkerboard"


def test_object_instancing():
    d = load_scene_string(
        """
        WorldBegin
        ObjectBegin "tree"
        Shape "sphere" "float radius" [1]
        ObjectEnd
        Translate 5 0 0
        ObjectInstance "tree"
        Translate 5 0 0
        ObjectInstance "tree"
        WorldEnd
        """
    )
    assert len(d.shapes) == 0
    assert len(d.objects["tree"]) == 1
    assert len(d.instances) == 2
    np.testing.assert_allclose(d.instances[0].instance_to_world.m[0][:3, 3], [5, 0, 0])
    np.testing.assert_allclose(d.instances[1].instance_to_world.m[0][:3, 3], [10, 0, 0])


def test_animated_ctm():
    d = load_scene_string(
        """
        WorldBegin
        ActiveTransform EndTime
        Translate 2 0 0
        ActiveTransform All
        Shape "sphere"
        WorldEnd
        """
    )
    s = d.shapes[0]
    assert s.object_to_world.is_animated
    np.testing.assert_allclose(s.object_to_world.m[0][:3, 3], [0, 0, 0])
    np.testing.assert_allclose(s.object_to_world.m[1][:3, 3], [2, 0, 0])


def test_lights_and_world_coordsys():
    d = load_scene_string(
        """
        LookAt 0 0 -5  0 0 0  0 1 0
        Camera "perspective" "float fov" [45]
        WorldBegin
        LightSource "point" "rgb I" [10 10 10] "point from" [0 5 0]
        LightSource "distant" "rgb L" [1 1 1]
        WorldEnd
        """
    )
    assert len(d.lights) == 2
    assert d.lights[0].light_type == "point"
    cam_to_world = d.camera[2].m[0]
    np.testing.assert_allclose(cam_to_world[:3, 3], [0, 0, -5], atol=1e-6)


def test_spectrum_param_inline():
    d = load_scene_string(
        """
        WorldBegin
        Material "matte" "spectrum Kd" [400 .5 700 .5]
        Shape "sphere"
        WorldEnd
        """
    )
    kd = d.shapes[0].material.params.find_one_spectrum("Kd", 0.0)
    np.testing.assert_allclose(kd, 0.5, atol=1e-6)


def test_include_directive(tmp_path):
    inc = tmp_path / "inner.pbrt"
    inc.write_text('Shape "sphere" "float radius" [7]\n')
    main = tmp_path / "main.pbrt"
    main.write_text(f'WorldBegin\nInclude "inner.pbrt"\nWorldEnd\n')
    d = load_scene(str(main))
    assert d.shapes[0].params.find_one_float("radius", 0) == 7.0
