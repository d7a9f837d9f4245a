"""Scene-build state machine.

Reference: src/core/api.{h,cpp} — the 40 ``pbrt*()`` free functions, the
UNINITIALIZED/OPTIONS/WORLD state machine (api.cpp:286-289), TransformSet
with two animation keyframes (api.cpp:151-175), GraphicsState attribute
stacks (api.cpp:227-249, 926-968), object instancing (api.cpp:1159-1212),
and the fork's mesh/material id↔name metadata tables (api.cpp:1228-1284).

Output is a host-side ``SceneDescription`` of plain records; the flattener
(scene/builder.py) turns it into SoA device arrays. No JAX here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from pbrt_tpu.config import DEFAULT_SPECTRAL, SpectralConfig
from pbrt_tpu.core import transform as xf
from pbrt_tpu.scene.paramset import ParamSet

ALL_TRANSFORM_BITS = 0b11
START_TRANSFORM_BIT = 0b01
END_TRANSFORM_BIT = 0b10


@dataclasses.dataclass
class TransformSet:
    """Two keyframe CTMs (reference: api.cpp:151-175)."""

    m: list  # [np(4,4), np(4,4)]

    @staticmethod
    def identity():
        return TransformSet([xf.identity(), xf.identity()])

    def copy(self):
        return TransformSet([m.copy() for m in self.m])

    def inverse(self):
        return TransformSet([xf.inverse(m) for m in self.m])

    @property
    def is_animated(self) -> bool:
        return not np.allclose(self.m[0], self.m[1])


@dataclasses.dataclass
class TextureRecord:
    name: str
    data_type: str  # 'float' | 'spectrum'
    tex_class: str  # 'imagemap' | 'checkerboard' | ...
    params: ParamSet
    tex_to_world: np.ndarray  # CTM at declaration (for 3D mappings)


@dataclasses.dataclass
class MaterialRecord:
    """Material + the texture environment visible when it was bound."""

    mat_type: str
    params: ParamSet
    float_textures: dict
    spectrum_textures: dict
    material_id: int  # fork: monotonic id (reference: material.h:39,55-58)
    name: str = ""  # named materials; also used for metadata tables


@dataclasses.dataclass
class ShapeRecord:
    shape_type: str
    params: ParamSet
    object_to_world: TransformSet
    transform_times: tuple
    reverse_orientation: bool
    material: MaterialRecord
    area_light: Optional[tuple]  # (type, ParamSet) or None
    primitive_id: int  # fork: monotonic (reference: primitive.h:40-44)
    instance_name: Optional[str] = None  # set while inside ObjectBegin/End


@dataclasses.dataclass
class InstanceRecord:
    name: str
    instance_to_world: TransformSet
    transform_times: tuple


@dataclasses.dataclass
class LightRecord:
    light_type: str
    params: ParamSet
    light_to_world: np.ndarray


@dataclasses.dataclass
class VolumeRecord:
    volume_type: str
    params: ParamSet
    volume_to_world: np.ndarray


@dataclasses.dataclass
class SceneDescription:
    """Everything the flattener/renderer needs, in declaration order."""

    shapes: list
    lights: list
    volumes: list
    instances: list  # InstanceRecord uses
    objects: dict  # name -> list[ShapeRecord]
    camera: tuple  # (name, ParamSet, cam_to_world TransformSet, (t0, t1))
    film: tuple  # (name, ParamSet)
    sampler: tuple
    filter: tuple
    renderer: tuple
    surface_integrator: tuple
    volume_integrator: tuple
    accelerator: tuple
    named_materials: dict
    material_names: dict  # material_id -> name (fork metadata tables)
    mesh_names: dict  # primitive_id -> name
    spectral_config: SpectralConfig


class _GraphicsState:
    """(reference: api.cpp:227-249)."""

    def __init__(self):
        self.material = "matte"
        self.material_params = ParamSet()
        self.named_materials: dict[str, MaterialRecord] = {}
        self.current_named_material: Optional[str] = None
        self.area_light: Optional[str] = None
        self.area_light_params: Optional[ParamSet] = None
        self.reverse_orientation = False
        self.float_textures: dict[str, TextureRecord] = {}
        self.spectrum_textures: dict[str, TextureRecord] = {}

    def copy(self):
        g = _GraphicsState.__new__(_GraphicsState)
        g.material = self.material
        g.material_params = self.material_params
        g.named_materials = dict(self.named_materials)
        g.current_named_material = self.current_named_material
        g.area_light = self.area_light
        g.area_light_params = self.area_light_params
        g.reverse_orientation = self.reverse_orientation
        g.float_textures = dict(self.float_textures)
        g.spectrum_textures = dict(self.spectrum_textures)
        return g


class Api:
    """pbrtInit..pbrtWorldEnd equivalent. Defaults match
    RenderOptions (reference: api.cpp:190-210)."""

    def __init__(self, spectral_config: SpectralConfig = DEFAULT_SPECTRAL):
        self.spectral_config = spectral_config
        self.search_dir = "."
        self.cur_transform = TransformSet.identity()
        self.active_bits = ALL_TRANSFORM_BITS
        self.named_coordinate_systems: dict[str, TransformSet] = {}
        self.transform_stack: list = []
        self.graphics_stack: list = []
        self.pushed_kinds: list = []
        self.graphics = _GraphicsState()
        self.in_world = False
        # RenderOptions defaults (reference: api.cpp:190-210)
        self._transform_times = (0.0, 1.0)
        self.filter_spec = ("box", ParamSet())
        self.film_spec = ("image", ParamSet())
        self.sampler_spec = ("lowdiscrepancy", ParamSet())
        self.accelerator_spec = ("bvh", ParamSet())
        self.renderer_spec = ("sampler", ParamSet())
        # reference default is directlighting, NOT path (api.cpp:220) —
        # scenes without a SurfaceIntegrator directive (e.g. bunny.pbrt)
        # must not gain indirect illumination
        self.surf_integrator_spec = ("directlighting", ParamSet())
        self.vol_integrator_spec = ("emission", ParamSet())
        self.camera_spec = ("perspective", ParamSet(), TransformSet.identity(), (0.0, 1.0))
        self.shapes: list[ShapeRecord] = []
        self.lights: list[LightRecord] = []
        self.volumes: list[VolumeRecord] = []
        self.instances: list[InstanceRecord] = []
        self.objects: dict[str, list] = {}
        self.current_object: Optional[str] = None
        self._next_material_id = 1
        self._next_primitive_id = 1
        self._material_names: dict[int, str] = {}
        self._mesh_names: dict[int, str] = {}
        self.description: Optional[SceneDescription] = None

    # -- plumbing -----------------------------------------------------------
    def set_search_directory(self, d: str):
        self.search_dir = d

    def _for_active(self, fn):
        for i in range(2):
            if self.active_bits & (1 << i):
                self.cur_transform.m[i] = fn(self.cur_transform.m[i])

    # -- transform directives (reference: api.cpp:758-856) ------------------
    def identity(self):
        self._for_active(lambda m: xf.identity())

    def translate(self, x, y, z):
        self._for_active(lambda m: m @ xf.translate((x, y, z)))

    def scale(self, x, y, z):
        self._for_active(lambda m: m @ xf.scale(x, y, z))

    def rotate(self, angle, x, y, z):
        self._for_active(lambda m: m @ xf.rotate(angle, (x, y, z)))

    def look_at(self, ex, ey, ez, lx, ly, lz, ux, uy, uz):
        # LookAt produces world-to-camera on the CTM (reference: api.cpp:782)
        w2c = xf.inverse(xf.look_at((ex, ey, ez), (lx, ly, lz), (ux, uy, uz)))
        self._for_active(lambda m: m @ w2c)

    def transform(self, *vals):
        m = np.asarray(vals, np.float64).reshape(4, 4).T  # column-major input
        self._for_active(lambda _: m)

    def concat_transform(self, *vals):
        m = np.asarray(vals, np.float64).reshape(4, 4).T
        self._for_active(lambda cur: cur @ m)

    def transform_times(self, start, end):
        self._transform_times = (float(start), float(end))

    def active_transform(self, which: str):
        self.active_bits = {
            "All": ALL_TRANSFORM_BITS,
            "StartTime": START_TRANSFORM_BIT,
            "EndTime": END_TRANSFORM_BIT,
        }[which]

    def coordinate_system(self, name: str):
        self.named_coordinate_systems[name] = self.cur_transform.copy()

    def coord_sys_transform(self, name: str):
        if name in self.named_coordinate_systems:
            self.cur_transform = self.named_coordinate_systems[name].copy()

    # -- options directives (reference: api.cpp:858-923) --------------------
    def camera(self, name, params):
        cam_to_world = self.cur_transform.inverse()
        self.named_coordinate_systems["camera"] = cam_to_world.copy()
        self.camera_spec = (name, params, cam_to_world, self._transform_times)

    def film(self, name, params):
        self.film_spec = (name, params)

    def sampler(self, name, params):
        self.sampler_spec = (name, params)

    def pixel_filter(self, name, params):
        self.filter_spec = (name, params)

    def renderer(self, name, params):
        self.renderer_spec = (name, params)

    def surface_integrator(self, name, params):
        self.surf_integrator_spec = (name, params)

    def volume_integrator(self, name, params):
        self.vol_integrator_spec = (name, params)

    def accelerator(self, name, params):
        self.accelerator_spec = (name, params)

    # -- world block --------------------------------------------------------
    def world_begin(self):
        self.in_world = True
        self.cur_transform = TransformSet.identity()
        self.active_bits = ALL_TRANSFORM_BITS
        self.named_coordinate_systems["world"] = self.cur_transform.copy()

    def attribute_begin(self):
        self.graphics_stack.append(self.graphics.copy())
        self.transform_stack.append(self.cur_transform.copy())
        self.pushed_kinds.append("attribute")

    def attribute_end(self):
        self.graphics = self.graphics_stack.pop()
        self.cur_transform = self.transform_stack.pop()
        self.pushed_kinds.pop()

    def transform_begin(self):
        self.transform_stack.append(self.cur_transform.copy())
        self.pushed_kinds.append("transform")

    def transform_end(self):
        self.cur_transform = self.transform_stack.pop()
        self.pushed_kinds.pop()

    # -- graphics state directives ------------------------------------------
    def texture(self, name, data_type, tex_class, params):
        if data_type == "color":
            data_type = "spectrum"
        rec = TextureRecord(
            name=name,
            data_type=data_type,
            tex_class=tex_class,
            params=params,
            tex_to_world=self.cur_transform.m[0].copy(),
        )
        if data_type == "float":
            self.graphics.float_textures[name] = rec
        else:
            self.graphics.spectrum_textures[name] = rec

    def material(self, name, params):
        self.graphics.material = name
        self.graphics.material_params = params
        self.graphics.current_named_material = None

    def make_named_material(self, name, params):
        mat_type = params.find_one_string("type", "matte")
        rec = self._make_material_record(mat_type, params, name=name)
        self.graphics.named_materials[name] = rec

    def named_material(self, name):
        self.graphics.current_named_material = name

    def area_light_source(self, name, params):
        self.graphics.area_light = name
        self.graphics.area_light_params = params

    def reverse_orientation(self):
        self.graphics.reverse_orientation = not self.graphics.reverse_orientation

    def light_source(self, name, params):
        self.lights.append(
            LightRecord(name, params, self.cur_transform.m[0].copy())
        )

    def volume(self, name, params):
        self.volumes.append(
            VolumeRecord(name, params, self.cur_transform.m[0].copy())
        )

    def _make_material_record(self, mat_type, params, name="") -> MaterialRecord:
        rec = MaterialRecord(
            mat_type=mat_type,
            params=params,
            float_textures=dict(self.graphics.float_textures),
            spectrum_textures=dict(self.graphics.spectrum_textures),
            material_id=self._next_material_id,
            name=name or mat_type,
        )
        self._material_names[rec.material_id] = rec.name
        self._next_material_id += 1
        return rec

    def shape(self, name, params):
        g = self.graphics
        if g.current_named_material is not None and g.current_named_material in g.named_materials:
            mat = g.named_materials[g.current_named_material]
        else:
            mat = self._make_material_record(g.material, g.material_params)
        area = (
            (g.area_light, g.area_light_params) if g.area_light is not None else None
        )
        rec = ShapeRecord(
            shape_type=name,
            params=params,
            object_to_world=self.cur_transform.copy(),
            transform_times=self._transform_times,
            reverse_orientation=g.reverse_orientation,
            material=mat,
            area_light=area,
            primitive_id=self._next_primitive_id,
            instance_name=self.current_object,
        )
        self._mesh_names[rec.primitive_id] = name
        self._next_primitive_id += 1
        if self.current_object is not None:
            self.objects[self.current_object].append(rec)
        else:
            self.shapes.append(rec)

    # -- instancing (reference: api.cpp:1159-1212) --------------------------
    def object_begin(self, name):
        self.attribute_begin()
        self.current_object = name
        self.objects.setdefault(name, [])

    def object_end(self):
        self.current_object = None
        self.attribute_end()

    def object_instance(self, name):
        self.instances.append(
            InstanceRecord(
                name=name,
                instance_to_world=self.cur_transform.copy(),
                transform_times=self._transform_times,
            )
        )

    def world_end(self):
        self.in_world = False
        self.description = SceneDescription(
            shapes=self.shapes,
            lights=self.lights,
            volumes=self.volumes,
            instances=self.instances,
            objects=self.objects,
            camera=self.camera_spec,
            film=self.film_spec,
            sampler=self.sampler_spec,
            filter=self.filter_spec,
            renderer=self.renderer_spec,
            surface_integrator=self.surf_integrator_spec,
            volume_integrator=self.vol_integrator_spec,
            accelerator=self.accelerator_spec,
            named_materials=dict(self.graphics.named_materials),
            material_names=dict(self._material_names),
            mesh_names=dict(self._mesh_names),
            spectral_config=self.spectral_config,
        )


def load_scene(path: str, config: SpectralConfig = DEFAULT_SPECTRAL) -> SceneDescription:
    """ParseFile + WorldEnd → SceneDescription."""
    from pbrt_tpu.scene.parser import parse_file

    api = Api(config)
    parse_file(path, api)
    if api.description is None:
        raise RuntimeError(f"{path}: no WorldEnd directive")
    return api.description


def load_scene_string(
    text: str, search_dir: str = ".", config: SpectralConfig = DEFAULT_SPECTRAL
) -> SceneDescription:
    from pbrt_tpu.scene.parser import parse_string

    api = Api(config)
    parse_string(text, api, search_dir)
    if api.description is None:
        raise RuntimeError("no WorldEnd directive")
    return api.description
