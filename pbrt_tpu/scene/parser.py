"""Directive parser for .pbrt files.

Reference: src/core/pbrtparse.yy — the bison grammar mapping each directive
to a ``pbrt*()`` API call. Here each directive calls the corresponding
method on an ``Api`` object (scene/api.py), preserving the reference's
directive → API-call contract (api.h:35-78).
"""

from __future__ import annotations

import os

from pbrt_tpu.scene.lexer import Token, tokenize, tokenize_string
from pbrt_tpu.utils import error as err
from pbrt_tpu.scene.paramset import ParamSet

# known parameter type names (reference: paramset + pbrtparse.cpp:2400-2520)
_PARAM_TYPES = {
    "integer", "float", "bool", "string", "point", "vector", "normal",
    "rgb", "color", "xyz", "spectrum", "blackbody", "texture",
}

# directives taking a fixed count of raw floats
_FLOAT_DIRECTIVES = {
    "Translate": 3,
    "Scale": 3,
    "Rotate": 4,
    "LookAt": 9,
    "Transform": 16,
    "ConcatTransform": 16,
    "TransformTimes": 2,
}

# directives taking: string name, then a ParamSet
_NAMED_PARAM_DIRECTIVES = {
    "Camera": "camera",
    "Film": "film",
    "Sampler": "sampler",
    "PixelFilter": "pixel_filter",
    "Renderer": "renderer",
    "SurfaceIntegrator": "surface_integrator",
    "VolumeIntegrator": "volume_integrator",
    "Accelerator": "accelerator",
    "Material": "material",
    "Shape": "shape",
    "LightSource": "light_source",
    "AreaLightSource": "area_light_source",
    "Volume": "volume",
    "MakeNamedMaterial": "make_named_material",
}

_SIMPLE_DIRECTIVES = {
    "WorldBegin": "world_begin",
    "WorldEnd": "world_end",
    "AttributeBegin": "attribute_begin",
    "AttributeEnd": "attribute_end",
    "TransformBegin": "transform_begin",
    "TransformEnd": "transform_end",
    "ObjectEnd": "object_end",
    "ReverseOrientation": "reverse_orientation",
    "Identity": "identity",
}


class _TokenStream:
    def __init__(self, it):
        self._it = iter(it)
        self._peeked: Token | None = None

    def peek(self) -> Token | None:
        if self._peeked is None:
            self._peeked = next(self._it, None)
        return self._peeked

    def next(self) -> Token | None:
        t = self.peek()
        self._peeked = None
        return t

    def expect(self, kind: str) -> Token:
        t = self.next()
        if t is None or t.kind != kind:
            where = f"{t.filename}:{t.line}" if t else "<eof>"
            raise SyntaxError(f"{where}: expected {kind}, got {t!r}")
        return t

    def expect_number(self) -> float:
        return float(self.expect("number").value)

    def expect_string(self) -> str:
        return str(self.expect("string").value)


def _parse_param_list(ts: _TokenStream, search_dir: str, config) -> ParamSet:
    """Parse '"type name" value-or-[values]'* until the next directive."""
    ps = ParamSet(search_dir=search_dir, config=config)
    while True:
        t = ts.peek()
        if t is None or t.kind != "string":
            return ps
        decl = t.value.split()
        if len(decl) != 2 or decl[0] not in _PARAM_TYPES:
            # a bare string belonging to the *next* directive — stop
            return ps
        ts.next()
        ptype, name = decl
        values: list = []
        nt = ts.peek()
        if nt is not None and nt.kind == "lbrack":
            ts.next()
            while True:
                vt = ts.peek()
                if vt is None:
                    raise SyntaxError("unterminated [ in parameter list")
                if vt.kind == "rbrack":
                    ts.next()
                    break
                ts.next()
                values.append(vt.value)
        else:
            vt = ts.next()
            if vt is None:
                raise SyntaxError("missing parameter value")
            values.append(vt.value)
        # normalize bools written as bare idents or strings
        if ptype == "bool":
            values = [str(v) for v in values]
        ps.add(ptype, name, values)


def parse_tokens(token_iter, api, search_dir: str):
    """Drive the Api object from a token stream."""
    ts = _TokenStream(token_iter)
    config = api.spectral_config
    while True:
        t = ts.next()
        if t is None:
            return
        if t.kind != "ident":
            raise SyntaxError(
                f"{t.filename}:{t.line}: expected directive, got {t.value!r}"
            )
        # keep the error subsystem's "file(line): " prefix current
        # (reference: current_file/line_num extern in error.cpp:63-66)
        err.set_parse_position(t.filename, t.line)
        name = t.value
        if name in _FLOAT_DIRECTIVES:
            n = _FLOAT_DIRECTIVES[name]
            vals = []
            # floats may be wrapped in brackets (Transform [ ... ])
            if ts.peek() is not None and ts.peek().kind == "lbrack":
                ts.next()
                while ts.peek() is not None and ts.peek().kind == "number":
                    vals.append(ts.expect_number())
                ts.expect("rbrack")
            else:
                for _ in range(n):
                    vals.append(ts.expect_number())
            getattr(api, _camel_to_snake(name))(*vals)
        elif name in _SIMPLE_DIRECTIVES:
            getattr(api, _SIMPLE_DIRECTIVES[name])()
        elif name in _NAMED_PARAM_DIRECTIVES:
            type_name = ts.expect_string()
            ps = _parse_param_list(ts, search_dir, config)
            getattr(api, _NAMED_PARAM_DIRECTIVES[name])(type_name, ps)
        elif name == "Texture":
            tex_name = ts.expect_string()
            tex_type = ts.expect_string()  # "float" | "spectrum" | "color"
            tex_class = ts.expect_string()  # "imagemap", "checkerboard", ...
            ps = _parse_param_list(ts, search_dir, config)
            api.texture(tex_name, tex_type, tex_class, ps)
        elif name == "NamedMaterial":
            api.named_material(ts.expect_string())
        elif name == "ObjectBegin":
            api.object_begin(ts.expect_string())
        elif name == "ObjectInstance":
            api.object_instance(ts.expect_string())
        elif name == "CoordinateSystem":
            api.coordinate_system(ts.expect_string())
        elif name == "CoordSysTransform":
            api.coord_sys_transform(ts.expect_string())
        elif name == "ActiveTransform":
            which = ts.next()
            api.active_transform(str(which.value))
        else:
            raise SyntaxError(f"{t.filename}:{t.line}: unknown directive {name!r}")


def _camel_to_snake(s: str) -> str:
    out = []
    for i, c in enumerate(s):
        if c.isupper() and i > 0:
            out.append("_")
        out.append(c.lower())
    return "".join(out)


def parse_file(path: str, api):
    """ParseFile equivalent (reference: core/parser.cpp)."""
    search_dir = os.path.dirname(os.path.abspath(path))
    api.set_search_directory(search_dir)
    try:
        parse_tokens(tokenize(path), api, search_dir)
    finally:
        err.set_parse_position()  # post-parse messages carry no file(line)


def parse_string(text: str, api, search_dir: str = "."):
    api.set_search_directory(search_dir)
    parse_tokens(tokenize_string(text), api, search_dir)
