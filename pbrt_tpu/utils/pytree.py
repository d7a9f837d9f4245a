"""Pytree dataclass helper.

All SoA state containers in the framework (rays, path state, scene arrays,
film state) are frozen dataclasses registered as JAX pytrees so they can flow
through jit/vmap/shard_map/lax.while_loop unchanged. Fields marked with
``static_field()`` are hashable aux data (shapes, configs) rather than leaves.
"""

from __future__ import annotations

import dataclasses

import jax


def static_field(**kwargs):
    """A dataclass field treated as static (non-traced) pytree aux data."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls=None, **kwargs):
    """Decorator: frozen dataclass registered as a JAX pytree node."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **kwargs)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)
