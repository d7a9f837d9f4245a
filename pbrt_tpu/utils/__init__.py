from pbrt_tpu.utils.pytree import pytree_dataclass, static_field  # noqa: F401
