from . import fields, materials, renderer, secondary  # noqa: F401
