from . import extract, marching_cubes, ply  # noqa: F401
