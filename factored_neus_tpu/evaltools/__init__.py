from . import clean_mesh, dtu, epfl, pointcloud, shiny  # noqa: F401
