from . import cameras, datasets, images, rays  # noqa: F401
