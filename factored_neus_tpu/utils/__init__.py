from . import checkpoints, config, hocon, logging, schedule  # noqa: F401
