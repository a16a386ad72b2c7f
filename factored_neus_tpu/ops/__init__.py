from . import embedder, math, mlp, sampling, sg  # noqa: F401
