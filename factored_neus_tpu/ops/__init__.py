from . import chunk, embedder, math, mlp, pallas_sdf, sampling, sg  # noqa: F401
