"""factored_neus_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of Factored-NeuS (CVPR 2025).

Three-stage progressive inverse renderer:

  stage 1: geometry + radiance        (SDF + NeuS volume rendering + surface
                                       reflection-color head + NeRF++ background)
  stage 2: light visibility + indirect illumination distillation
  stage 3: materials + direct illumination (spherical-Gaussian PBR)

Design notes (TPU-first, not a port):
  * All compute paths are pure functions over parameter pytrees, jittable,
    static-shaped (masking instead of data-dependent gathers).
  * Ray batches are the data-parallel axis: sharded over a
    ``jax.sharding.Mesh`` with ``shard_map`` + ``psum`` gradient reduction.
  * Hot MLP evaluation can run through fused Pallas kernels (ops.pallas_mlp).
  * Host-side runtime pieces (marching cubes, KD-tree chamfer) are native C++
    (factored_neus_tpu/native), loaded via ctypes.

Reference behavior citations point into the upstream PyTorch research code
(`/root/reference`, yiqun-wang/Factored-NeuS) as `ref:<file>:<lines>`.
"""

__version__ = "0.1.0"
