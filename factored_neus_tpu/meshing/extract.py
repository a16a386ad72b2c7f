"""SDF grid evaluation on device + iso-surface extraction on host.

Behavior parity: ref:models/renderer.py:14-40 (extract_fields /
extract_geometry) and the world-space rescale at ref:exp_runner.py:526-527.

TPU-first: the reference walks a triple-nested python loop of 64^3 blocks
with per-block host sync (ref:renderer.py:22-28).  Here one jitted function
evaluates a [block, N^2, chunk] slab per call under lax.map, so a 512^3 fill
is a handful of device dispatches with all 134M SDF evaluations batched onto
the MXU; marching tetrahedra then runs in native C++ on the host.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..native import marching_cubes as _mc_native

# lax.map chunk for the grid-fill SDF query: small chunks pipeline the
# while-loop body's DMA/compute overlap; 8k-32k measured equal, larger
# chunks degrade (97 -> 162 -> 184 ms/slab at 32k/128k/512k on v5e)
GRID_QUERY_CHUNK = 32768


def make_sdf_grid_query(sdf_params, sdf_cfg,
                        chunk: int = GRID_QUERY_CHUNK) -> Callable:
    """-sdf evaluator for extract_fields / extract_geometry.

    Uses the value-only narrowed XLA sweep (fields.sdf_value_sweep),
    lax.map-chunked — measured 2.9x FASTER than the fused Pallas forward
    on the standalone 512^3 fill (97 vs 279 ms/slab, v5e; BENCHMARKS.md
    round-3 ledger): with the last layer narrowed to the sdf column, XLA
    overlaps VPU PE/softplus work with MXU matmuls across chunk iterations,
    which the kernel's serialized in-VMEM layer chain cannot.  Works on any
    backend (no TPU gate needed).  Negation follows the reference's -sdf
    grid convention (ref:renderer.py:729-734)."""
    from ..models import fields as F
    from ..ops.chunk import chunked_apply

    def query(p):
        return -chunked_apply(
            lambda q: F.sdf_value_sweep(sdf_params, sdf_cfg, q), p, chunk)

    return query


def extract_fields(bound_min, bound_max, resolution: int, query_fn,
                   slab: int = 32, mesh=None,
                   transfer_dtype=jnp.float32) -> np.ndarray:
    """Dense [R,R,R] field grid (numpy, f32).

    query_fn: pts [N,3] -> values [N] (jittable).
    Evaluates `slab` x-planes per device call (R^2*slab points each), keeping
    peak activation memory bounded while saturating the chip.

    mesh: optional jax.sharding.Mesh — shards each slab's x-planes across
    the devices with shard_map (the grid fill is embarrassingly parallel:
    a 512^3 fill is 134M independent SDF evaluations, so an 8-chip mesh
    fills 64 planes per dispatch at the single-chip per-plane cost).
    query_fn's captured parameters are closure constants, replicated onto
    every device by shard_map.

    transfer_dtype: the device->host wire dtype; f32 (exact) by default
    for this generic utility. The SDF mesh path (extract_geometry) passes
    float16: the 512^3 grid is 512 MB at f32 and the fill is
    transfer-bound on slow host links (tunneled v5e: ~4.2 s/33 MB slab vs
    ~0.1 s compute); f16 halves the bytes, and since marching-tet
    vertices interpolate t = s0/(s0-s1), an f16 round (rel. error 2^-11)
    shifts vertices by ~1e-4 of a cell — orders below the chamfer scale
    (equivalence-tested, and SDF grids sit comfortably inside f16 range).
    A bounded number of slabs is in flight at once, so transfers overlap
    compute without accumulating the whole grid in device memory.
    """
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = jnp.linspace(bound_min[1], bound_max[1], resolution)
    zs = jnp.linspace(bound_min[2], bound_max[2], resolution)

    def eval_slab_local(x_vals):
        xx, yy, zz = jnp.meshgrid(x_vals, ys, zs, indexing="ij")
        pts = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
        vals = query_fn(pts).reshape(x_vals.shape[0], resolution, resolution)
        return vals.astype(transfer_dtype)

    if mesh is not None:
        if len(mesh.axis_names) != 1:
            raise ValueError("extract_fields shards x-planes over a 1-D "
                             f"mesh; got axes {mesh.axis_names}")
        n_dev = int(np.prod(list(mesh.shape.values())))
        if slab % n_dev:  # static per-device plane count
            slab = max(n_dev, slab - slab % n_dev)
        spec = jax.sharding.PartitionSpec(mesh.axis_names[0])
        eval_slab = jax.jit(jax.shard_map(
            eval_slab_local, mesh=mesh, in_specs=spec, out_specs=spec,
            check_vma=False))
    else:
        eval_slab = jax.jit(eval_slab_local)

    out = np.empty((resolution,) * 3, np.float32)
    pending = []      # small dispatch-ahead window: transfers overlap the
    MAX_IN_FLIGHT = 4  # still-running compute without holding the whole
                       # grid in device memory (1024^3 at f32 would be 4 GB)

    def drain_one():
        start, end, dev_vals = pending.pop(0)
        out[start:end] = np.asarray(dev_vals, np.float32)[: end - start]

    for start in range(0, resolution, slab):
        end = min(start + slab, resolution)
        x_block = jnp.asarray(xs[start:end])
        if end - start < slab:  # pad to keep one compiled shape
            pad = slab - (end - start)
            x_block = jnp.concatenate([x_block, jnp.full((pad,), xs[-1])])
        pending.append((start, end, eval_slab(x_block)))
        if len(pending) >= MAX_IN_FLIGHT:
            drain_one()
    while pending:
        drain_one()
    return out


def extract_geometry(bound_min, bound_max, resolution: int, threshold: float,
                     query_fn, slab: int = 32, mesh=None,
                     transfer_dtype=jnp.float16
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(vertices [V,3] world coords, triangles [T,3]).

    query_fn follows the reference's convention of returning -sdf
    (ref:renderer.py:729-734), so the surface is at threshold with outward
    orientation.  transfer_dtype defaults to float16 here (the SDF mesh
    path — bounded values, transfer-bound fills; see extract_fields);
    pass jnp.float32 for a bit-exact grid."""
    u = extract_fields(bound_min, bound_max, resolution, query_fn, slab=slab,
                       mesh=mesh, transfer_dtype=transfer_dtype)
    if transfer_dtype != jnp.float32 and not np.isfinite(u).all():
        # A query exceeding the wire dtype's range (f16 max 65504) overflows
        # to inf, and marching cubes would interpolate NaN vertices
        # (t = s0/(s0-s1)) — a silently corrupt mesh. SDF grids are bounded
        # so this is rare; refill the whole grid at float32 and proceed.
        import logging
        logging.getLogger("factored_neus_tpu").warning(
            "grid contains non-finite values after %s wire conversion — "
            "refilling at float32 (pass transfer_dtype=jnp.float32 to skip "
            "the f16 attempt for such fields)",
            np.dtype(transfer_dtype).name)
        u = extract_fields(bound_min, bound_max, resolution, query_fn,
                           slab=slab, mesh=mesh,
                           transfer_dtype=jnp.float32)
    verts, tris = _mc_native(u, float(threshold))
    b_min = np.asarray(bound_min, np.float32)
    b_max = np.asarray(bound_max, np.float32)
    verts = verts / (resolution - 1.0) * (b_max - b_min)[None] + b_min[None]
    return verts, tris
