"""Shared training plumbing: parameter initialization for the full model
family, train-config schema, optimizer construction.

Parameter groups per stage (ref:exp_runner.py:89-96, lvis.py:89-92,
mateIllu.py:91-95):
  stage 1 trains nerf + sdf + variance + color + ref_color
  stage 2 trains lvis + indirect           (stage-1 groups frozen)
  stage 3 trains material                  (stages 1-2 frozen)
Freezing is implemented with optax.multi_transform-style masking: frozen
groups get zero updates, so one pytree carries all networks through all
stages (simplifying the reference's cross-stage checkpoint chaining).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import fields as F
from ..models.materials import envmap_material_init
from ..models.renderer import RendererConfig
from ..utils import schedule
from ..utils.hocon import ConfigTree

STAGE_TRAINABLE = {
    1: ("nerf", "sdf", "variance", "color", "ref_color"),
    2: ("lvis", "indirect"),
    3: ("material",),
}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-4
    learning_rate_alpha: float = 0.05
    end_iter: int = 300000
    batch_size: int = 512
    validate_resolution_level: int = 4
    # NOTE: the conf path (from_conf) defaults warm_up_end to 0.0, matching
    # the reference's conf.get_float('train.warm_up_end', default=0.0)
    # (ref:exp_runner.py:69); 5000.0 here is the library-API default
    # mirroring confs/wmask.conf's explicit value
    warm_up_end: float = 5000.0
    anneal_end: float = 0.0
    use_white_bkgd: bool = False
    save_freq: int = 2500
    val_freq: int = 2500
    val_mesh_freq: int = 5000
    report_freq: int = 100
    igr_weight: float = 0.1
    mask_weight: float = 0.0
    surface_weight: float = 0.1
    # validation/inference ray-chunk size. Chunking is math-invariant; the
    # forward-only render runs ~25% faster at 2048 than at the training
    # batch of 512 (BENCHMARKS.md), so validation panels/videos use this
    # larger chunk (>= batch_size, multiple of it for shard divisibility)
    val_chunk: int = 2048
    # stage-1 multi-step blocking: >1 compiles a lax.scan of this many
    # optimizer steps per device program (same trajectory as single steps,
    # ~+2% throughput by amortizing per-program dispatch; BENCHMARKS.md
    # round-3 ledger). conf key: train.block_steps — an extension over the
    # reference schema, defaults off.
    block_steps: int = 1

    @classmethod
    def from_conf(cls, c: ConfigTree, stage: int = 1,
                  surface_weight: float = 0.1) -> "TrainConfig":
        t = c.get("train", ConfigTree())
        base = dict(
            learning_rate=float(t.get("learning_rate", 5e-4)),
            learning_rate_alpha=float(t.get("learning_rate_alpha", 0.05)),
            end_iter=int(t.get("end_iter", 300000)),
            batch_size=int(t.get("batch_size", 512)),
            validate_resolution_level=int(t.get("validate_resolution_level", 4)),
            val_chunk=int(t.get("val_chunk", 2048)),
            block_steps=int(t.get("block_steps", 1)),
            warm_up_end=float(t.get("warm_up_end", 0.0)),
            anneal_end=float(t.get("anneal_end", 0.0)),
            use_white_bkgd=bool(t.get("use_white_bkgd", False)),
            save_freq=int(t.get("save_freq", 2500)),
            val_freq=int(t.get("val_freq", 2500)),
            val_mesh_freq=int(t.get("val_mesh_freq", 5000)),
            report_freq=int(t.get("report_freq", 100)),
            igr_weight=float(t.get("igr_weight", 0.1)),
            mask_weight=float(t.get("mask_weight", 0.0)),
            surface_weight=surface_weight,
        )
        if stage == 2:                      # ref:lvis.py:56-67
            lv = t.get("lvis", ConfigTree())
            base.update(end_iter=int(lv.get("end_iter", 10000)),
                        batch_size=int(lv.get("batch_size", 512)),
                        warm_up_end=float(lv.get("warm_up_end", 0.0)))
        elif stage == 3:                    # ref:mateIllu.py:56-68 — batch and
            # end_iter come from the metaIllu block but warm_up_end stays the
            # GLOBAL train.warm_up_end
            mi = t.get("metaIllu", t.get("mateIllu", ConfigTree()))
            base.update(end_iter=int(mi.get("end_iter", 40000)),
                        batch_size=int(mi.get("batch_size", 512)))
        return cls(**base)


def multi_step_wrapper(single_step, k_steps: int):
    """Wrap a single-step fn (params, opt_state, data, img_idx, key, step)
    into a k-step lax.scan program taking (params, opt_state, data,
    img_idxs [k], base_key, step0).  Sub-step i folds the base key by the
    ABSOLUTE step (step0 + i), so the block follows the exact trajectory of
    k single steps whose caller folds by absolute step; metrics leaves gain
    a leading [k] axis.  Shared by the three stage factories."""
    def step_fn(params, opt_state, data, img_idxs, key, step0):
        def body(carry, x):
            p, o = carry
            i, idx = x
            p, o, m = single_step(p, o, data, idx,
                                  jax.random.fold_in(key, step0 + i),
                                  step0 + i)
            return (p, o), m
        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state),
            (jnp.arange(k_steps), img_idxs))
        return params, opt_state, metrics
    return step_fn


def plan_block(iter_step: int, end_iter: int, block: int, freqs,
               image_perm, rng, n_images: int):
    """Host-side block planning: (K, idxs, image_perm').

    K is the largest block <= `block` that does not cross the end of
    training or any multiple of the event frequencies (report/save/
    validation), so every observable side effect fires at the exact same
    iterations as single stepping.  idxs are the K image indices, rotating
    the permutation at epoch boundaries with the caller's rng — the same
    stream the single-step loop uses (ref:exp_runner.py:220-221)."""
    fs = [f for f in freqs if f and f > 0]
    K = min([max(1, block), end_iter - iter_step]
            + [f - iter_step % f for f in fs])
    idxs, t, perm = [], iter_step, image_perm
    for _ in range(K):
        idxs.append(int(perm[t % len(perm)]))
        t += 1
        if t % len(perm) == 0:
            perm = rng.permutation(n_images)
    return K, idxs, perm


class BlockStepper:
    """Multi-step-blocking driver shared by the three stage runners.

    Owns the per-K cache of multi-step train programs and the plan_block
    bookkeeping; ``advance`` runs one block (one device program — a K-step
    lax.scan, or the plain single-step fn at boundaries) and returns the
    new train state.  The parameter trajectory and every PRNG draw are
    exactly identical to single stepping (keys fold by absolute step).
    """

    def __init__(self, tcfg: TrainConfig, n_images: int, single_fn,
                 make_multi, key, freqs):
        self.tcfg = tcfg
        self.n_images = n_images
        self.single_fn = single_fn
        self.make_multi = make_multi          # k_steps -> step fn
        self.key = key
        self.freqs = freqs
        self.block = max(1, int(tcfg.block_steps))
        self._multi_fns: Dict[int, Any] = {}
        self._rng = None
        self._perm = None

    def start(self, rng, image_perm):
        self._rng, self._perm = rng, image_perm

    def advance(self, iter_step: int, params, opt_state, data):
        """-> (params, opt_state, metrics, K).  Blocked metrics carry a
        leading [K] axis; see boundary_metrics."""
        K, idxs, self._perm = plan_block(
            iter_step, self.tcfg.end_iter, self.block, self.freqs,
            self._perm, self._rng, self.n_images)
        if K == 1:
            out = self.single_fn(
                params, opt_state, data, jnp.asarray(idxs[0]),
                jax.random.fold_in(self.key, iter_step),
                jnp.asarray(iter_step))
        else:
            if K not in self._multi_fns:
                self._multi_fns[K] = self.make_multi(K)
            out = self._multi_fns[K](
                params, opt_state, data, jnp.asarray(idxs), self.key,
                jnp.asarray(iter_step))
        params, opt_state, metrics = out
        return params, opt_state, metrics, K


def boundary_metrics(metrics) -> Dict[str, float]:
    """Scalar metrics at the block's boundary step: blocked programs stack
    metrics along a leading [K] axis — report the last sub-step's values
    (the one landing on the report frequency), matching single stepping."""
    import numpy as np
    return {k: float(np.ravel(v)[-1]) for k, v in metrics.items()}


def val_chunk_size(tcfg: TrainConfig, mesh=None) -> int:
    """Validation/inference ray-chunk size: at least batch_size, and when a
    device mesh is active, rounded UP to a multiple of the device count —
    shard_map requires the ray axis to divide evenly, so a conf'd val_chunk
    like 1000 on 8 chips must widen to 1008 rather than fail at the first
    mid-training validation."""
    B = max(tcfg.val_chunk, tcfg.batch_size)
    if mesh is not None:
        n = int(mesh.devices.size)
        B = ((B + n - 1) // n) * n
    return B


def fetch_concat(chunks, n: int):
    """Fetch-and-concatenate a list of per-chunk DEVICE arrays, trimmed to
    the first n rows.  The contract with the render loops: dispatch every
    chunk first, append the device arrays, and fetch only here — the queued
    renders then overlap the device->host transfers (validation is
    transfer-bound on slow host links; BENCHMARKS.md round-3)."""
    import numpy as np
    return np.concatenate([np.asarray(c) for c in chunks])[:n]


def chunked_render(fn, rays_o, rays_d, chunk: int, keys, post=None):
    """Shared pad-to-chunk / dispatch-all / deferred-fetch ray driver for
    full-image renders (runner1/2/3 validation + Pipeline inference).

    fn(o_c, d_c, i) -> dict of per-ray DEVICE arrays; i is the chunk's
    start ray index (for per-chunk RNG folding).  keys: entries to
    collect.  post (optional): out-dict -> dict of derived DEVICE arrays
    per chunk (e.g. the on-device normal reduction).  Returns
    (dict of [n, ...] numpy arrays, H, W)."""
    import numpy as np
    H, W = rays_o.shape[:2]
    ro = np.asarray(rays_o).reshape(-1, 3)
    rd = np.asarray(rays_d).reshape(-1, 3)
    n = len(ro)
    pad = (-n) % chunk
    if pad:
        ro = np.concatenate([ro, np.repeat(ro[-1:], pad, 0)])
        rd = np.concatenate([rd, np.repeat(rd[-1:], pad, 0)])
    acc = {k: [] for k in keys}
    derived = {}
    for i in range(0, len(ro), chunk):
        out = fn(jnp.asarray(ro[i:i + chunk]), jnp.asarray(rd[i:i + chunk]),
                 i)
        for k in keys:              # keep device arrays; fetch after the
            acc[k].append(out[k])   # loop so transfers overlap compute
        if post is not None:
            for k, v in post(out).items():
                derived.setdefault(k, []).append(v)
    res = {k: fetch_concat(v, n) for k, v in acc.items()}
    for k, v in derived.items():
        res[k] = fetch_concat(v, n)
    return res, H, W


def init_all_params(key, cfg: RendererConfig,
                    variance_init_val: float = 0.3) -> Dict[str, Any]:
    """One pytree with every network the three stages need."""
    ks = jax.random.split(key, 8)
    return {
        "nerf": F.nerf_init(ks[0], cfg.nerf),
        "sdf": F.sdf_init(ks[1], cfg.sdf),
        "variance": F.variance_init(variance_init_val),
        "color": F.rendering_init(ks[2], cfg.rendering),
        "ref_color": F.refcolor_init(ks[3], cfg.refcolor),
        "lvis": F.lvis_init(ks[4], cfg.lvis),
        "indirect": F.indirect_light_init(ks[5], cfg.indirect),
        "material": envmap_material_init(ks[6], cfg.material),
    }


def make_optimizer(tcfg: TrainConfig, stage: int) -> optax.GradientTransformation:
    """Adam with the reference's warmup+cosine schedule, masked to the
    stage's trainable groups."""
    lr_fn = lambda count: schedule.learning_rate(
        count, tcfg.learning_rate, tcfg.warm_up_end, tcfg.end_iter,
        tcfg.learning_rate_alpha)
    adam = optax.adam(learning_rate=lr_fn)
    trainable = set(STAGE_TRAINABLE[stage])

    def label_fn(params):
        return {k: ("train" if k in trainable else "freeze")
                for k in params.keys()}

    return optax.multi_transform(
        {"train": adam, "freeze": optax.set_to_zero()}, label_fn)


def adam_with_schedule(tcfg: TrainConfig) -> optax.GradientTransformation:
    lr_fn = lambda count: schedule.learning_rate(
        count, tcfg.learning_rate, tcfg.warm_up_end, tcfg.end_iter,
        tcfg.learning_rate_alpha)
    return optax.adam(learning_rate=lr_fn)


def psnr_from_mse(mse):
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
