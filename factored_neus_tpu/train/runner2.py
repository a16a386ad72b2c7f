"""Stage-2 runner: light-visibility + indirect-illumination distillation.

Behavior parity: ref:lvis.py Runner — loads the newest stage-1 geometry
checkpoint (ref:lvis.py:94-102), trains only lvis + indirect, saves
checkpoints with the lvis_network/indiLgt_network groups added
(ref:lvis.py:255-269), and writes lvis / trace_radiance validation panels
(ref:lvis.py:347-411).
"""
from __future__ import annotations

import os
import shutil
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import images as IMG
from ..data import rays as RAYS
from ..data.datasets import make_dataset
from ..parallel import sharding as SH
from ..utils import checkpoints as CK
from ..utils import config as CFG
from ..utils.logging import MetricsWriter, ThroughputMeter, log
from . import stage2
from .common import (BlockStepper, TrainConfig, boundary_metrics,
                     chunked_render, init_all_params, val_chunk_size)
from .runner1 import CKPT_KEYS

STAGE2_KEYS = dict(CKPT_KEYS, lvis="lvis_network", indirect="indiLgt_network")


class Runner:
    def __init__(self, conf_path: str, mode: str = "train", case: str = "",
                 is_continue: bool = False, type: str = "dtu",
                 use_mesh_sharding: bool = False, seed: int = 0):
        self.conf_path = conf_path
        self.conf = CFG.load(conf_path, case)
        self.base_exp_dir = self.conf["general.base_exp_dir_lvis"]
        self.base_exp_dir_geometry = self.conf["general.base_exp_dir_geo"]
        os.makedirs(self.base_exp_dir, exist_ok=True)
        self.type = type
        self.mode = mode

        self.dataset = make_dataset(type, self.conf["dataset"])
        self.tcfg = TrainConfig.from_conf(self.conf, stage=2)
        self.cfg = CFG.renderer_config(self.conf, "model.lvis_renderer")
        self.iter_step = 0

        self.params = init_all_params(jax.random.PRNGKey(seed), self.cfg,
                                      CFG.variance_init_val(self.conf))

        # stage chaining: newest geometry checkpoint is required
        geo = CK.latest_checkpoint(self.base_exp_dir_geometry,
                                   int(self.conf.get("train.end_iter", 300000)))
        if geo is None:
            raise FileNotFoundError(
                f"no stage-1 checkpoint under {self.base_exp_dir_geometry} "
                "(run exp_runner first)")
        self.load_checkpoint_geometry(geo)

        self.mesh = SH.make_mesh() if use_mesh_sharding and \
            len(jax.devices()) > 1 else None
        self._opt_init, self._step_fn = stage2.make_train_step(
            self.cfg, self.tcfg, mesh=self.mesh,
            convention=self.dataset.convention,
            mask_ones=self.dataset.mask_ones,
            roi_prob=float(getattr(self.dataset, "sample_roi_prob", 0.0)))
        self.opt_state = self._opt_init(self.params)
        self._render_fn = stage2.make_render_fn(self.cfg, mesh=self.mesh)

        if is_continue:
            latest = CK.latest_checkpoint(self.base_exp_dir, self.tcfg.end_iter)
            if latest is not None:
                self.load_checkpoint(latest)

        if mode.startswith("train"):
            self.file_backup()
        self._data = {
            "images": self.dataset.images, "masks": self.dataset.masks,
            "intr_inv": self.dataset.intrinsics_all_inv,
            "poses": self.dataset.pose_all,
            **({"roi_boxes": jnp.asarray(np.stack(self.dataset.roi_boxes),
                                         jnp.int32)}
               if getattr(self.dataset, "roi_boxes", None) is not None
               and self.dataset.sample_roi_prob > 0.0 else {}),
        }
        self.meter = ThroughputMeter()

    def load_checkpoint_geometry(self, path: str):
        """ref:lvis.py:231-237 — pull frozen stage-1 weights."""
        loaded = CK.load_checkpoint(path)
        for pk, ck in CKPT_KEYS.items():
            if ck in loaded:
                self.params[pk] = jax.tree_util.tree_map(jnp.asarray,
                                                         loaded[ck])

    def load_checkpoint(self, path: str):
        loaded = CK.load_checkpoint(path)
        for pk, ck in STAGE2_KEYS.items():
            if ck in loaded:
                self.params[pk] = jax.tree_util.tree_map(jnp.asarray,
                                                         loaded[ck])
        if "optimizer" in loaded:
            self.opt_state = CK.restore_into(self.opt_state,
                                             loaded["optimizer"])
        self.iter_step = int(loaded["iter_step"])

    def save_checkpoint(self):
        groups = {ck: self.params[pk] for pk, ck in STAGE2_KEYS.items()}
        groups["mateIllu_network"] = self.params["material"]
        groups["optimizer"] = self.opt_state
        groups["iter_step"] = self.iter_step
        CK.save_checkpoint_async(self.base_exp_dir, self.iter_step, groups)

    def file_backup(self):
        rec = os.path.join(self.base_exp_dir, "recording")
        os.makedirs(rec, exist_ok=True)
        shutil.copyfile(self.conf_path, os.path.join(rec, "config.conf"))

    def train(self):
        writer = MetricsWriter(os.path.join(self.base_exp_dir, "logs"))
        rng = np.random.RandomState(self.iter_step)
        image_perm = rng.permutation(self.dataset.n_images)
        key = jax.random.PRNGKey(self.iter_step + 2)
        self.meter.start()
        # multi-step blocking (train.block_steps): see common.BlockStepper
        def make_multi(k_steps):
            return stage2.make_train_step(
                self.cfg, self.tcfg, mesh=self.mesh,
                convention=self.dataset.convention,
                mask_ones=self.dataset.mask_ones,
                roi_prob=float(getattr(self.dataset,
                                       "sample_roi_prob", 0.0)),
                k_steps=k_steps)[1]

        stepper = BlockStepper(
            self.tcfg, self.dataset.n_images, self._step_fn, make_multi,
            key, freqs=(self.tcfg.report_freq, self.tcfg.save_freq,
                        self.tcfg.val_freq))
        stepper.start(rng, image_perm)
        while self.iter_step < self.tcfg.end_iter:
            self.params, self.opt_state, metrics, K = stepper.advance(
                self.iter_step, self.params, self.opt_state, self._data)
            self.iter_step += K
            self.meter.step(self.tcfg.batch_size * K)
            if self.iter_step % self.tcfg.report_freq == 0:
                m = boundary_metrics(metrics)
                writer.scalars({"Loss/loss": m["lvis_loss"],
                                "Loss/trace_radiance": m["trace_radiance_loss"],
                                "Perf/rays_per_sec": self.meter.rays_per_sec},
                               self.iter_step)
                log.info("iter %d lvis=%.5f trace=%.5f rays/s=%.0f",
                         self.iter_step, m["lvis_loss"],
                         m["trace_radiance_loss"], self.meter.rays_per_sec)
            if self.iter_step % self.tcfg.save_freq == 0:
                self.save_checkpoint()
            if self.iter_step % self.tcfg.val_freq == 0:
                self.validate_image()
            # image-perm rotation handled inside plan_block
        CK.wait_for_async_saves()        # drain the background ckpt writer

    # -- validation (ref:lvis.py:347-411) ------------------------------------

    def _render_panels(self, idx: int, resolution_level: int):
        rays_o, rays_d = self.dataset.gen_rays_at(idx, resolution_level)
        key = jax.random.PRNGKey(self.iter_step)

        def fn(o_c, d_c, i):
            near, far = RAYS.near_far_from_sphere(o_c, d_c)
            return self._render_fn(self.params, o_c, d_c, near, far,
                                   jax.random.fold_in(key, i))

        res, H, W = chunked_render(
            fn, rays_o, rays_d, val_chunk_size(self.tcfg, self.mesh),
            ("gt_lvis", "pre_lvis", "gt_trace_radiance",
             "pre_trace_radiance"))
        return res, H, W

    def validate_image(self, idx: int = -1, resolution_level: int = -1):
        if idx < 0:
            idx = np.random.randint(self.dataset.n_images)
        if resolution_level < 0:
            resolution_level = self.tcfg.validate_resolution_level
        res, H, W = self._render_panels(idx, resolution_level)
        nsamp = res["gt_lvis"].shape[1]
        gt_lvis = res["gt_lvis"].reshape(H, W, nsamp).mean(-1, keepdims=True)
        pre_lvis = res["pre_lvis"].reshape(H, W, nsamp).mean(-1, keepdims=True)
        gt_tr = res["gt_trace_radiance"].reshape(H, W, nsamp, 3).mean(-2)
        pre_tr = res["pre_trace_radiance"].reshape(H, W, nsamp, 3).mean(-2)
        if self.type in ("dtu", "sk3d"):
            IMG.imwrite(os.path.join(self.base_exp_dir, "trace_radiance",
                                     f"trace_radiance{self.iter_step}_{idx}.png"),
                        np.concatenate([pre_tr, gt_tr]) * 255)
        else:
            tonemap = lambda x: np.power(np.clip(x, 0, 1), 1 / 2.2)
            IMG.imwrite(os.path.join(
                self.base_exp_dir, "trace_radiance", str(self.iter_step),
                f"trace_radiance_mean_{self.iter_step}_{idx}.png"),
                np.concatenate([tonemap(pre_tr), tonemap(gt_tr)]) * 255)
        IMG.imwrite(os.path.join(self.base_exp_dir, "lvis",
                                 f"lvis_{self.iter_step}_{idx}.png"),
                    np.concatenate([pre_lvis, gt_lvis]) * 255)

    validate_synthetic_img = validate_image
