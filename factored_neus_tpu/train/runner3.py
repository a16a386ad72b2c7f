"""Stage-3 runner: material + direct illumination recovery.

Behavior parity: ref:mateIllu.py Runner — chains from the newest stage-2
checkpoint (ref:mateIllu.py:97-105,238-245), trains only the material
network, and reproduces the validation surface: decomposition panels,
PSNR-vs-GT tooling, relighting with loaded envmaps, turntable videos, and
envmap EXR export.
"""
from __future__ import annotations

import os
import shutil
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import images as IMG
from ..data import rays as RAYS
from ..data.datasets import SyntheticDataset, make_dataset
from ..models.materials import get_light
from ..ops import sg as SG
from ..parallel import sharding as SH
from ..utils import checkpoints as CK
from ..utils import config as CFG
from ..utils.logging import MetricsWriter, ThroughputMeter, log
from . import stage3
from .common import (BlockStepper, TrainConfig, boundary_metrics,
                     chunked_render, init_all_params, val_chunk_size)
from .runner1 import CKPT_KEYS
from .runner2 import STAGE2_KEYS

STAGE3_KEYS = dict(STAGE2_KEYS, material="mateIllu_network")

_VAL_KEYS = ("rgb", "env_rgb", "indir_rgb", "diffuse_albedo",
             "specular_albedo", "diffuse_rgb", "specular_rgb", "roughness",
             "lvis_mean", "n_out")


class Runner:
    def __init__(self, conf_path: str, mode: str = "train", case: str = "",
                 is_continue: bool = False, type: str = "dtu",
                 use_mesh_sharding: bool = False, seed: int = 0):
        self.conf_path = conf_path
        self.conf = CFG.load(conf_path, case)
        self.base_exp_dir = self.conf["general.base_exp_dir_mateIllu"]
        self.base_exp_dir_lvis = self.conf["general.base_exp_dir_lvis"]
        os.makedirs(self.base_exp_dir, exist_ok=True)
        self.type = type
        self.mode = mode

        self.dataset = make_dataset(type, self.conf["dataset"])
        self.tcfg = TrainConfig.from_conf(self.conf, stage=3)
        from ..data.datasets import LINEAR_SPACE_TYPES
        tonemap = "none" if type in LINEAR_SPACE_TYPES else "srgb"
        self.cfg = CFG.renderer_config(self.conf, "model.lvis_renderer",
                                       tonemap=tonemap)
        self.iter_step = 0

        self.params = init_all_params(jax.random.PRNGKey(seed), self.cfg,
                                      CFG.variance_init_val(self.conf))

        lvis_ckpt = CK.latest_checkpoint(
            self.base_exp_dir_lvis,
            int(self.conf.get("train.lvis.end_iter", 10000)))
        if lvis_ckpt is None:
            raise FileNotFoundError(
                f"no stage-2 checkpoint under {self.base_exp_dir_lvis} "
                "(run lvis first)")
        self.load_checkpoint_lvis(lvis_ckpt)

        self.mesh = SH.make_mesh() if use_mesh_sharding and \
            len(jax.devices()) > 1 else None
        self._opt_init, self._step_fn = stage3.make_train_step(
            self.cfg, self.tcfg, mesh=self.mesh,
            convention=self.dataset.convention,
            mask_ones=self.dataset.mask_ones,
            roi_prob=float(getattr(self.dataset, "sample_roi_prob", 0.0)))
        self.opt_state = self._opt_init(self.params)
        self._render_fn = stage3.make_render_fn(self.cfg, mesh=self.mesh)

        if is_continue:
            latest = CK.latest_checkpoint(self.base_exp_dir, self.tcfg.end_iter)
            if latest is not None:
                self.load_checkpoint(latest)
        if mode.startswith("train"):
            rec = os.path.join(self.base_exp_dir, "recording")
            os.makedirs(rec, exist_ok=True)
            shutil.copyfile(conf_path, os.path.join(rec, "config.conf"))

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

    # -- checkpoints ---------------------------------------------------------

    def load_checkpoint_lvis(self, path: str):
        """ref:mateIllu.py:238-245."""
        loaded = CK.load_checkpoint(path)
        for pk, ck in STAGE2_KEYS.items():
            if ck in loaded:
                self.params[pk] = jax.tree_util.tree_map(jnp.asarray,
                                                         loaded[ck])

    def load_checkpoint(self, path: str):
        loaded = CK.load_checkpoint(path)
        for pk, ck in STAGE3_KEYS.items():
            if ck in loaded:
                self.params[pk] = jax.tree_util.tree_map(jnp.asarray,
                                                         loaded[ck])
        if "optimizer" in loaded:
            self.opt_state = CK.restore_into(self.opt_state,
                                             loaded["optimizer"])
        self.iter_step = int(loaded["iter_step"])

    def save_checkpoint(self):
        groups = {ck: self.params[pk] for pk, ck in STAGE3_KEYS.items()}
        groups["optimizer"] = self.opt_state
        groups["iter_step"] = self.iter_step
        CK.save_checkpoint_async(self.base_exp_dir, self.iter_step, groups)

    # -- training ------------------------------------------------------------

    def train(self):
        writer = MetricsWriter(os.path.join(self.base_exp_dir, "logs"))
        rng = np.random.RandomState(self.iter_step)
        image_perm = rng.permutation(self.dataset.n_images)
        key = jax.random.PRNGKey(self.iter_step + 3)
        self.meter.start()
        # multi-step blocking (train.block_steps): see common.BlockStepper
        def make_multi(k_steps):
            return stage3.make_train_step(
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
                writer.scalars({"Loss/loss": m["rgb_loss"],
                                "Statistics/psnr": m["psnr"],
                                "Perf/rays_per_sec": self.meter.rays_per_sec},
                               self.iter_step)
                log.info("iter %d rgb=%.5f psnr=%.2f rays/s=%.0f",
                         self.iter_step, m["rgb_loss"], m["psnr"],
                         self.meter.rays_per_sec)
            if self.iter_step % self.tcfg.save_freq == 0:
                self.save_checkpoint()
            if self.iter_step % self.tcfg.val_freq == 0:
                if self.type in ("dtu", "sk3d"):
                    self.validate_image()
                else:
                    self.validate_synthetic_img()
            # image-perm rotation handled inside plan_block
        CK.wait_for_async_saves()        # drain the background ckpt writer

    # -- shared chunked render ----------------------------------------------

    def render_decomposition(self, dataset, idx: int, resolution_level: int
                             ) -> Dict[str, np.ndarray]:
        rays_o, rays_d = dataset.gen_rays_at(idx, resolution_level)
        key = jax.random.PRNGKey(self.iter_step)

        def fn(o_c, d_c, i):
            near, far = RAYS.near_far_from_sphere(o_c, d_c)
            return self._render_fn(self.params, o_c, d_c, near, far,
                                   jax.random.fold_in(key, i))

        res, H, W = chunked_render(fn, rays_o, rays_d,
                                   val_chunk_size(self.tcfg, self.mesh),
                                   _VAL_KEYS)
        return {k: v.reshape(H, W, -1) for k, v in res.items()}

    # -- validation panels ---------------------------------------------------

    def validate_image(self, idx: int = -1, resolution_level: int = -1):
        """DTU panels, linear 0-255 (ref:mateIllu.py:588-701)."""
        if idx < 0:
            idx = np.random.randint(self.dataset.n_images)
        if resolution_level < 0:
            resolution_level = self.tcfg.validate_resolution_level
        r = self.render_decomposition(self.dataset, idx, resolution_level)
        s = self.iter_step
        d = self.base_exp_dir
        to255 = lambda x: (x * 255).clip(0, 255)
        IMG.imwrite(os.path.join(d, "rgb", f"rgb_{s}_{idx}.png"),
                    np.concatenate([to255(r["indir_rgb"]),
                                    to255(r["env_rgb"]), to255(r["rgb"]),
                                    self.dataset.image_at(idx, resolution_level)]))
        IMG.imwrite(os.path.join(d, "diffuse", f"d_{s}_{idx}.png"),
                    np.concatenate([to255(r["diffuse_rgb"]),
                                    to255(r["diffuse_albedo"])]))
        IMG.imwrite(os.path.join(d, "specular", f"s_{s}_{idx}.png"),
                    np.concatenate([to255(r["specular_rgb"]),
                                    to255(r["specular_albedo"])]))
        IMG.imwrite(os.path.join(d, "roughness", f"r_{s}_{idx}.png"),
                    to255(r["roughness"]))
        IMG.imwrite(os.path.join(d, "lvis_mean", f"lvis_{s}_{idx}.png"),
                    to255(r["lvis_mean"]))
        IMG.imwrite(os.path.join(d, "indiLgt", f"indiLgt_{s}_{idx}.png"),
                    to255(r["indir_rgb"]))
        IMG.imwrite(os.path.join(d, "rgb", f"rgbPre_{s}_{idx}.png"),
                    to255(r["rgb"]))
        IMG.imwrite(os.path.join(d, "normal", f"n_{s}_{idx}.png"),
                    (r["n_out"] * 128 + 128).clip(0, 255))
        self.export_envmap()

    def validate_synthetic_img(self, idx: int = -1,
                               resolution_level: int = -1):
        """Synthetic panels with gamma tonemap (ref:mateIllu.py:459-585)."""
        if idx < 0:
            idx = np.random.randint(self.dataset.n_images)
        idx %= self.dataset.n_images      # per-case defaults can exceed
        if resolution_level < 0:          # small test scenes
            resolution_level = self.tcfg.validate_resolution_level
        r = self.render_decomposition(self.dataset, idx, resolution_level)
        tm = lambda x: (np.power(np.clip(x, 0, 1), 1 / 2.2) * 255).clip(0, 255)
        s = self.iter_step
        d = self.base_exp_dir
        IMG.imwrite(os.path.join(d, "rgb", f"rgb_{s}_{idx}.png"),
                    np.concatenate([tm(r["indir_rgb"]), tm(r["env_rgb"]),
                                    tm(r["rgb"]),
                                    self.dataset.image_at(idx, resolution_level)]))
        IMG.imwrite(os.path.join(d, "diffuse", f"d_{s}_{idx}.png"),
                    np.concatenate([tm(r["diffuse_rgb"]),
                                    tm(r["diffuse_albedo"])]))
        IMG.imwrite(os.path.join(d, "specular", f"s_{s}_{idx}.png"),
                    np.concatenate([tm(r["specular_rgb"]),
                                    tm(r["specular_albedo"])]))
        IMG.imwrite(os.path.join(d, "roughness", f"r_{s}_{idx}.png"),
                    (r["roughness"] * 255).clip(0, 255))
        IMG.imwrite(os.path.join(d, "lvis_mean", f"lvis_{s}_{idx}.png"),
                    (r["lvis_mean"] * 255).clip(0, 255))
        IMG.imwrite(os.path.join(d, "indi_light", f"indiLgt_{s}_{idx}.png"),
                    tm(r["indir_rgb"]))
        self.export_envmap()

    def export_envmap(self):
        """EXR export of the learned envmap (ref:mateIllu.py:699-701)."""
        import imageio.v2 as imageio
        env = np.asarray(get_light(self.params["material"]))
        out = os.path.join(self.base_exp_dir, "env_light")
        os.makedirs(out, exist_ok=True)
        try:
            imageio.imwrite(os.path.join(out, f"iter_step_{self.iter_step}.exr"),
                            env.astype(np.float32))
        except Exception:
            from ..data.exr import write_exr
            write_exr(os.path.join(out, f"iter_step_{self.iter_step}.exr"),
                      env.astype(np.float32))

    # -- PSNR tooling (ref:mateIllu.py:347-456) -------------------------------

    def cal_synthetic_psnr(self, idx: int = -1, resolution_level: int = 1):
        test_dataset = SyntheticDataset(self.conf["dataset"], split="test")
        if idx < 0:
            idx = np.random.randint(test_dataset.n_images)
        if idx >= test_dataset.n_images:
            # the per-case idx tables (ref:mateIllu.py:16-20) assume the
            # published scenes' 200-image test splits; wrap for smaller ones
            log.warning("test idx %d out of range for %d test images; "
                        "using %d", idx, test_dataset.n_images,
                        idx % test_dataset.n_images)
            idx = idx % test_dataset.n_images
        r = self.render_decomposition(test_dataset, idx, resolution_level)
        gt_albedo = test_dataset.albedo[idx]
        gt_rgb = np.asarray(test_dataset.images[idx])
        gt_rough = test_dataset.rough[idx][..., :1]

        albedo = r["diffuse_albedo"]
        mask = (albedo > 1e-6).astype(np.float64)
        msum = mask.sum()

        def psnr(a, b):
            return 20.0 * np.log10(1.0 / np.sqrt(
                ((a - b) ** 2 * mask).sum() / (msum * 3.0)))

        psnr_albedo = psnr(gt_albedo, albedo)
        psnr_rgb = psnr(gt_rgb, r["rgb"])
        psnr_rough = 20.0 * np.log10(1.0 / np.sqrt(
            ((gt_rough - r["roughness"]) ** 2 * mask[..., :1]).sum()
            / (mask[..., :1].sum() * 3.0)))

        out = os.path.join(self.base_exp_dir, "psnr")
        os.makedirs(out, exist_ok=True)
        tm = lambda x: (np.power(np.clip(x, 0, 1), 1 / 2.2) * 255).clip(0, 255)
        IMG.imwrite(os.path.join(out, f"preRGB_{idx}.png"), tm(r["rgb"]))
        IMG.imwrite(os.path.join(out, f"preAlbedo_{idx}.png"), tm(albedo))
        IMG.imwrite(os.path.join(out, f"gtAlbedo_{idx}.png"), tm(gt_albedo))
        IMG.imwrite(os.path.join(out, f"normal_{idx}.png"),
                    (r["n_out"] * 128 + 128).clip(0, 255))
        IMG.imwrite(os.path.join(out, f"mask_{idx}.png"), mask * 255)
        IMG.imwrite(os.path.join(out, f"r_{self.iter_step}_{idx}.png"),
                    (r["roughness"] * 255).clip(0, 255))
        with open(os.path.join(out, "albedo.txt"), "w") as f:
            f.write(f"psnr_albedo:{psnr_albedo}\npsnr_rgb:{psnr_rgb}\n"
                    f"psnr_rough:{psnr_rough}")
        return psnr_albedo, psnr_rgb, psnr_rough

    def cal_nerfactor_psnr(self, idx: int = -1, resolution_level: int = 1):
        """NeRFactor-style prediction dumps on the train split
        (ref:mateIllu.py:286-344)."""
        if idx < 0:
            idx = np.random.randint(self.dataset.n_images)
        r = self.render_decomposition(self.dataset, idx, resolution_level)
        out = os.path.join(self.base_exp_dir, "psnr")
        os.makedirs(out, exist_ok=True)
        tm = lambda x: (np.power(np.clip(x, 0, 1), 1 / 2.2) * 255).clip(0, 255)
        IMG.imwrite(os.path.join(out, f"preRGB_{idx}.png"), tm(r["rgb"]))
        IMG.imwrite(os.path.join(out, f"normal_{idx}.png"),
                    (r["n_out"] * 128 + 128).clip(0, 255))
        IMG.imwrite(os.path.join(out, f"preAlbedo_{idx}.png"),
                    tm(r["diffuse_albedo"]))
        mask = np.asarray(self.dataset.masks[idx])
        if mask.shape[:2] != (self.dataset.H, self.dataset.W):
            # mask_ones datasets hold a broadcastable [1,1,3] stand-in
            mask = np.broadcast_to(mask,
                                   (self.dataset.H, self.dataset.W, 3))
        IMG.imwrite(os.path.join(out, f"mask_{idx}.png"), mask * 255)
        IMG.imwrite(os.path.join(out, f"r_{idx}.png"),
                    (r["roughness"] * 255).clip(0, 255))

    # -- relighting (ref:mateIllu.py:792-875, inverRender.py:614-625) ---------

    def load_light(self, path: str):
        sgs = np.load(os.path.join(path, "sg_128.npy"))
        self.params["material"]["lgtSGs"] = jnp.asarray(sgs, jnp.float32)
        energy = SG.compute_energy(self.params["material"]["lgtSGs"])
        log.info("loaded envmap energy: %s",
                 np.asarray(jnp.sum(energy, axis=0)))

    def relgt_synthetic_img(self, idx: int = 0, resolution_level: int = 1,
                            envmap_paths=("./envmaps/envmap6",
                                          "./envmaps/envmap12")):
        test_dataset = SyntheticDataset(self.conf["dataset"], split="test")
        out = os.path.join(self.base_exp_dir, "video")
        os.makedirs(out, exist_ok=True)
        saved = self.params["material"]["lgtSGs"]
        for path in envmap_paths:
            self.load_light(path)
            r = self.render_decomposition(test_dataset, idx, resolution_level)
            tm = lambda x: (np.power(np.clip(x, 0, 1), 1 / 2.2) * 255)
            name = os.path.basename(path)
            IMG.imwrite(os.path.join(out, f"reLgtRGB_{name}.png"),
                        tm(r["rgb"]))
        self.params["material"]["lgtSGs"] = saved

    # -- videos (ref:mateIllu.py:704-789,832-945) -----------------------------

    def _write_video(self, path: str, frames, fps: int = 20):
        from ..utils.video import write_video
        frames8 = [np.clip(f * 255, 0, 255).astype(np.uint8) for f in frames]
        write_video(path, frames8, fps=fps)

    def validate_video(self, resolution_level: int = 1):
        lists = {k: [] for k in ("rgb", "specular_rgb", "diffuse_rgb",
                                 "diffuse_albedo", "indir_rgb", "lvis_mean")}
        gt = []
        for i in range(self.dataset.n_images):
            r = self.render_decomposition(self.dataset, i, resolution_level)
            for k in lists:
                lists[k].append(r[k])
            gt.append(np.asarray(self.dataset.images[i]).clip(0, 1))
        # forward + reverse sweep (ref:mateIllu.py:774-780)
        for k in lists:
            lists[k] = lists[k] + lists[k][-2:0:-1]
        gt = gt + gt[-2:0:-1]
        v = os.path.join(self.base_exp_dir, "video")
        self._write_video(os.path.join(v, "cs.mp4"), lists["specular_rgb"], 40)
        self._write_video(os.path.join(v, "cd.mp4"), lists["diffuse_rgb"], 40)
        self._write_video(os.path.join(v, "albedo.mp4"),
                          lists["diffuse_albedo"], 40)
        self._write_video(os.path.join(v, "img_pre.mp4"), lists["rgb"], 40)
        self._write_video(os.path.join(v, "img_gt.mp4"), gt, 40)
        self._write_video(os.path.join(v, "indiLgt.mp4"), lists["indir_rgb"], 40)
        self._write_video(os.path.join(v, "lvisMean.mp4"), lists["lvis_mean"], 40)

    def validate_synthetic_video(self, resolution_level: int = 1):
        test_dataset = SyntheticDataset(self.conf["dataset"], split="test")
        tm = lambda x: np.power(np.clip(x, 0, 1), 1 / 2.2)
        lists = {k: [] for k in ("rgb", "diffuse_albedo", "indir_rgb",
                                 "lvis_mean")}
        gt = []
        for i in range(test_dataset.n_images):
            r = self.render_decomposition(test_dataset, i, resolution_level)
            lists["rgb"].append(tm(r["rgb"]))
            lists["diffuse_albedo"].append(tm(r["diffuse_albedo"]))
            lists["indir_rgb"].append(tm(r["indir_rgb"]))
            lists["lvis_mean"].append(np.clip(r["lvis_mean"], 0, 1))
            gt.append(tm(np.asarray(test_dataset.images[i])))
        v = os.path.join(self.base_exp_dir, "video")
        self._write_video(os.path.join(v, "pre_img.mp4"), lists["rgb"])
        self._write_video(os.path.join(v, "albedo.mp4"),
                          lists["diffuse_albedo"])
        self._write_video(os.path.join(v, "lvis.mp4"), lists["lvis_mean"])
        self._write_video(os.path.join(v, "indiLgt.mp4"), lists["indir_rgb"])
        self._write_video(os.path.join(v, "gt_img.mp4"), gt)

    def relgt_synthetic_video(self, envmap_paths=("./envmaps/envmap6",
                                                  "./envmaps/envmap12"),
                              resolution_level: int = 1):
        test_dataset = SyntheticDataset(self.conf["dataset"], split="test")
        tm = lambda x: np.power(np.clip(x, 0, 1), 1 / 2.2)
        saved = self.params["material"]["lgtSGs"]
        for path in envmap_paths:
            self.load_light(path)
            frames = []
            for i in range(test_dataset.n_images):
                r = self.render_decomposition(test_dataset, i,
                                              resolution_level)
                frames.append(tm(r["rgb"]))
            name = os.path.basename(path)
            self._write_video(os.path.join(self.base_exp_dir, "video",
                                           f"relgt_{name}_img.mp4"), frames)
        self.params["material"]["lgtSGs"] = saved
