"""Stage-1 runner: experiment orchestration for geometry + radiance training.

Behavior parity: ref:exp_runner.py Runner (modes train / validate_mesh /
validate_mesh_shiny / mesh_dtu_shpere2world / validate_image /
interpolate_i_j; checkpoint layout; validation artifact directories;
recording snapshot).  The training loop itself is one jitted device program
per step (see train.stage1).
"""
from __future__ import annotations

import logging
import os
import shutil
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import rays as RAYS
from ..data.datasets import make_dataset
from ..meshing import extract as MEXT
from ..meshing.ply import write_ply
from ..models import fields as F
from ..parallel import sharding as SH
from ..utils import checkpoints as CK
from ..utils import config as CFG
from ..utils.logging import MetricsWriter, ThroughputMeter, log
from . import stage1
from .common import (BlockStepper, TrainConfig, boundary_metrics,
                     chunked_render, init_all_params, val_chunk_size)

# checkpoint group names, matching ref:exp_runner.py:266-278
CKPT_KEYS = {
    "nerf": "nerf",
    "sdf": "sdf_network_fine",
    "variance": "variance_network_fine",
    "color": "color_network_fine",
    "ref_color": "refColor_network",
}


@jax.jit
def _normal_map_device(gradients, weights, inside_sphere):
    """Per-ray normal map from per-sample SDF gradients, reduced on device
    (validation is transfer-bound on slow host links; ship [B,3], not
    [B,n,3]). Same formula as ref:exp_runner.py:325-328."""
    n = gradients.shape[1]
    return (gradients * weights[:, :n, None]
            * inside_sphere[..., None]).sum(1)


class Runner:
    def __init__(self, conf_path: str, mode: str = "train", case: str = "",
                 is_continue: bool = False, type: str = "dtu",
                 surface_weight: float = 0.1, use_mesh_sharding: bool = False,
                 seed: int = 0):
        self.conf_path = conf_path
        self.conf = CFG.load(conf_path, case)
        self.base_exp_dir = self.conf["general.base_exp_dir_geo"]
        os.makedirs(self.base_exp_dir, exist_ok=True)
        self.type = type
        self.mode = mode

        self.dataset = make_dataset(type, self.conf["dataset"])
        self.tcfg = TrainConfig.from_conf(self.conf, stage=1,
                                          surface_weight=surface_weight)
        self.cfg = CFG.renderer_config(self.conf)
        self.iter_step = 0

        key = jax.random.PRNGKey(seed)
        self.params = init_all_params(key, self.cfg,
                                      CFG.variance_init_val(self.conf))
        self.mesh = SH.make_mesh() if use_mesh_sharding and \
            len(jax.devices()) > 1 else None
        self._opt_init, self._step_fn = stage1.make_train_step(
            self.cfg, self.tcfg, mesh=self.mesh,
            convention=self.dataset.convention,
            mask_ones=self.dataset.mask_ones,
            roi_prob=float(getattr(self.dataset, "sample_roi_prob", 0.0)))
        self.opt_state = self._opt_init(self.params)
        self._render_fn = stage1.make_render_fn(self.cfg, self.tcfg,
                                                 mesh=self.mesh)

        if is_continue:
            latest = CK.latest_checkpoint(self.base_exp_dir,
                                          self.tcfg.end_iter)
            if latest is not None:
                log.info("resuming from %s", latest)
                self.load_checkpoint(latest)

        if mode.startswith("train"):
            self.file_backup()

        self._data = self._device_data()
        self.writer: Optional[MetricsWriter] = None
        self.meter = ThroughputMeter()

    # -- data ---------------------------------------------------------------

    def _device_data(self):
        d = {
            "images": self.dataset.images,
            "masks": self.dataset.masks,
            "intr_inv": self.dataset.intrinsics_all_inv,
            "poses": self.dataset.pose_all,
            **({"roi_boxes": jnp.asarray(np.stack(self.dataset.roi_boxes),
                                         jnp.int32)}
               if getattr(self.dataset, "roi_boxes", None) is not None
               and self.dataset.sample_roi_prob > 0.0 else {}),
        }
        return d

    # -- training -----------------------------------------------------------

    def train(self):
        self.writer = MetricsWriter(os.path.join(self.base_exp_dir, "logs"))
        rng = np.random.RandomState(self.iter_step)
        image_perm = rng.permutation(self.dataset.n_images)
        key = jax.random.PRNGKey(self.iter_step + 1)
        self.meter.start()

        # multi-step blocking (train.block_steps > 1): see common.BlockStepper
        def make_multi(k_steps):
            return stage1.make_train_step(
                self.cfg, self.tcfg, mesh=self.mesh,
                convention=self.dataset.convention,
                mask_ones=self.dataset.mask_ones,
                roi_prob=float(getattr(self.dataset,
                                       "sample_roi_prob", 0.0)),
                k_steps=k_steps)[1]

        stepper = BlockStepper(
            self.tcfg, self.dataset.n_images, self._step_fn, make_multi,
            key, freqs=(self.tcfg.report_freq, self.tcfg.save_freq,
                        self.tcfg.val_freq, self.tcfg.val_mesh_freq))
        stepper.start(rng, image_perm)

        while self.iter_step < self.tcfg.end_iter:
            self.params, self.opt_state, metrics, K = stepper.advance(
                self.iter_step, self.params, self.opt_state, self._data)
            self.iter_step += K
            self.meter.step(self.tcfg.batch_size * K)

            if self.iter_step % self.tcfg.report_freq == 0:
                m = boundary_metrics(metrics)
                self.writer.scalars(
                    {"Loss/loss": m["loss"], "Loss/color_loss": m["color_loss"],
                     "Loss/eikonal_loss": m["eikonal_loss"],
                     "Statistics/s_val": m["s_val"],
                     "Statistics/cdf": m["cdf"],
                     "Statistics/weight_max": m["weight_max"],
                     "Statistics/psnr": m["psnr"],
                     "Perf/rays_per_sec": self.meter.rays_per_sec},
                    self.iter_step)
                log.info("iter %d loss=%.5f psnr=%.2f rays/s=%.0f",
                         self.iter_step, m["loss"], m["psnr"],
                         self.meter.rays_per_sec)
            if self.iter_step % self.tcfg.save_freq == 0:
                self.save_checkpoint()
            if self.iter_step % self.tcfg.val_freq == 0:
                if self.type in ("dtu", "sk3d", "glossy_synthetic",
                                 "glossy_real"):
                    self.validate_image()
                else:
                    self.validate_synthetic_img()
            if self.iter_step % self.tcfg.val_mesh_freq == 0:
                if self.type in ("dtu", "sk3d"):
                    self.validate_mesh(world_space=True)
                elif self.type == "shiny_refneus":
                    self.validate_mesh_shiny()
                else:
                    self.validate_mesh(world_space=False)
            # NOTE: the image-perm rotation lives inside step_block (it can
            # fall mid-block); same rng stream as the reference's epoch
            # reshuffle (ref:exp_runner.py:220-221)
        CK.wait_for_async_saves()        # drain the background ckpt writer

    # -- checkpointing ------------------------------------------------------

    def save_checkpoint(self):
        groups = {ck: self.params[pk] for pk, ck in CKPT_KEYS.items()}
        groups["optimizer"] = self.opt_state
        groups["iter_step"] = self.iter_step
        # carry the full family so later stages can chain from one file
        groups["lvis_network"] = self.params["lvis"]
        groups["indiLgt_network"] = self.params["indirect"]
        groups["mateIllu_network"] = self.params["material"]
        CK.save_checkpoint_async(self.base_exp_dir, self.iter_step, groups)

    def load_checkpoint(self, path: str):
        loaded = CK.load_checkpoint(path)
        for pk, ck in CKPT_KEYS.items():
            self.params[pk] = jax.tree_util.tree_map(
                jnp.asarray, loaded[ck])
        for pk, ck in (("lvis", "lvis_network"),
                       ("indirect", "indiLgt_network"),
                       ("material", "mateIllu_network")):
            if ck in loaded:
                self.params[pk] = jax.tree_util.tree_map(
                    jnp.asarray, loaded[ck])
        if "optimizer" in loaded:
            self.opt_state = CK.restore_into(self.opt_state,
                                             loaded["optimizer"])
        self.iter_step = int(loaded["iter_step"])

    def file_backup(self):
        """Snapshot the code + conf into recording/ (ref:exp_runner.py:240-251).

        Honors the conf's `general.recording` list like the reference: an
        empty list records only the resolved config; a non-empty list
        snapshots the whole installed package (the reference's dir list is
        relative to its flat source tree, which has no analog here)."""
        rec = os.path.join(self.base_exp_dir, "recording")
        os.makedirs(rec, exist_ok=True)
        if self.conf.get("general.recording", []):
            pkg_root = os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))
            for dirpath, _, files in os.walk(pkg_root):
                if "__pycache__" in dirpath:
                    continue
                rel = os.path.relpath(dirpath, os.path.dirname(pkg_root))
                for fn in files:
                    if fn.endswith(".py"):
                        dst = os.path.join(rec, rel)
                        os.makedirs(dst, exist_ok=True)
                        shutil.copyfile(os.path.join(dirpath, fn),
                                        os.path.join(dst, fn))
        shutil.copyfile(self.conf_path, os.path.join(rec, "config.conf"))

    # -- validation ---------------------------------------------------------

    def _render_image(self, rays_o, rays_d, keys=("color_fine",)):
        """Chunked full-image render; returns dict of [H,W,...] numpy.
        The normal reduction runs on device so only [B,3] crosses the
        wire instead of [B,n,3] + two [B,n] masks per chunk."""
        def fn(o_c, d_c, _i):
            near, far = RAYS.near_far_from_sphere(o_c, d_c)
            return self._render_fn(self.params, o_c, d_c, near, far,
                                   jnp.asarray(self.iter_step))

        res, H, W = chunked_render(
            fn, rays_o, rays_d, val_chunk_size(self.tcfg, self.mesh), keys,
            post=lambda out: {"normals": _normal_map_device(
                out["gradients"], out["weights"], out["inside_sphere"])})
        return {k: v.reshape(H, W, -1) if k != "normals"
                else v.reshape(H, W, 3) for k, v in res.items()}

    def validate_image(self, idx: int = -1, resolution_level: int = -1):
        """DTU-style validation panels (ref:exp_runner.py:374-486)."""
        from ..data import images as IMG
        if idx < 0:
            idx = np.random.randint(self.dataset.n_images)
        if resolution_level < 0:
            resolution_level = self.tcfg.validate_resolution_level
        rays_o, rays_d = self.dataset.gen_rays_at(idx, resolution_level)
        res = self._render_image(rays_o, rays_d,
                                 keys=("color_fine", "diffuse_color",
                                       "specular_color", "surface_color"))
        H, W = res["color_fine"].shape[:2]

        img_fine = (res["color_fine"] * 256).clip(0, 255)
        gt = self.dataset.image_at(idx, resolution_level)
        IMG.imwrite(os.path.join(
            self.base_exp_dir, "validations_fine",
            f"v_{self.iter_step:08d}_0_{idx}.png"),
            np.concatenate([img_fine, gt]))

        rot = np.linalg.inv(np.asarray(self.dataset.pose_all[idx][:3, :3]))
        normal = (rot[None, None] @ res["normals"][..., None])[..., 0]
        IMG.imwrite(os.path.join(self.base_exp_dir, "normals",
                                 f"n_{self.iter_step:08d}_0_{idx}.png"),
                    normal * 128 + 128)
        IMG.imwrite(os.path.join(self.base_exp_dir, "diffuse",
                                 f"d_{self.iter_step:08d}_0_{idx}.png"),
                    (res["diffuse_color"] * 256).clip(0, 255))
        IMG.imwrite(os.path.join(self.base_exp_dir, "specular",
                                 f"s_{self.iter_step:08d}_0_{idx}.png"),
                    (res["specular_color"] * 256).clip(0, 255))
        IMG.imwrite(os.path.join(self.base_exp_dir, "CdPlusCs",
                                 f"DPlusS_{self.iter_step:08d}_0_{idx}.png"),
                    (res["surface_color"] * 256).clip(0, 255))

    def validate_synthetic_img(self, idx: int = -1,
                               resolution_level: int = -1):
        """Synthetic validation with gamma tonemap (ref:exp_runner.py:281-371)."""
        from ..data import images as IMG
        if idx < 0:
            idx = np.random.randint(self.dataset.n_images)
        idx %= self.dataset.n_images      # the CLI's reference default (57)
        if resolution_level < 0:          # can exceed small test scenes
            resolution_level = self.tcfg.validate_resolution_level
        rays_o, rays_d = self.dataset.gen_rays_at(idx, resolution_level)
        res = self._render_image(rays_o, rays_d,
                                 keys=("color_fine", "diffuse_color",
                                       "specular_color"))
        tonemap = lambda x: np.power(np.clip(x, 0, 1), 1.0 / 2.2)
        IMG.imwrite(os.path.join(self.base_exp_dir, "validations_fine",
                                 f"v_{self.iter_step}_{idx}.png"),
                    np.concatenate([
                        tonemap(res["color_fine"]) * 255,
                        self.dataset.image_at(idx, resolution_level)]))
        IMG.imwrite(os.path.join(self.base_exp_dir, "diffuse",
                                 f"d_{self.iter_step}_{idx}.png"),
                    tonemap(res["diffuse_color"]) * 255)
        IMG.imwrite(os.path.join(self.base_exp_dir, "specular",
                                 f"s_{self.iter_step}_{idx}.png"),
                    (res["specular_color"] * 255).clip(0, 255))
        IMG.imwrite(os.path.join(self.base_exp_dir, "normals",
                                 f"n_{self.iter_step}_{idx}.png"),
                    res["normals"] * 128 + 128)

    # -- meshes -------------------------------------------------------------

    def _neg_sdf(self, pts):
        # chunked narrowed XLA sweep: 2.9x faster than the fused Pallas
        # forward on the 512^3 fill (BENCHMARKS.md round-3 ledger)
        return MEXT.make_sdf_grid_query(self.params["sdf"], self.cfg.sdf)(pts)

    def validate_mesh(self, world_space: bool = False, resolution: int = 512,
                      threshold: float = 0.0):
        """ref:exp_runner.py:518-532."""
        verts, tris = MEXT.extract_geometry(
            self.dataset.object_bbox_min, self.dataset.object_bbox_max,
            resolution=resolution, threshold=threshold,
            query_fn=self._neg_sdf, mesh=self.mesh)
        if world_space:
            s = self.dataset.scale_mats_np[0]
            verts = verts * s[0, 0] + s[:3, 3][None]
        out = os.path.join(self.base_exp_dir, "meshes",
                           f"{self.iter_step:08d}.ply")
        write_ply(out, verts, tris)
        log.info("mesh written: %s (%d verts)", out, len(verts))
        return out

    def validate_mesh_shiny(self, resolution: int = 64,
                            threshold: float = 0.0):
        """Shiny path with online Chamfer eval every 10k iters
        (ref:exp_runner.py:535-600)."""
        import json

        verts, tris = MEXT.extract_geometry(
            self.dataset.object_bbox_min, self.dataset.object_bbox_max,
            resolution=resolution, threshold=threshold,
            query_fn=self._neg_sdf, mesh=self.mesh)
        inter = os.path.join(self.base_exp_dir, "meshes", "inter_mesh.ply")
        write_ply(inter, verts, tris)

        if self.iter_step % 10000 == 0 and self.iter_step != 0:
            verts, tris = MEXT.extract_geometry(
                self.dataset.object_bbox_min, self.dataset.object_bbox_max,
                resolution=512, threshold=threshold,
                query_fn=self._neg_sdf, mesh=self.mesh)
            mesh_path = os.path.join(self.base_exp_dir, "meshes",
                                     f"{self.iter_step:08d}.ply")
            write_ply(mesh_path, verts, tris)
            scale_mat = self.dataset.scale_mat
            verts_eval = verts @ scale_mat[:3, :3].T + scale_mat[:3, 3][None]
            eval_path = os.path.join(self.base_exp_dir, "meshes",
                                     f"{self.iter_step:08d}_eval.ply")
            write_ply(eval_path, verts_eval, tris)

            info_path = os.path.join(self.conf["dataset.data_dir"],
                                     "test_info.json")
            with open(info_path) as f:
                info = json.load(f)
            from ..evaltools.shiny import evaluation_shinyblender
            mean_d2s, mean_s2d, over_all = evaluation_shinyblender(
                verts_eval, tris,
                os.path.join(self.conf["dataset.data_dir"], "dense_pcd.ply"),
                self.base_exp_dir, max_dist_d=info["max_dist_d"],
                max_dist_t=info["max_dist_t"],
                points_for_plane=info["points"],
                nonvalid_bbox=info.get("nonvalid_bbox"))
            with open(os.path.join(self.base_exp_dir, "result.txt"), "a") as f:
                f.write(f"{self.iter_step}: {mean_d2s} {mean_s2d} {over_all}\n")

    def mesh_dtu_sphere2world(self, mesh_name: str):
        """ref:exp_runner.py:603-608."""
        from ..meshing.ply import read_ply_mesh
        verts, tris = read_ply_mesh(os.path.join(
            self.base_exp_dir, "meshes", f"{mesh_name}.ply"))
        s = self.dataset.scale_mats_np[0]
        verts = verts * s[0, 0] + s[:3, 3][None]
        write_ply(os.path.join(self.base_exp_dir, "meshes", "00300000.ply"),
                  verts, tris)

    # -- novel views --------------------------------------------------------

    def render_novel_image(self, idx_0: int, idx_1: int, ratio: float,
                           resolution_level: int):
        rays_o, rays_d = self.dataset.gen_rays_between(
            idx_0, idx_1, ratio, resolution_level)
        res = self._render_image(rays_o, rays_d, keys=("color_fine",))
        return (res["color_fine"] * 256).clip(0, 255).astype(np.uint8)

    def interpolate_view(self, img_idx_0: int, img_idx_1: int,
                         n_frames: int = 60):
        """Novel-view video (ref:exp_runner.py:611-634)."""
        from ..utils.video import write_video
        images = []
        for i in range(n_frames):
            ratio = np.sin(((i / n_frames) - 0.5) * np.pi) * 0.5 + 0.5
            images.append(self.render_novel_image(img_idx_0, img_idx_1,
                                                  ratio, resolution_level=4))
        images += images[::-1]
        video_dir = os.path.join(self.base_exp_dir, "render")
        # frames come out in the dataset's native channel order: cv-loaded
        # datasets are BGR (like the reference's cv.VideoWriter path),
        # EXR/imageio datasets are RGB
        write_video(
            os.path.join(video_dir,
                         f"{self.iter_step:08d}_{img_idx_0}_{img_idx_1}.mp4"),
            images, fps=30, bgr=self.dataset.color_bgr)
