"""High-level inference pipeline: load trained checkpoints, render novel
views / decompositions / relightings, extract meshes — the serving surface.

The reference exposes inference only through the training CLIs' validate
modes (ref:exp_runner.py:665-682, mateIllu.py:1103-1163); this wraps the
same capabilities as a library API with jit-cached render functions, suited
to batch serving on TPU.

Example:
    pipe = Pipeline.from_experiment("confs/wmask.conf", case="dtu_scan97")
    img   = pipe.render_view(idx=0, resolution_level=2)       # [H,W,3]
    panel = pipe.render_decomposition(idx=0)                  # dict of maps
    v, t  = pipe.extract_mesh(resolution=512)
    relit = pipe.relight("./envmaps/envmap6", idx=0)
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data import rays as RAYS
from .data.datasets import make_dataset
from .meshing import extract as MEXT
from .models import fields as F
from .models import renderer as R
from .ops import sg as SG
from .utils import checkpoints as CK
from .utils import config as CFG
from .train.common import chunked_render, init_all_params
from .train.runner3 import STAGE3_KEYS


class Pipeline:
    def __init__(self, cfg: R.RendererConfig, params: Dict, dataset=None,
                 batch_size: int = 4096):
        self.cfg = cfg
        self.params = params
        self.dataset = dataset
        self.batch_size = batch_size
        self._render = jax.jit(
            lambda p, ro, rd, nr, fr: R.render(
                p, cfg, ro, rd, nr, fr, key=None, cos_anneal_ratio=1.0,
                perturb_overwrite=0.0))
        self._mate = jax.jit(
            lambda p, ro, rd, nr, fr, k: R.mate_illu_render(
                p, cfg, ro, rd, nr, fr, k))

    # -- construction --------------------------------------------------------

    @classmethod
    def from_experiment(cls, conf_path: str, case: str = "",
                        type: str = "dtu", stage: int = 3,
                        batch_size: int = 4096) -> "Pipeline":
        """Load the newest checkpoints of the given stage (and everything it
        chains from)."""
        conf = CFG.load(conf_path, case)
        # synthetic/shiny stages 2/3 train linear-space (tonemap 'none',
        # like runner3); serving must render with the same tonemap or the
        # outputs are silently gamma-shifted vs the trained checkpoint
        from .data.datasets import LINEAR_SPACE_TYPES
        tonemap = "none" if (stage >= 3 and type in LINEAR_SPACE_TYPES) \
            else "srgb"
        cfg = CFG.renderer_config(
            conf, "model.lvis_renderer" if stage > 1 else
            "model.neus_renderer", tonemap=tonemap)
        params = init_all_params(jax.random.PRNGKey(0), cfg,
                                 CFG.variance_init_val(conf))
        dirs = {1: conf.get("general.base_exp_dir_geo"),
                2: conf.get("general.base_exp_dir_lvis"),
                3: conf.get("general.base_exp_dir_mateIllu")}
        loaded_groups = set()
        for s in range(1, stage + 1):
            path = CK.latest_checkpoint(dirs[s]) if dirs.get(s) else None
            if path is None:
                continue
            loaded = CK.load_checkpoint(path)
            for pk, ck in STAGE3_KEYS.items():
                if ck in loaded:
                    params[pk] = jax.tree_util.tree_map(jnp.asarray,
                                                        loaded[ck])
                    loaded_groups.add(pk)
        # every network the requested stage SERVES must come from a
        # checkpoint — silently serving random-init stage-2/3 nets (when
        # only stage 1 was trained) returns garbage with no error
        need = {1: ("sdf", "color", "variance"),
                2: ("sdf", "color", "variance", "lvis", "indirect"),
                3: ("sdf", "color", "variance", "lvis", "indirect",
                    "material")}[stage]
        missing = [g for g in need if g not in loaded_groups]
        if missing:
            raise FileNotFoundError(
                f"stage-{stage} pipeline needs trained groups {missing} "
                f"but no checkpoint under {dirs} provides them — train the "
                "earlier stages first")
        dataset = make_dataset(type, conf["dataset"])
        return cls(cfg, params, dataset, batch_size)

    # -- chunked ray driver --------------------------------------------------

    def _run_chunks(self, rays_o, rays_d, fn, keys, key=None):
        def call(o_c, d_c, i):
            near, far = RAYS.near_far_from_sphere(o_c, d_c)
            if key is None:
                return fn(self.params, o_c, d_c, near, far)
            return fn(self.params, o_c, d_c, near, far,
                      jax.random.fold_in(key, i))

        res, H, W = chunked_render(call, rays_o, rays_d, self.batch_size,
                                   keys)
        return {k: v.reshape(H, W, -1) for k, v in res.items()}

    # -- public surface ------------------------------------------------------

    def render_rays(self, rays_o, rays_d) -> Dict[str, np.ndarray]:
        """Stage-1 render over an [H,W,3] ray grid."""
        return self._run_chunks(rays_o, rays_d, self._render,
                                ("color_fine", "surface_color",
                                 "diffuse_color", "specular_color"))

    def render_view(self, idx: int, resolution_level: int = 1) -> np.ndarray:
        rays_o, rays_d = self.dataset.gen_rays_at(idx, resolution_level)
        return self.render_rays(rays_o, rays_d)["color_fine"]

    def render_between(self, idx_0: int, idx_1: int, ratio: float,
                       resolution_level: int = 1) -> np.ndarray:
        rays_o, rays_d = self.dataset.gen_rays_between(idx_0, idx_1, ratio,
                                                       resolution_level)
        return self.render_rays(rays_o, rays_d)["color_fine"]

    def render_decomposition(self, idx: int, resolution_level: int = 1,
                             seed: int = 0) -> Dict[str, np.ndarray]:
        """Stage-3 material decomposition maps."""
        rays_o, rays_d = self.dataset.gen_rays_at(idx, resolution_level)
        return self._run_chunks(
            rays_o, rays_d, self._mate,
            ("rgb", "env_rgb", "indir_rgb", "diffuse_albedo",
             "specular_albedo", "diffuse_rgb", "specular_rgb", "roughness",
             "lvis_mean", "n_out"),
            key=jax.random.PRNGKey(seed))

    def relight(self, envmap_path: str, idx: int,
                resolution_level: int = 1) -> np.ndarray:
        """Render under a loaded SG envmap (sg_128.npy next to the path).
        ref:models/inverRender.py:614-625."""
        saved = self.params["material"]["lgtSGs"]
        sgs = np.load(os.path.join(envmap_path, "sg_128.npy"))
        self.params["material"]["lgtSGs"] = jnp.asarray(sgs, jnp.float32)
        try:
            out = self.render_decomposition(idx, resolution_level)["rgb"]
        finally:
            self.params["material"]["lgtSGs"] = saved
        return out

    def envmap(self, H: int = 256, W: int = 512) -> np.ndarray:
        """Rasterized learned environment map."""
        from .models.materials import get_light
        return np.asarray(get_light(self.params["material"], H, W))

    def sdf(self, pts: np.ndarray) -> np.ndarray:
        return np.asarray(F.sdf_value(self.params["sdf"], self.cfg.sdf,
                                      jnp.asarray(pts, jnp.float32)))

    def extract_mesh(self, resolution: int = 512, threshold: float = 0.0,
                     world_space: bool = False, mesh=None
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """mesh: optional jax.sharding.Mesh — shards the grid fill across
        the devices (see meshing.extract.extract_fields)."""
        # chunked narrowed XLA sweep: 2.9x faster than the fused Pallas
        # forward on the 512^3 fill (BENCHMARKS.md round-3 ledger)
        query = MEXT.make_sdf_grid_query(self.params["sdf"], self.cfg.sdf)
        bb_min = self.dataset.object_bbox_min if self.dataset is not None \
            else [-1.01] * 3
        bb_max = self.dataset.object_bbox_max if self.dataset is not None \
            else [1.01] * 3
        verts, tris = MEXT.extract_geometry(bb_min, bb_max, resolution,
                                            threshold, query, mesh=mesh)
        if world_space and hasattr(self.dataset, "scale_mats_np"):
            s = self.dataset.scale_mats_np[0]
            verts = verts * s[0, 0] + s[:3, 3][None]
        return verts, tris
