#!/usr/bin/env python
"""End-to-end cross-framework parity: train the torch reference AND this
framework stage-1 on the SAME fabricated DTU scene with the SAME conf, then
compare loss trajectories, validation PSNR, and chamfer distance to the
analytic ground-truth sphere.

The torch side runs the actual /root/reference exp_runner.Runner on CPU
(via tools/ref_compat.py shims — its real code paths, our mcubes/pyhocon
backends). RNG streams differ between frameworks, so trajectories are
compared by convergence level, not bitwise.

Usage:
  python tools/e2e_torch_parity.py setup  <workdir> [iters] [--full]
  python tools/e2e_torch_parity.py torch  <workdir> [--seed N]  # CPU, slow
  python tools/e2e_torch_parity.py jax    <workdir> [--seed N]
  python tools/e2e_torch_parity.py compare <workdir>            # 1-seed table
  python tools/e2e_torch_parity.py compare-multi <workdir>      # mean+-spread

--full switches the conf from the CPU-feasible reduced architecture to the
REFERENCE architecture (8x256 SDF skip[4], 4x256 rendering, 64+64 samples,
4 up-sample rounds — confs/wmask.conf model block verbatim; batch stays 64
for single-core torch feasibility).  --seed N seeds both frameworks
(torch.manual_seed / PRNGKey) and isolates exp dirs + result files per
seed, so compare-multi can report cross-framework gap vs seed spread.

Ref anchors: exp_runner.py:124-238 (train loop), sh_dtu.sh:5-15,
confs/wmask.conf:48-103 (full architecture).
"""
import glob
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

CASE = "fake_scan"
SPHERE_R = 0.5                       # the fabricated scene's GT object

# Reference-compatible conf: the reference render_core hardcodes feature
# width 256 (ref:models/renderer.py:290,300), so d_out=257 / d_feature=256
# are mandatory; everything else is shrunk for CPU feasibility.
PARITY_CONF = """
general {{
    base_exp_dir_geo = {exp}/geometry
    base_exp_dir_lvis = {exp}/lvis
    base_exp_dir_mateIllu = {exp}/mateIllu
    base_exp_dir = {exp}/geometry
    recording = []
}}
dataset {{
    data_dir = {data}
    render_cameras_name = cameras_sphere.npz
    object_cameras_name = cameras_sphere.npz
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = {iters}
    batch_size = 64
    validate_resolution_level = 2
    warm_up_end = 50
    anneal_end = 0
    use_white_bkgd = False
    save_freq = 1000000
    val_freq = 1000000
    val_mesh_freq = 1000000
    report_freq = 25
    igr_weight = 0.1
    mask_weight = 0.1
    lvis {{
        batch_size = 32
        end_iter = {iters2}
        warm_up_end = 10
    }}
    metaIllu {{
        batch_size = 32
        end_iter = {iters2}
    }}
}}
model {{
    nerf {{
        D = {nerf_D}, d_in = 4, d_in_view = 3, W = {nerf_W},
        multires = 4, multires_view = 2, output_ch = 4,
        skips = {nerf_skips}, use_viewdirs = True
    }}
    sdf_network {{
        d_out = 257, d_in = 3, d_hidden = {sdf_hidden},
        n_layers = {sdf_layers},
        skip_in = {sdf_skip}, multires = 6, bias = 0.5, scale = 1.0,
        geometric_init = True, weight_norm = True
    }}
    variance_network {{
        init_val = 0.3
    }}
    rendering_network {{
        d_feature = 256, mode = idr, d_in = 9, d_out = 3,
        d_hidden = {rend_hidden}, n_layers = {rend_layers},
        weight_norm = True,
        multires_view = 4, squeeze_out = True
    }}
    neus_renderer {{
        n_samples = {n_samples}, n_importance = {n_importance},
        n_outside = 0,
        up_sample_steps = {up_steps}, perturb = 1.0
    }}
    lvis_renderer {{
        n_samples = {n_samples}, n_importance = {n_importance},
        n_outside = 0,
        up_sample_steps = {up_steps}, perturb = 1.0
    }}
}}
"""

# CPU-feasible reduced architecture (round-2 default)
REDUCED_ARCH = dict(nerf_D=2, nerf_W=32, nerf_skips="[]",
                    sdf_hidden=64, sdf_layers=4, sdf_skip="[2]",
                    rend_hidden=64, rend_layers=4,
                    n_samples=16, n_importance=16, up_steps=2)
# The reference architecture, confs/wmask.conf model block (nerf kept small:
# n_outside=0 never evaluates it — it only pads the param count)
FULL_ARCH = dict(nerf_D=2, nerf_W=32, nerf_skips="[]",
                 sdf_hidden=256, sdf_layers=8, sdf_skip="[4]",
                 rend_hidden=256, rend_layers=4,
                 n_samples=64, n_importance=64, up_steps=4)


def setup(workdir: str, iters: int = 1000, iters2: int = 100,
          full: bool = False):
    from make_fake_dtu import make_fake_dtu_scene
    data_dir = os.path.join(workdir, "data", CASE)
    make_fake_dtu_scene(data_dir, n_views=3, H=64, W=80)
    arch = FULL_ARCH if full else REDUCED_ARCH
    conf = PARITY_CONF.format(exp=os.path.join(workdir, "exp_CASE_NAME"),
                              data=os.path.join(workdir, "data", "CASE_NAME"),
                              iters=iters, iters2=iters2, **arch)
    conf_path = os.path.join(workdir, "parity.conf")
    with open(conf_path, "w") as f:
        f.write(conf.replace("exp_CASE_NAME", "exp/CASE_NAME"))
    print(f"scene + conf at {workdir} (iters={iters}, "
          f"arch={'full' if full else 'reduced'})")
    return conf_path


def _seed_conf(workdir: str, seed):
    """Per-seed conf: same scene/arch, isolated exp dirs (exp_s{N}/)."""
    conf_path = os.path.join(workdir, "parity.conf")
    if seed is None:
        return conf_path
    with open(conf_path) as f:
        text = f.read()
    # rewrite ONLY the exp tree rooted at this workdir — a blanket
    # "/exp/" replace would corrupt a workdir path that itself contains
    # an /exp/ segment (e.g. /home/user/exp/parity/data/...)
    text = text.replace(os.path.join(workdir, "exp") + "/",
                        os.path.join(workdir, f"exp_s{seed}") + "/")
    sp = os.path.join(workdir, f"parity_s{seed}.conf")
    with open(sp, "w") as f:
        f.write(text)
    return sp


def _suffix(seed):
    return "" if seed is None else f"_s{seed}"


def _psnr_curveless(pred_u8_scale, gt_255, mask=None):
    """PSNR on the same 1/256 normalization both trainers use. With `mask`
    [H,W] the mean runs over foreground pixels only (mask training leaves
    the background unsupervised)."""
    a = np.asarray(pred_u8_scale, np.float64) / 256.0
    b = np.asarray(gt_255, np.float64) / 256.0
    se = (a - b) ** 2
    if mask is not None:
        m = np.asarray(mask, bool)
        se = se[m]
    mse = np.mean(se)
    return float(20.0 * np.log10(1.0 / np.sqrt(mse)))


def _chamfer_vs_sphere(mesh_path: str):
    """Mesh (PLY) vs analytic sphere of radius SPHERE_R: (d2s, s2d) means.
    Uses this framework's native KD-tree + area-uniform mesh sampling."""
    from factored_neus_tpu.evaltools.pointcloud import (nn_distances,
                                                        sample_mesh_points)
    from factored_neus_tpu.meshing.ply import read_ply_mesh
    verts, faces = read_ply_mesh(mesh_path)
    pts = sample_mesh_points(verts, faces, 0.01)   # density-based sampling
    # keep reconstruction points near the object (both frameworks may carry
    # faint background structure outside the unit sphere)
    pts = pts[np.linalg.norm(pts, axis=-1) < 0.9]
    rng = np.random.RandomState(1)
    v = rng.randn(100_000, 3)
    gt = SPHERE_R * v / np.linalg.norm(v, axis=-1, keepdims=True)
    d2s = float(np.mean(nn_distances(pts.astype(np.float32),
                                     gt.astype(np.float32))))
    s2d = float(np.mean(nn_distances(gt.astype(np.float32),
                                     pts.astype(np.float32))))
    return d2s, s2d


def run_torch(workdir: str, seed=None):
    sys.path.insert(0, HERE)
    import ref_compat
    ref_compat.install()
    import torch
    from torch.utils.tensorboard import SummaryWriter

    curve = []
    orig_add = SummaryWriter.add_scalar

    def capture(self, tag, value, step=None, *a, **k):
        if tag in ("Loss/loss", "Loss/color_loss", "Loss/eikonal_loss",
                   "Statistics/psnr"):
            curve.append({"step": int(step), "tag": tag,
                          "value": float(value)})
        return orig_add(self, tag, value, step, *a, **k)

    SummaryWriter.add_scalar = capture

    os.chdir(workdir)                    # reference file_backup copies ./
    from exp_runner import Runner        # the reference
    conf_path = _seed_conf(workdir, seed)
    if seed is not None:                 # ref has no seeding of its own
        torch.manual_seed(seed)
        np.random.seed(seed)
    runner = Runner(conf_path, "train", CASE, False, "dtu")
    runner.train()
    runner.save_checkpoint()            # stages 2/3 chain from this

    # validation PSNR on view 0 at half conf resolution level
    level = 2
    rays_o, rays_d = runner.dataset.gen_rays_at(0, resolution_level=level)
    H, W, _ = rays_o.shape
    ro = rays_o.reshape(-1, 3).split(runner.batch_size)
    rd = rays_d.reshape(-1, 3).split(runner.batch_size)
    out = []
    with torch.no_grad():
        pass                            # render still needs sdf autograd
    for o, d in zip(ro, rd):
        near, far = runner.dataset.near_far_from_sphere(o, d)
        r = runner.renderer.render(o, d, near, far,
                                   cos_anneal_ratio=runner.get_cos_anneal_ratio())
        out.append(r["color_fine"].detach().cpu().numpy())
    img = (np.concatenate(out).reshape(H, W, 3) * 256).clip(0, 255)
    gt = runner.dataset.image_at(0, resolution_level=level)
    mask = np.asarray(runner.dataset.masks[0].cpu().numpy())[::level, ::level, 0] > 0.5
    mask = mask[:H, :W]
    np.savez(os.path.join(workdir, "torch_view0.npz"), img=img, gt=gt,
             mask=mask)
    psnr = _psnr_curveless(img, gt)
    psnr_fg = _psnr_curveless(img, gt, mask)

    runner.validate_mesh(world_space=False, resolution=96)
    meshes = sorted(glob.glob(os.path.join(runner.base_exp_dir,
                                           "meshes", "*.ply")))
    d2s, s2d = _chamfer_vs_sphere(meshes[-1])

    res = {"framework": "torch-reference", "curve": curve,
           "psnr_view0": psnr, "psnr_view0_fg": psnr_fg,
           "chamfer_d2s": d2s, "chamfer_s2d": s2d,
           "iter_step": runner.iter_step, "seed": seed}
    out = os.path.join(workdir, f"torch_result{_suffix(seed)}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "curve"}))


def run_jax(workdir: str, seed=None):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from factored_neus_tpu.train.runner1 import Runner
    from factored_neus_tpu.utils.logging import MetricsWriter

    curve = []
    orig = MetricsWriter.scalars

    def capture(self, scalars, step):
        for tag in ("Loss/loss", "Loss/color_loss", "Loss/eikonal_loss",
                    "Statistics/psnr"):
            if tag in scalars:
                curve.append({"step": int(step), "tag": tag,
                              "value": float(scalars[tag])})
        return orig(self, scalars, step)

    MetricsWriter.scalars = capture

    conf_path = _seed_conf(workdir, seed)
    runner = Runner(conf_path, "train", CASE, False, "dtu",
                    seed=0 if seed is None else int(seed))
    runner.train()
    runner.save_checkpoint()            # stages 2/3 chain from this

    level = 2
    rays_o, rays_d = runner.dataset.gen_rays_at(0, resolution_level=level)
    res_img = runner._render_image(rays_o, rays_d, keys=("color_fine",))
    img = (res_img["color_fine"] * 256).clip(0, 255)
    gt = runner.dataset.image_at(0, resolution_level=level)
    H, W = img.shape[:2]
    mask = np.asarray(runner.dataset.masks[0])[::level, ::level, 0] > 0.5
    mask = mask[:H, :W]
    np.savez(os.path.join(workdir, "jax_view0.npz"), img=img, gt=gt,
             mask=mask)
    psnr = _psnr_curveless(img, gt)
    psnr_fg = _psnr_curveless(img, gt, mask)

    runner.validate_mesh(world_space=False, resolution=96)
    meshes = sorted(glob.glob(os.path.join(runner.base_exp_dir,
                                           "meshes", "*.ply")))
    d2s, s2d = _chamfer_vs_sphere(meshes[-1])

    res = {"framework": "factored_neus_tpu", "curve": curve,
           "psnr_view0": psnr, "psnr_view0_fg": psnr_fg,
           "chamfer_d2s": d2s, "chamfer_s2d": s2d,
           "iter_step": runner.iter_step, "seed": seed}
    out = os.path.join(workdir, f"jax_result{_suffix(seed)}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "curve"}))


def _capture_torch_curve(tags, stage_box):
    from torch.utils.tensorboard import SummaryWriter
    curve = []
    orig_add = SummaryWriter.add_scalar

    def capture(self, tag, value, step=None, *a, **k):
        if tag in tags:
            curve.append({"step": int(step), "tag": tag,
                          "value": float(value), "stage": stage_box[0]})
        return orig_add(self, tag, value, step, *a, **k)

    SummaryWriter.add_scalar = capture
    return curve


def run_torch23(workdir: str):
    """Reference stage-2 (lvis distillation) then stage-3 (materials) on
    CPU, chained from the stage-1 checkpoint (ref:lvis.py, mateIllu.py)."""
    sys.path.insert(0, HERE)
    import ref_compat
    ref_compat.install()
    stage_box = [2]
    curve = _capture_torch_curve(("Loss/loss", "Statistics/psnr"),
                                 stage_box)
    os.chdir(workdir)
    conf_path = os.path.join(workdir, "parity.conf")

    import lvis as ref_lvis                       # the reference
    r2 = ref_lvis.Runner(conf_path, "train", CASE, False, "dtu")
    r2.train()
    r2.save_checkpoint()                # stage 3 chains from this

    stage_box[0] = 3
    import mateIllu as ref_mate                   # the reference
    r3 = ref_mate.Runner(conf_path, "train", CASE, False, "dtu")
    r3.train()

    res = {"framework": "torch-reference", "curve": curve,
           "iter2": r2.iter_step, "iter3": r3.iter_step}
    with open(os.path.join(workdir, "torch23_result.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "curve"}))


def run_jax23(workdir: str):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from factored_neus_tpu.train.runner2 import Runner as Runner2
    from factored_neus_tpu.train.runner3 import Runner as Runner3
    from factored_neus_tpu.utils.logging import MetricsWriter

    curve = []
    stage_box = [2]
    orig = MetricsWriter.scalars

    def capture(self, scalars, step):
        for tag in ("Loss/loss", "Statistics/psnr"):
            if tag in scalars:
                curve.append({"step": int(step), "tag": tag,
                              "value": float(scalars[tag]),
                              "stage": stage_box[0]})
        return orig(self, scalars, step)

    MetricsWriter.scalars = capture
    conf_path = os.path.join(workdir, "parity.conf")
    r2 = Runner2(conf_path, "train", CASE, False, "dtu")
    r2.train()
    r2.save_checkpoint()                # stage 3 chains from this
    stage_box[0] = 3
    r3 = Runner3(conf_path, "train", CASE, False, "dtu")
    r3.train()
    res = {"framework": "factored_neus_tpu", "curve": curve,
           "iter2": r2.iter_step, "iter3": r3.iter_step}
    with open(os.path.join(workdir, "jax23_result.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "curve"}))


def compare23(workdir: str):
    with open(os.path.join(workdir, "torch23_result.json")) as f:
        t = json.load(f)
    with open(os.path.join(workdir, "jax23_result.json")) as f:
        j = json.load(f)

    def ends(res, stage, tag):
        vals = [c["value"] for c in res["curve"]
                if c["tag"] == tag and c.get("stage") == stage]
        if not vals:
            return (float("nan"), float("nan"))
        # the torch side logs every iter, ours every report_freq — smooth
        # both over the trailing ~12% so tails are comparable
        n = max(2, len(vals) // 8)
        return (float(np.mean(vals[:n])), float(np.mean(vals[-n:])))

    print(f"| metric (stage2 {t['iter2']} it / stage3 {t['iter3']} it)"
          " | torch reference (CPU) | factored_neus_tpu |")
    print("|---|---|---|")
    for name, stage, tag in (
            ("stage-2 lvis loss", 2, "Loss/loss"),
            ("stage-3 rgb loss", 3, "Loss/loss"),
            ("stage-3 train PSNR", 3, "Statistics/psnr")):
        t0, t1 = ends(t, stage, tag)
        j0, j1 = ends(j, stage, tag)
        print(f"| {name} (first->last) | {t0:.4f} -> {t1:.4f} "
              f"| {j0:.4f} -> {j1:.4f} |")


def compare(workdir: str):
    with open(os.path.join(workdir, "torch_result.json")) as f:
        t = json.load(f)
    with open(os.path.join(workdir, "jax_result.json")) as f:
        j = json.load(f)

    def tail(res, tag, n=4):
        vals = [c["value"] for c in res["curve"] if c["tag"] == tag]
        return float(np.mean(vals[-n:])) if vals else float("nan")

    rows = [
        ("final loss (mean of last 4 reports)", tail(t, "Loss/loss"),
         tail(j, "Loss/loss")),
        ("final color L1", tail(t, "Loss/color_loss"),
         tail(j, "Loss/color_loss")),
        ("final eikonal", tail(t, "Loss/eikonal_loss"),
         tail(j, "Loss/eikonal_loss")),
        ("train-batch PSNR", tail(t, "Statistics/psnr"),
         tail(j, "Statistics/psnr")),
        ("validation PSNR (view 0, full)", t["psnr_view0"],
         j["psnr_view0"]),
        ("validation PSNR (view 0, foreground)",
         t.get("psnr_view0_fg", float("nan")),
         j.get("psnr_view0_fg", float("nan"))),
        ("chamfer d2s vs GT sphere", t["chamfer_d2s"], j["chamfer_d2s"]),
        ("chamfer s2d vs GT sphere", t["chamfer_s2d"], j["chamfer_s2d"]),
    ]
    print(f"| metric ({t['iter_step']} iters) | torch reference (CPU) |"
          " factored_neus_tpu |")
    print("|---|---|---|")
    for name, tv, jv in rows:
        print(f"| {name} | {tv:.4f} | {jv:.4f} |")


def compare_multi(workdir: str):
    """Multi-seed table: per-framework mean +- sample spread of the final
    metrics, and whether the cross-framework gap of means sits inside the
    seed spread (the honest backing for the parity north star)."""
    def load(pat):
        out = []
        for p in sorted(glob.glob(os.path.join(workdir, pat))):
            with open(p) as f:
                out.append(json.load(f))
        return out

    ts, js = load("torch_result_s*.json"), load("jax_result_s*.json")
    if not ts or not js:
        print(f"need >=1 seed per side; found torch={len(ts)} jax={len(js)}")
        return

    def tail_loss(res, tag="Loss/loss", n=4):
        vals = [c["value"] for c in res["curve"] if c["tag"] == tag]
        return float(np.mean(vals[-n:])) if vals else float("nan")

    metrics = [
        ("chamfer d2s vs GT sphere", lambda r: r["chamfer_d2s"]),
        ("chamfer s2d vs GT sphere", lambda r: r["chamfer_s2d"]),
        ("validation PSNR (view 0, fg)",
         lambda r: r.get("psnr_view0_fg", float("nan"))),
        ("final loss (mean last 4 reports)", tail_loss),
    ]
    it = ts[0]["iter_step"]
    print(f"| metric ({it} iters, {len(ts)} torch / {len(js)} jax seeds) "
          "| torch mean+-sd [min..max] | jax mean+-sd [min..max] "
          "| gap | gap/spread |")
    print("|---|---|---|---|---|")
    for name, fn in metrics:
        tv = np.array([fn(r) for r in ts], np.float64)
        jv = np.array([fn(r) for r in js], np.float64)
        tsd = tv.std(ddof=1) if len(tv) > 1 else float("nan")
        jsd = jv.std(ddof=1) if len(jv) > 1 else float("nan")
        gap = jv.mean() - tv.mean()
        # spread yardstick: the larger of the two sample sds
        spread = np.nanmax([tsd, jsd])
        ratio = abs(gap) / spread if spread and np.isfinite(spread) else \
            float("nan")
        print(f"| {name} | {tv.mean():.4f}+-{tsd:.4f} "
              f"[{tv.min():.4f}..{tv.max():.4f}] "
              f"| {jv.mean():.4f}+-{jsd:.4f} "
              f"[{jv.min():.4f}..{jv.max():.4f}] "
              f"| {gap:+.4f} | {ratio:.2f} |")


def _seed_arg(args):
    if "--seed" in args:
        return int(args[args.index("--seed") + 1])
    return None


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    cmd, workdir = sys.argv[1], os.path.abspath(sys.argv[2])
    rest = sys.argv[3:]
    os.makedirs(workdir, exist_ok=True)
    if cmd == "setup":
        pos = [a for a in rest if not a.startswith("--")]
        setup(workdir, int(pos[0]) if pos else 1000,
              full="--full" in rest)
    elif cmd == "torch":
        run_torch(workdir, _seed_arg(rest))
    elif cmd == "jax":
        run_jax(workdir, _seed_arg(rest))
    elif cmd == "torch23":
        run_torch23(workdir)
    elif cmd == "jax23":
        run_jax23(workdir)
    elif cmd == "compare":
        compare(workdir)
    elif cmd == "compare-multi":
        compare_multi(workdir)
    elif cmd == "compare23":
        compare23(workdir)
    else:
        print(__doc__)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
