"""Tiny synthetic test scene: a lambertian-ish sphere observed by a ring of
cameras — no external data needed (the reference repo ships none either)."""
import jax
import jax.numpy as jnp
import numpy as np

from factored_neus_tpu.models import fields as F
from factored_neus_tpu.models import renderer as R
from factored_neus_tpu.models.materials import (EnvmapMaterialConfig,
                                                envmap_material_init)


def tiny_config(n_outside=0):
    return R.RendererConfig(
        n_samples=16, n_importance=16, n_outside=n_outside, up_sample_steps=2,
        sdf=F.SDFConfig(n_layers=2, d_hidden=64, d_out=65, skip_in=(),
                        multires=4),
        rendering=F.RenderingConfig(d_feature=64, n_layers=2, d_hidden=64),
        nerf=F.NeRFConfig(D=2, W=32, multires=4, multires_view=2),
        refcolor=F.RefColorConfig(d_feature=64),
        material=EnvmapMaterialConfig(num_lgt_sgs=16, vis_nsamp=4),
        secondary_chunk=16384)


def tiny_params(cfg, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    return {
        "nerf": F.nerf_init(ks[0], cfg.nerf),
        "sdf": F.sdf_init(ks[1], cfg.sdf),
        "variance": F.variance_init(0.3),
        "color": F.rendering_init(ks[2], cfg.rendering),
        "ref_color": F.refcolor_init(ks[3], cfg.refcolor),
        "lvis": F.lvis_init(ks[4], cfg.lvis),
        "indirect": F.indirect_light_init(ks[5], cfg.indirect),
        "material": envmap_material_init(ks[6], cfg.material),
    }


def ring_cameras(n_views=4, H=24, W=32, radius=3.0):
    """(images, masks, intr_inv, poses) for cameras looking at the origin."""
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    intr = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
    intr[:, :3, :3] = K
    poses = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        c = np.array([radius * np.sin(ang), 0.0, -radius * np.cos(ang)],
                     np.float32)
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, -1.0, 0.0], np.float32)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = \
            right, up2, fwd, c
        poses.append(pose)
    poses = np.stack(poses)

    # analytic render of a gray sphere r=0.5 for target images
    images = np.zeros((n_views, H, W, 3), np.float32)
    masks = np.zeros((n_views, H, W, 3), np.float32)
    for i in range(n_views):
        ys, xs = np.mgrid[0:H, 0:W]
        p = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float32)
        cam = p @ np.linalg.inv(K).T
        cam /= np.linalg.norm(cam, axis=-1, keepdims=True)
        d = cam @ poses[i][:3, :3].T
        o = poses[i][:3, 3]
        b = 2 * (d @ o)
        c_ = (o @ o) - 0.25
        disc = b * b - 4 * c_
        hit = disc > 0
        t = (-b - np.sqrt(np.maximum(disc, 0))) / 2
        n = (o + t[..., None] * d)
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        shade = np.clip(-(n @ d[H // 2, W // 2]) * 0.0 +
                        np.clip(n[..., 1] * 0.5 + 0.5, 0, 1), 0, 1)
        img = np.where(hit[..., None], 0.2 + 0.6 * shade[..., None], 0.05)
        images[i] = img
        masks[i] = hit[..., None].astype(np.float32)

    return {
        "images": jnp.asarray(images),
        "masks": jnp.asarray(masks),
        "intr_inv": jnp.asarray(np.linalg.inv(intr)),
        "poses": jnp.asarray(poses),
    }
