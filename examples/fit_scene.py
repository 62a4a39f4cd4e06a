"""End-to-end demo: render a procedural scene, perturb it, and recover the
splat parameters by gradient descent through the tile rasterizer.

    python examples/fit_scene.py [out_dir]

Writes target / perturbed / fitted renders as PNGs and prints PSNRs.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def build_scene(n=600, seed=3):
    import jax.numpy as jnp

    from gsconverter_tpu.cloud import SplatCloud

    r = np.random.default_rng(seed)
    # a colorful ring of gaussians plus a core cluster
    t = np.linspace(0, 2 * np.pi, n // 2, endpoint=False)
    ring = np.stack([np.cos(t) * 1.5, np.sin(t) * 1.5, np.zeros_like(t)], 1)
    core = r.normal(0, 0.4, (n - n // 2, 3))
    pos = np.concatenate([ring, core]).astype(np.float32)
    hue = np.concatenate([t / (2 * np.pi), r.uniform(0, 1, n - n // 2)])
    sh_dc = np.stack(
        [np.cos(hue * 2 * np.pi), np.cos((hue + 1 / 3) * 2 * np.pi),
         np.cos((hue + 2 / 3) * 2 * np.pi)], 1
    ).astype(np.float32)
    quat = r.normal(0, 1, (n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    return SplatCloud(
        pos=jnp.asarray(pos),
        sh_dc=jnp.asarray(sh_dc),
        sh_rest=jnp.zeros((n, 3, 15), jnp.float32),
        opacity=jnp.full((n,), 1.5, jnp.float32),
        log_scale=jnp.full((n, 3), -2.5, jnp.float32),
        quat=jnp.asarray(quat),
        normal=jnp.zeros((n, 3), jnp.float32),
        active_sh_degree=0,
    )


def save_png(path, img):
    from PIL import Image

    arr = np.clip(np.asarray(img) * 255, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def main(out_dir="examples/out"):
    import jax.numpy as jnp

    from gsconverter_tpu.render import Camera, psnr, render
    from gsconverter_tpu.render.train import fit
    from gsconverter_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(out_dir, exist_ok=True)

    cloud = build_scene()
    cam = Camera.look_at(eye=(0, -1.5, -5), target=(0, 0, 0), width=256, height=256)
    target = render(cloud, cam, max_per_tile=256)
    save_png(f"{out_dir}/target.png", target)

    r = np.random.default_rng(0)
    perturbed = cloud.replace(
        pos=cloud.pos + jnp.asarray(r.normal(0, 0.05, cloud.pos.shape).astype(np.float32)),
        sh_dc=cloud.sh_dc * 0.5,
        opacity=cloud.opacity - 1.0,
    )
    img0 = render(perturbed, cam, max_per_tile=256)
    save_png(f"{out_dir}/perturbed.png", img0)
    p0 = float(psnr(img0, target))

    fitted, losses = fit(perturbed, cam, target, steps=200, lr=5e-3, max_per_tile=256)
    img1 = render(fitted, cam, max_per_tile=256)
    save_png(f"{out_dir}/fitted.png", img1)
    p1 = float(psnr(img1, target))

    print(f"PSNR perturbed -> target: {p0:.2f} dB")
    print(f"PSNR fitted    -> target: {p1:.2f} dB  (loss {losses[0]:.5f} -> {losses[-1]:.5f})")
    assert p1 > p0 + 5, "optimization should substantially improve PSNR"


if __name__ == "__main__":
    main(*sys.argv[1:])
