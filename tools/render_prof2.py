"""Select/gather micro-variants for the rasterizer — real TPU.

Isolates the components of the 512 ms select+gather stage (round-5
profile): per-tile random gathers vs the per-tile id-merge sort vs
window overfetch, plus the flat entry-order gather + contiguous-slice
alternative.

Usage: python tools/render_prof2.py [n]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from gsconverter_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gsconverter_tpu.render.camera import Camera
from gsconverter_tpu.render.project import project_gaussians
from gsconverter_tpu.render.rasterizer import (
    R_SMALL_MAX, SPAN_MID, SPAN_SMALL, TILE, _classify, _tile_cover,
)
from tools.render_prof import bench_scene, sync, timeit


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    H, W = 1088, 1920
    cloud = bench_scene(n)
    cam = Camera.look_at(eye=[0, 0, 5.0], target=[0, 0, 0], fov_deg=60.0,
                         width=W, height=H)
    tw, th = W // TILE, H // TILE
    n_tiles = tw * th
    max_mid = 16384
    M = 1024
    n_glob = 32

    def binned(c):
        proj = project_gaussians(c.pos, c.log_scale, c.quat, cam)
        from gsconverter_tpu.ops import sh as sh_ops
        color = sh_ops.eval_sh(c, proj["view_dir"], 0)
        alpha = jax.nn.sigmoid(c.opacity)
        order = jnp.argsort(jnp.where(proj["in_front"], proj["depth"], jnp.inf))
        means2d = proj["means2d"][order]
        conic = proj["conic"][order]
        radius = proj["radius"][order]
        valid = proj["in_front"][order]
        color = jnp.clip(color[order], 0.0, None)
        alpha = alpha[order]
        small, keep_mid, glob = _classify(radius, valid, max_mid)
        cat = jnp.where(glob, jnp.uint8(0),
                        jnp.where(keep_mid, jnp.uint8(1), jnp.uint8(2)))
        cat_s, ids_cat = jax.lax.sort(
            (cat, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True)
        n_globc = jnp.sum(glob.astype(jnp.int32))
        ids_pad = jnp.concatenate([ids_cat, jnp.zeros(max_mid, jnp.int32)])
        sel_mid = jax.lax.dynamic_slice(ids_pad, (n_globc,), (max_mid,))
        mid_valid = jnp.arange(max_mid) < jnp.sum(keep_mid.astype(jnp.int32))
        tid_s, _ = _tile_cover(means2d, jnp.minimum(radius, R_SMALL_MAX),
                               small, tw, th, SPAN_SMALL)
        tid_m, _ = _tile_cover(means2d[sel_mid], radius[sel_mid], mid_valid,
                               tw, th, SPAN_MID)
        ids_s = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, 9)).reshape(-1)
        ids_m = jnp.broadcast_to(sel_mid[:, None], (max_mid, 49)).reshape(-1)
        sorted_tid, entry_splat = jax.lax.sort(
            (jnp.concatenate([tid_s.reshape(-1), tid_m.reshape(-1)]),
             jnp.concatenate([ids_s, ids_m])), num_keys=1, is_stable=True)
        sel_g = ids_cat[:n_glob]
        valid_g = cat_s[:n_glob] == 0
        return (sorted_tid, entry_splat, means2d, conic, color, alpha,
                sel_g, valid_g)

    def probe(kind):
        @jax.jit
        def f(c):
            (sorted_tid, entry_splat, means2d, conic, color, alpha,
             sel_g, valid_g) = binned(c)

            def body(tile_idx):
                start = jnp.searchsorted(sorted_tid, tile_idx, side="left")
                end = jnp.searchsorted(sorted_tid, tile_idx, side="right")
                idx = start[:, None] + jnp.arange(M)[None, :]
                w_valid = idx < end[:, None]
                idx = jnp.clip(idx, 0, sorted_tid.shape[0] - 1)
                ids = jnp.where(w_valid, entry_splat[idx], n)
                if kind != "nosort":
                    ids_g = jnp.where(valid_g[None, :], sel_g[None, :], n)
                    ids = jnp.concatenate(
                        [jnp.broadcast_to(ids_g, (tile_idx.shape[0], n_glob)),
                         ids], axis=1)
                    ids = jnp.sort(ids, axis=1)
                sel = jnp.clip(ids, 0, n - 1)
                sv = ids < n
                if kind == "alpha_only":
                    return jnp.where(sv, alpha[sel], 0.0).sum()
                return (means2d[sel].sum() + conic[sel].sum()
                        + color[sel].sum()
                        + jnp.where(sv, alpha[sel], 0.0).sum())

            chunks = -(-n_tiles // 128)
            tid = jnp.concatenate(
                [jnp.arange(n_tiles),
                 jnp.zeros(chunks * 128 - n_tiles, jnp.int32)])
            return jax.lax.map(body, tid.reshape(chunks, 128)).sum()
        return f

    @jax.jit
    def probe_entry_gather(c):
        """Flat entry-order gather + per-tile CONTIGUOUS slices."""
        (sorted_tid, entry_splat, means2d, conic, color, alpha,
         sel_g, valid_g) = binned(c)
        E = 4 * n  # static cap on live entries
        ent = entry_splat[:E]
        ent_valid = sorted_tid[:E] < n_tiles
        cols = [means2d[:, 0], means2d[:, 1], conic[:, 0], conic[:, 1],
                conic[:, 2], color[:, 0], color[:, 1], color[:, 2]]
        ent_cols = [col[ent] for col in cols]
        ent_a = jnp.where(ent_valid, alpha[ent], 0.0)

        def body(tile_idx):
            start = jnp.searchsorted(sorted_tid, tile_idx, side="left")
            start = jnp.minimum(start, E - M)

            def sl(col):
                return jax.vmap(
                    lambda s: jax.lax.dynamic_slice(col, (s,), (M,)))(start)

            acc = sum(sl(cc).sum() for cc in ent_cols) + sl(ent_a).sum()
            return acc

        chunks = -(-n_tiles // 128)
        tid = jnp.concatenate(
            [jnp.arange(n_tiles), jnp.zeros(chunks * 128 - n_tiles, jnp.int32)])
        return jax.lax.map(body, tid.reshape(chunks, 128)).sum()

    @jax.jit
    def probe_entry_gather_only(c):
        (sorted_tid, entry_splat, means2d, conic, color, alpha,
         sel_g, valid_g) = binned(c)
        E = 4 * n
        ent = entry_splat[:E]
        acc = (means2d[:, 0][ent].sum() + means2d[:, 1][ent].sum()
               + conic[:, 0][ent].sum() + conic[:, 1][ent].sum()
               + conic[:, 2][ent].sum() + color[:, 0][ent].sum()
               + color[:, 1][ent].sum() + color[:, 2][ent].sum()
               + alpha[ent].sum())
        return acc

    for name, f in [
        ("full probe (sort+4 gathers)", probe("full")),
        ("no glob-merge sort", probe("nosort")),
        ("alpha only (1 gather)", probe("alpha_only")),
        ("entry gather + slices", probe_entry_gather),
        ("entry gather only (9x1D)", probe_entry_gather_only),
    ]:
        t = timeit(lambda f=f: sync(f(cloud)))
        print(f"{name:28s} {t * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
