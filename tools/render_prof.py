"""Rasterizer stage profiler — runs on the real TPU chip.

Times the forward's pipeline stages separately (cumulative jitted
prefixes, so each stage includes realistic fusion context) plus the full
forward/backward at several configs.  The published stage budget in
PERFORMANCE.md (VERDICT r4 item 2: "no rasterizer roofline") comes from
this tool.

Usage: python tools/render_prof.py [n] [H] [W]
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

from gsconverter_tpu.cloud import SplatCloud
from gsconverter_tpu.ops import sh as sh_ops
from gsconverter_tpu.render.camera import Camera
from gsconverter_tpu.render.project import project_gaussians
from gsconverter_tpu.render.rasterizer import (
    R_SMALL_MAX, SPAN_MID, SPAN_SMALL, TILE, _classify, _tile_cover,
    auto_budget, render,
)


def sync(x):
    if x.dtype == bool:
        x = x.astype(jnp.int32)
    return float(jnp.sum(x))


def timeit(f, iters=3):
    f()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_scene(n, seed=0):
    rr = np.random.default_rng(seed)
    return SplatCloud(
        pos=jnp.asarray(rr.normal(0, 1.0, (n, 3)).astype(np.float32)),
        sh_dc=jnp.asarray(rr.normal(0, 0.5, (n, 3)).astype(np.float32)),
        sh_rest=jnp.zeros((n, 3, 15), jnp.float32),
        opacity=jnp.asarray(rr.normal(-1, 1, (n,)).astype(np.float32)),
        log_scale=jnp.asarray(rr.normal(-5.5, 0.3, (n, 3)).astype(np.float32)),
        quat=jnp.asarray(np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))),
        normal=jnp.zeros((n, 3), jnp.float32),
        active_sh_degree=0,
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1088
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    cloud = bench_scene(n)
    cam = Camera.look_at(eye=[0, 0, 5.0], target=[0, 0, 0], fov_deg=60.0,
                         width=W, height=H)
    tw, th = W // TILE, H // TILE
    n_tiles = tw * th
    max_mid = 16384

    # ---- cumulative prefix stages ----
    @jax.jit
    def s_project(c):
        proj = project_gaussians(c.pos, c.log_scale, c.quat, cam)
        color = sh_ops.eval_sh(c, proj["view_dir"], 0)
        return proj["means2d"].sum() + color.sum()

    def binned_parts(c):
        proj = project_gaussians(c.pos, c.log_scale, c.quat, cam)
        color = jnp.clip(sh_ops.eval_sh(c, proj["view_dir"], 0), 0.0, None)
        alpha = jax.nn.sigmoid(c.opacity)
        means2d = proj["means2d"]
        conic = proj["conic"]
        radius = proj["radius"]
        valid = proj["in_front"]
        depth_key = jnp.where(valid, proj["depth"], jnp.inf)
        small, keep_mid, glob = _classify(radius, valid, max_mid)
        cat = jnp.where(glob, jnp.uint8(0),
                        jnp.where(keep_mid, jnp.uint8(1), jnp.uint8(2)))
        cat_s, _, ids_cat = jax.lax.sort(
            (cat, depth_key, jnp.arange(n, dtype=jnp.int32)),
            num_keys=2, is_stable=False)
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
        dep_s = jnp.broadcast_to(depth_key[:, None], (n, 9)).reshape(-1)
        dep_m = jnp.broadcast_to(
            depth_key[sel_mid][:, None], (max_mid, 49)).reshape(-1)
        valid_g = cat_s[:32] == 0
        sel_g = ids_cat[:32]
        tid_g = jnp.where(
            valid_g[None, :], jnp.arange(n_tiles, dtype=jnp.int32)[:, None],
            n_tiles).reshape(-1)
        ids_g = jnp.broadcast_to(sel_g[None, :], (n_tiles, 32)).reshape(-1)
        dep_g = jnp.broadcast_to(
            depth_key[sel_g][None, :], (n_tiles, 32)).reshape(-1)
        sorted_tid, _, entry_splat = jax.lax.sort(
            (jnp.concatenate([tid_s.reshape(-1), tid_m.reshape(-1), tid_g]),
             jnp.concatenate([dep_s, dep_m, dep_g]),
             jnp.concatenate([ids_s, ids_m, ids_g])),
            num_keys=2, is_stable=False)
        return sorted_tid, entry_splat, means2d, conic, color, alpha

    @jax.jit
    def s_binned(c):
        sorted_tid, entry_splat, *_ = binned_parts(c)
        return sorted_tid.sum() + entry_splat.sum()

    def s_gather_fn(budget):
        @jax.jit
        def f(c):
            (sorted_tid, entry_splat, means2d, conic, color,
             alpha) = binned_parts(c)
            packed = jnp.concatenate([means2d, conic, color], axis=1)

            def body(tile_idx):
                start = jnp.searchsorted(sorted_tid, tile_idx, side="left")
                end = jnp.searchsorted(sorted_tid, tile_idx, side="right")
                idx = start[:, None] + jnp.arange(budget)[None, :]
                w_valid = idx < end[:, None]
                idx = jnp.clip(idx, 0, sorted_tid.shape[0] - 1)
                ids = jnp.where(w_valid, entry_splat[idx], n)
                sel = jnp.clip(ids, 0, n - 1)
                sv = ids < n
                g = packed[sel]  # one row gather (round-5: per-ROW cost)
                return g.sum() + jnp.where(sv, alpha[sel], 0.0).sum()

            chunks = -(-n_tiles // 128)
            tid = jnp.concatenate(
                [jnp.arange(n_tiles), jnp.zeros(chunks * 128 - n_tiles, jnp.int32)])
            return jax.lax.map(body, tid.reshape(chunks, 128)).sum()
        return f

    print(f"scene n={n} {H}x{W}", flush=True)
    t0 = time.perf_counter()
    b = auto_budget(cloud, cam, band_chunk=128)
    print(f"auto_budget: {time.perf_counter() - t0:.2f}s "
          f"{ {k: v for k, v in b.items() if k not in ('tile_order', 'band_plan')} }",
          flush=True)
    print(f"band_plan: {b['band_plan']}", flush=True)

    t_proj = timeit(lambda: sync(s_project(cloud)))
    print(f"project+SH:            {t_proj * 1e3:7.1f} ms", flush=True)
    t_bin = timeit(lambda: sync(s_binned(cloud)))
    print(f"+class+key build+sort: {t_bin * 1e3:7.1f} ms (no attr gathers)",
          flush=True)
    g = s_gather_fn(b["max_per_tile"])
    t_gath = timeit(lambda: sync(g(cloud)))
    print(f"+select+cand gathers:  {t_gath * 1e3:7.1f} ms (flat budget "
          f"{b['max_per_tile']})", flush=True)

    kw_flat = dict(binning="windowed", max_per_tile=b["max_per_tile"],
                   max_global=b["max_global"], tile_chunk=128, block_m=64)
    f_flat = jax.jit(lambda c: jnp.sum(render(c, cam, **kw_flat)))
    t_fwd_flat = timeit(lambda: sync(f_flat(cloud)))
    print(f"forward (flat):        {t_fwd_flat * 1e3:7.1f} ms", flush=True)

    order_dev = jnp.asarray(b["tile_order"])
    kw_band = dict(binning="windowed", max_global=b["max_global"],
                   tile_chunk=128, block_m=64, band_plan=b["band_plan"])
    f_band = jax.jit(lambda c: jnp.sum(
        render(c, cam, tile_order=order_dev, **kw_band)))
    t_fwd_band = timeit(lambda: sync(f_band(cloud)))
    print(f"forward (banded):      {t_fwd_band * 1e3:7.1f} ms", flush=True)

    def loss_flat(op):
        return jnp.sum(render(cloud.replace(opacity=op), cam, **kw_flat) ** 2)

    g_flat = jax.jit(jax.grad(loss_flat))
    t_bwd_flat = timeit(lambda: sync(g_flat(cloud.opacity)))
    print(f"fwd+bwd (flat):        {t_bwd_flat * 1e3:7.1f} ms", flush=True)

    def loss_band(op):
        return jnp.sum(render(cloud.replace(opacity=op), cam,
                              tile_order=order_dev, **kw_band) ** 2)

    g_band = jax.jit(jax.grad(loss_band))
    t_bwd_band = timeit(lambda: sync(g_band(cloud.opacity)))
    print(f"fwd+bwd (banded):      {t_bwd_band * 1e3:7.1f} ms", flush=True)

    tot = t_fwd_band + t_bwd_band
    print(f"TOTAL banded fwd + (fwd+bwd): {tot:.3f} s -> "
          f"{n / tot / 1e6:.2f} Msplats/s", flush=True)

    # ---- config sweep (banded) ----
    for remat, tc, bm in [(False, 128, 64), (True, 256, 64), (True, 128, 128),
                          (False, 256, 64)]:
        try:
            b2 = auto_budget(cloud, cam, band_chunk=tc)
            od = jnp.asarray(b2["tile_order"])
            kw2 = dict(binning="windowed", max_global=b2["max_global"],
                       tile_chunk=tc, block_m=bm, remat=remat,
                       band_plan=b2["band_plan"])
            ff = jax.jit(lambda c: jnp.sum(render(c, cam, tile_order=od, **kw2)))
            tf = timeit(lambda: sync(ff(cloud)))

            def lb(op):
                return jnp.sum(render(cloud.replace(opacity=op), cam,
                                      tile_order=od, **kw2) ** 2)

            gb = jax.jit(jax.grad(lb))
            tb = timeit(lambda: sync(gb(cloud.opacity)))
            tot2 = tf + tb
            print(f"remat={remat} tc={tc} bm={bm}: fwd {tf * 1e3:6.1f} ms, "
                  f"fwd+bwd {tb * 1e3:7.1f} ms, total {tot2:.3f} s -> "
                  f"{n / tot2 / 1e6:.2f} Msplats/s", flush=True)
        except Exception as e:
            print(f"remat={remat} tc={tc} bm={bm}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
