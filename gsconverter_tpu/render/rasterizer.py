"""Tile-binned differentiable Gaussian-splat rasterizer.

New capability vs the reference (SURVEY.md: "There is no renderer"); the
verification north star from BASELINE.json — every conversion/filter is
checked by rendered PSNR and pixel-gradient allclose, not byte diffs.

TPU-first design (fixed shapes, fused under jit, fully differentiable):
  1. project all splats (render/project.py) and depth-sort them globally;
  2. bin: for every 16x16 tile select the first ``max_per_tile`` overlapping
     splats in depth order — a static top-k over a [tiles, N] score, no
     dynamic lists;
  3. per-tile alpha compositing via exclusive cumprod of (1 - alpha) along
     the depth axis — the "over" operator expressed associatively, which (a)
     autodiffs cleanly (pixel gradients w.r.t. opacity/SH/covariance flow
     through cumprod) and (b) makes multi-chip compositing a fold over
     depth-ordered shards (parallel/distributed.py).
Tiles are processed in chunks with ``lax.map`` to bound memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..cloud import SplatCloud
from ..ops import sh as sh_ops
from .camera import Camera
from .project import project_gaussians

TILE = 16
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


@functools.partial(
    jax.jit,
    static_argnames=("max_per_tile", "tile_chunk", "sh_degree", "binning",
                     "max_global", "remat"),
)
def render(
    cloud: SplatCloud,
    cam: Camera,
    bg: jax.Array | None = None,
    max_per_tile: int = 256,
    tile_chunk: int = 16,
    sh_degree: int | None = None,
    binning: str = "windowed",
    max_global: int = 32,
    remat: bool = True,
) -> jax.Array:
    """Render [H,W,3] linear-RGB image. Differentiable w.r.t. all splat params.

    binning="windowed": production path (default) — each splat emits keys for
                        up to 36 covered tiles, one stable sort groups keys
                        by tile in depth order, per-tile candidate windows
                        are fixed [max_per_tile] slices.  O(36N log N)
                        instead of O(tiles*N).  Splats wider than 2 tiles
                        escape to a global candidate list (front-most
                        ``max_global`` by depth) merged into every tile's
                        window, so near-camera giants keep their full
                        footprint instead of being truncated at 6x6 tiles.
    binning="exact":    per-tile overlap over ALL splats (O(tiles*N) select) —
                        the verification oracle path.
    """
    h, w = cam.height, cam.width
    assert h % TILE == 0 and w % TILE == 0, "image dims must be multiples of 16"
    tw, th = w // TILE, h // TILE
    n_tiles = tw * th
    n = cloud.pos.shape[0]
    max_per_tile = min(max_per_tile, n)
    if bg is None:
        bg = jnp.zeros(3)

    proj = project_gaussians(cloud.pos, cloud.log_scale, cloud.quat, cam)
    color = sh_ops.eval_sh(
        cloud, proj["view_dir"],
        cloud.active_sh_degree if sh_degree is None else sh_degree,
    )  # [N,3] linear
    alpha = jax.nn.sigmoid(cloud.opacity)

    # ---- global depth sort (front first) ----
    order = jnp.argsort(jnp.where(proj["in_front"], proj["depth"], jnp.inf))
    means2d = proj["means2d"][order]
    conic = proj["conic"][order]
    radius = proj["radius"][order]
    valid = proj["in_front"][order]
    color = jnp.clip(color[order], 0.0, None)
    alpha = alpha[order]

    # ---- tile binning: first max_per_tile overlapping splats per tile ----
    tx = jnp.arange(n_tiles) % tw
    ty = jnp.arange(n_tiles) // tw
    x0 = (tx * TILE).astype(jnp.float32)
    y0 = (ty * TILE).astype(jnp.float32)
    # overlap of splat bbox [mean±r] with tile AABB
    lo_x = means2d[:, 0] - radius
    hi_x = means2d[:, 0] + radius
    lo_y = means2d[:, 1] - radius
    hi_y = means2d[:, 1] + radius

    if binning == "windowed":
        span = 6  # tiles per axis a windowed splat may cover
        big = valid & (radius > 2.0 * TILE)  # escape to the global list
        small = valid & ~big
        radius_c = jnp.minimum(radius, 2.0 * TILE)
        tx0i = jnp.clip(jnp.floor((means2d[:, 0] - radius_c) / TILE), 0, tw - 1).astype(jnp.int32)
        tx1i = jnp.clip(jnp.floor((means2d[:, 0] + radius_c) / TILE), 0, tw - 1).astype(jnp.int32)
        ty0i = jnp.clip(jnp.floor((means2d[:, 1] - radius_c) / TILE), 0, th - 1).astype(jnp.int32)
        ty1i = jnp.clip(jnp.floor((means2d[:, 1] + radius_c) / TILE), 0, th - 1).astype(jnp.int32)
        offs = jnp.stack(
            jnp.meshgrid(jnp.arange(span), jnp.arange(span), indexing="ij"), -1
        ).reshape(-1, 2)  # [36,2] (dy,dx)
        txs = tx0i[:, None] + offs[None, :, 1]
        tys = ty0i[:, None] + offs[None, :, 0]
        covered = (
            (txs <= tx1i[:, None]) & (tys <= ty1i[:, None]) & small[:, None]
        )
        tid = jnp.where(covered, tys * tw + txs, n_tiles)  # sentinel = n_tiles
        flat_tid = tid.reshape(-1)  # depth-major order
        order2 = jnp.argsort(flat_tid)  # stable: preserves depth order per tile
        sorted_tid = flat_tid[order2]
        entry_splat = order2 // (span * span)  # entry -> splat index (depth rank)
        # global candidates: front-most max_global big splats (depth rank
        # ascending); their Gaussian falloff bounds them spatially, the
        # binning doesn't have to
        n_glob = min(max_global, n)
        score_g = jnp.where(big, -jnp.arange(n, dtype=jnp.float32), -jnp.inf)
        _, sel_g = jax.lax.top_k(score_g, n_glob)  # ascending depth
        valid_g = jnp.take(big, sel_g)

    def select_exact(tile_idx):
        tx0 = x0[tile_idx]  # [C]
        ty0 = y0[tile_idx]
        overlap = (
            (hi_x[None, :] >= tx0[:, None])
            & (lo_x[None, :] <= tx0[:, None] + TILE)
            & (hi_y[None, :] >= ty0[:, None])
            & (lo_y[None, :] <= ty0[:, None] + TILE)
            & valid[None, :]
        )  # [C, N]
        # first max_per_tile in depth order: score = -index where overlapping
        score = jnp.where(overlap, -jnp.arange(n, dtype=jnp.float32)[None, :], -jnp.inf)
        _, sel = jax.lax.top_k(score, max_per_tile)  # [C, M] ascending depth
        sel_valid = jnp.take_along_axis(overlap, sel, axis=1)  # [C, M]
        return sel, sel_valid

    def select_windowed(tile_idx):
        start = jnp.searchsorted(sorted_tid, tile_idx, side="left")
        end = jnp.searchsorted(sorted_tid, tile_idx, side="right")
        idx = start[:, None] + jnp.arange(max_per_tile)[None, :]
        w_valid = idx < end[:, None]
        idx = jnp.clip(idx, 0, sorted_tid.shape[0] - 1)
        # merge the global (big-splat) candidates in depth order: candidate
        # ids ARE depth ranks, so one sort of the concatenated id lists
        # restores front-to-back order (sentinel n sorts to the tail)
        ids_w = jnp.where(w_valid, entry_splat[idx], n)
        ids_g = jnp.where(valid_g[None, :], sel_g[None, :], n)
        ids = jnp.concatenate(
            [jnp.broadcast_to(ids_g, (tile_idx.shape[0], n_glob)), ids_w],
            axis=1,
        )
        ids = jnp.sort(ids, axis=1)
        return jnp.clip(ids, 0, n - 1), ids < n

    def bin_and_render(tile_idx):
        # tile_idx: [C] chunk of tile ids
        tx0 = x0[tile_idx]  # [C]
        ty0 = y0[tile_idx]
        if binning == "windowed":
            sel, sel_valid = select_windowed(tile_idx)
        else:
            sel, sel_valid = select_exact(tile_idx)

        g_mean = means2d[sel]  # [C,M,2]
        g_conic = conic[sel]
        g_color = color[sel]  # [C,M,3]
        g_alpha = jnp.where(sel_valid, alpha[sel], 0.0)

        # pixel grid for each tile [C, TILE*TILE, 2]
        px = jnp.arange(TILE, dtype=jnp.float32) + 0.5
        gx = tx0[:, None, None] + px[None, None, :]  # [C,1,T]
        gy = ty0[:, None, None] + px[None, None, :]
        gx = jnp.broadcast_to(gx, (tile_idx.shape[0], TILE, TILE)).reshape(-1, TILE * TILE)
        gy = jnp.broadcast_to(
            ty0[:, None, None] + px[None, :, None], (tile_idx.shape[0], TILE, TILE)
        ).reshape(-1, TILE * TILE)

        dx = gx[:, None, :] - g_mean[:, :, 0:1]  # [C,M,P]
        dy = gy[:, None, :] - g_mean[:, :, 1:2]
        power = -0.5 * (
            g_conic[:, :, 0:1] * dx * dx
            + 2.0 * g_conic[:, :, 1:2] * dx * dy
            + g_conic[:, :, 2:3] * dy * dy
        )
        a = jnp.minimum(g_alpha[:, :, None] * jnp.exp(jnp.minimum(power, 0.0)), ALPHA_MAX)
        a = jnp.where(a < ALPHA_MIN, 0.0, a)  # [C,M,P]
        # exclusive cumprod of transmittance along depth
        trans = jnp.cumprod(1.0 - a, axis=1)
        t_prev = jnp.concatenate(
            [jnp.ones_like(trans[:, :1, :]), trans[:, :-1, :]], axis=1
        )
        wgt = a * t_prev  # [C,M,P]
        rgb = jnp.einsum("cmp,cmk->cpk", wgt, g_color)  # [C,P,3]
        t_final = trans[:, -1, :]  # [C,P]
        rgb = rgb + t_final[:, :, None] * bg[None, None, :]
        return rgb.reshape(-1, TILE, TILE, 3)

    chunks = n_tiles // tile_chunk if n_tiles % tile_chunk == 0 else -(-n_tiles // tile_chunk)
    pad_tiles = chunks * tile_chunk - n_tiles
    tile_ids = jnp.concatenate([jnp.arange(n_tiles), jnp.zeros(pad_tiles, jnp.int32)])
    # remat the per-chunk body: free in forward-only evaluation, and the
    # backward re-renders each tile chunk instead of saving its [C,M,P]
    # weight tensors — without it the 1M-splat 1080p gradient program is
    # large enough to crash the TPU compiler
    body = jax.checkpoint(bin_and_render) if remat else bin_and_render
    tiles = jax.lax.map(body, tile_ids.reshape(chunks, tile_chunk))
    tiles = tiles.reshape(-1, TILE, TILE, 3)[:n_tiles]  # [T, 16,16,3]
    img = tiles.reshape(th, tw, TILE, TILE, 3).transpose(0, 2, 1, 3, 4).reshape(h, w, 3)
    return img


@functools.partial(jax.jit, static_argnames=("sh_degree",))
def render_reference(cloud: SplatCloud, cam: Camera, bg=None, sh_degree=None):
    """Naive per-pixel-over-all-splats renderer (no binning, no budget).

    The ground-truth oracle for verifying the tiled renderer's forward and
    pixel gradients (BASELINE config 4).  O(H*W*N) — tiny scenes only.
    """
    h, w = cam.height, cam.width
    n = cloud.pos.shape[0]
    if bg is None:
        bg = jnp.zeros(3)
    proj = project_gaussians(cloud.pos, cloud.log_scale, cloud.quat, cam)
    color = jnp.clip(
        sh_ops.eval_sh(
            cloud, proj["view_dir"],
            cloud.active_sh_degree if sh_degree is None else sh_degree,
        ),
        0.0, None,
    )
    alpha = jax.nn.sigmoid(cloud.opacity)
    order = jnp.argsort(jnp.where(proj["in_front"], proj["depth"], jnp.inf))
    means2d = proj["means2d"][order]
    conic = proj["conic"][order]
    valid = proj["in_front"][order]
    color = color[order]
    alpha = jnp.where(valid, alpha[order], 0.0)

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) + 0.5,
        jnp.arange(w, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=1)  # [P,2]

    dx = pix[None, :, 0] - means2d[:, 0:1]
    dy = pix[None, :, 1] - means2d[:, 1:2]
    power = -0.5 * (
        conic[:, 0:1] * dx * dx + 2.0 * conic[:, 1:2] * dx * dy + conic[:, 2:3] * dy * dy
    )
    a = jnp.minimum(alpha[:, None] * jnp.exp(jnp.minimum(power, 0.0)), ALPHA_MAX)
    a = jnp.where(a < ALPHA_MIN, 0.0, a)  # [N,P]
    trans = jnp.cumprod(1.0 - a, axis=0)
    t_prev = jnp.concatenate([jnp.ones_like(trans[:1]), trans[:-1]], axis=0)
    wgt = a * t_prev
    rgb = jnp.einsum("np,nk->pk", wgt, color) + trans[-1][:, None] * bg[None, :]
    return rgb.reshape(h, w, 3)


def psnr(a: jax.Array, b: jax.Array, peak: float = 1.0) -> jax.Array:
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(mse, 1e-12))
