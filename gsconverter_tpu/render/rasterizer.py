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
import numpy as np

from ..cloud import SplatCloud
from ..ops import sh as sh_ops
from .camera import Camera
from .project import project_gaussians

TILE = 16
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def _block_alpha(g_mean, g_conic, g_alpha, gx, gy):
    """Per-candidate alpha field over the tile pixels [C,BM,P] (+aux)."""
    dx = gx[:, None, :] - g_mean[:, :, 0:1]
    dy = gy[:, None, :] - g_mean[:, :, 1:2]
    power = -0.5 * (
        g_conic[:, :, 0:1] * dx * dx
        + 2.0 * g_conic[:, :, 1:2] * dx * dy
        + g_conic[:, :, 2:3] * dy * dy
    )
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    raw = g_alpha[:, :, None] * gauss
    a = jnp.minimum(raw, ALPHA_MAX)
    a = jnp.where(a < ALPHA_MIN, 0.0, a)
    return a, raw, gauss, power, dx, dy


# chunk-level saturation threshold: once every pixel's transmittance in the
# chunk is below this, the remaining (deeper) candidates cannot change the
# image by more than T_EPS — stop.  Bounded truncation error ~80 dB PSNR.
T_EPS = 1e-4
# safety factor on the saturation-depth budget's per-candidate effective
# alpha (auto_budget): the model uses the MEAN-pixel occlusion
# alpha * footprint_integral / covered_pixels (the Gaussian's integrated
# footprint 2*pi*sigma^2 spread over the tiles it covers), then halves it
# — applied exactly ONCE (round-4 applied it in both the per-entry alpha
# and the log-transmittance term, making the effective factor 0.25) — so
# unlucky pixels that see less than the mean still saturate before the
# budget cuts.  A flat coverage factor (round-4 first draft, 0.25 of peak
# alpha) overestimated occlusion ~20x for pixel-scale splats and cost
# 25 dB on the zoomed crop check.
GAMMA_COVER = 0.5

# Binning tiers (windowed path).  A splat's tile span is ceil-bounded by
# its radius: radius <= TILE covers at most 3 tiles/axis, radius <=
# 3*TILE at most 7.  Smalls (the overwhelming majority) pay 9 key slots;
# mids are first COMPACTED to a fixed capacity (they are rare — ~0.1% of
# the 1M bench scene) and pay 49 slots only on that compact set; only
# radius > 3*TILE giants (plus mid-capacity overflow) escape to the
# global per-tile merged list.  Round 4 escaped everything > 1 tile to a
# 256-cap global list and truncated 1082 of 1338 such splats on the bench
# scene — the crop-PSNR ceiling.
R_SMALL_MAX = 1.0 * TILE
R_MID_MAX = 3.0 * TILE
SPAN_SMALL = 3
SPAN_MID = 7


def _tile_cover(means2d, radius, active, tw, th, span):
    """Covered-tile ids for each splat over a span x span window.

    Returns (tid [N, span*span] with sentinel tw*th on uncovered slots,
    n_cov [N] covered-tile counts).  ``active`` masks splats out entirely.

    Coverage is the splat's DISK (center, radius) against each tile's
    AABB — the nearest-point-in-rect test prunes the corner tiles a bbox
    overlap would keep (~15-25% of entries for 2x2-span splats; every
    pruned entry saves its ~7.3 ns/column share of the window gathers,
    round-5 micro-profile).  Conservative for anisotropic splats (radius
    is the major-axis 3-sigma bound).
    """
    n_tiles = tw * th
    tx0i = jnp.clip(jnp.floor((means2d[:, 0] - radius) / TILE), 0, tw - 1).astype(jnp.int32)
    tx1i = jnp.clip(jnp.floor((means2d[:, 0] + radius) / TILE), 0, tw - 1).astype(jnp.int32)
    ty0i = jnp.clip(jnp.floor((means2d[:, 1] - radius) / TILE), 0, th - 1).astype(jnp.int32)
    ty1i = jnp.clip(jnp.floor((means2d[:, 1] + radius) / TILE), 0, th - 1).astype(jnp.int32)
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(span), jnp.arange(span), indexing="ij"), -1
    ).reshape(-1, 2)  # [span^2, 2] (dy, dx)
    txs = tx0i[:, None] + offs[None, :, 1]
    tys = ty0i[:, None] + offs[None, :, 0]
    # nearest point of the tile AABB to the splat center
    ndx = jnp.clip(means2d[:, 0:1], txs * TILE, (txs + 1) * TILE) - means2d[:, 0:1]
    ndy = jnp.clip(means2d[:, 1:2], tys * TILE, (tys + 1) * TILE) - means2d[:, 1:2]
    in_disk = ndx * ndx + ndy * ndy <= (radius * radius)[:, None]
    covered = (
        (txs <= tx1i[:, None]) & (tys <= ty1i[:, None]) & in_disk
        & active[:, None]
    )
    tid = jnp.where(covered, tys * tw + txs, n_tiles)
    n_cov = jnp.sum(covered.astype(jnp.int32), axis=1)
    return tid, n_cov


def _classify(radius, valid, max_mid):
    """Split splats into small / retained-mid / global tiers.

    Returns (small, keep_mid, glob) boolean masks.  ``glob`` = true giants
    (radius > R_MID_MAX) plus mids beyond the ``max_mid`` compaction
    capacity (capacity selection is array-order — overflow only occurs on
    pathological scenes with >max_mid multi-tile splats, and overflow mids
    still reach every tile through the depth-prioritized global list)."""
    small = valid & (radius <= R_SMALL_MAX)
    mid = valid & (radius > R_SMALL_MAX) & (radius <= R_MID_MAX)
    giant = valid & (radius > R_MID_MAX)
    mid_rank = jnp.cumsum(mid.astype(jnp.int32)) - 1
    keep_mid = mid & (mid_rank < max_mid)
    glob = giant | (mid & ~keep_mid)
    return small, keep_mid, glob


def _composite_fwd_impl(bm, g_mean, g_conic, g_color, g_alpha, gx, gy, bg,
                        n_valid_max):
    c_sz, m = g_alpha.shape
    nb = m // bm
    # n_valid_max arrives as f32 (custom_vjp cotangents for ints are
    # float0, which the bwd tuple can't express); floor-div then cast
    nb_needed = jnp.minimum(((n_valid_max + bm - 1) // bm).astype(jnp.int32),
                            nb)
    P = gx.shape[1]
    resh = lambda x: x.reshape(c_sz, nb, bm, *x.shape[2:]).swapaxes(0, 1)
    mb_, cb_, colb_, ab_ = (resh(g_mean), resh(g_conic), resh(g_color),
                            resh(g_alpha))
    take = lambda x, b: jax.lax.dynamic_index_in_dim(x, b, 0, keepdims=False)

    # while_loop with EARLY TERMINATION: candidates are depth-ordered, so
    # once the chunk saturates the loop exits — measured ~3x on the 1M
    # bench scene vs running all m/bm blocks (most tiles saturate within
    # a fraction of the honest ~1024-candidate budget)
    def cond(state):
        b, rgb, trans, t_starts = state
        return (b < nb_needed) & (jnp.max(trans) > T_EPS)

    def body(state):
        b, rgb, trans, t_starts = state
        a, _, _, _, _, _ = _block_alpha(take(mb_, b), take(cb_, b),
                                        take(ab_, b), gx, gy)
        tb = jnp.cumprod(1.0 - a, axis=1)
        t_prev = jnp.concatenate([jnp.ones_like(tb[:, :1]), tb[:, :-1]], axis=1)
        wgt = a * t_prev * trans[:, None, :]
        rgb = rgb + jnp.einsum("cmp,cmk->cpk", wgt, take(colb_, b))
        t_starts = jax.lax.dynamic_update_index_in_dim(
            t_starts, trans, b, 0)
        return (b + 1, rgb, trans * tb[:, -1, :], t_starts)

    state = (0, jnp.zeros((c_sz, P, 3)), jnp.ones((c_sz, P)),
             jnp.zeros((nb, c_sz, P)))
    n_done, rgb, t_final, t_starts = jax.lax.while_loop(cond, body, state)
    rgb = rgb + t_final[:, :, None] * bg[None, None, :]
    return rgb, t_starts, t_final, n_done


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _composite(bm, g_mean, g_conic, g_color, g_alpha, gx, gy, bg,
               n_valid_max):
    """Front-to-back alpha compositing of depth-ordered candidates.

    Custom VJP: the autodiff backward of the block scan re-runs the
    forward under remat AND unrolls the scan adjoint (~3.7x the forward,
    round-4 profile).  The analytic backward walks the blocks BACK TO
    FRONT with the per-block entry transmittances saved by the forward —
    the standard 3DGS reverse-compositing recurrence, but block-exact
    (no 1/(1-a) transmittance reconstruction, so no drift or underflow
    when T collapses behind saturated tiles)."""
    rgb, _, _, _ = _composite_fwd_impl(bm, g_mean, g_conic, g_color, g_alpha,
                                       gx, gy, bg, n_valid_max)
    return rgb


def _composite_fwd(bm, g_mean, g_conic, g_color, g_alpha, gx, gy, bg,
                   n_valid_max):
    rgb, t_starts, t_final, n_done = _composite_fwd_impl(
        bm, g_mean, g_conic, g_color, g_alpha, gx, gy, bg, n_valid_max)
    return rgb, (g_mean, g_conic, g_color, g_alpha, gx, gy, bg,
                 t_starts, t_final, n_done)


def _composite_bwd(bm, res, grgb):
    (g_mean, g_conic, g_color, g_alpha, gx, gy, bg,
     t_starts, t_final, n_done) = res
    c_sz, m = g_alpha.shape
    nb = m // bm
    resh = lambda x: x.reshape(c_sz, nb, bm, *x.shape[2:]).swapaxes(0, 1)
    mb_, cb_, colb_, ab_ = (resh(g_mean), resh(g_conic), resh(g_color),
                            resh(g_alpha))
    take = lambda x, b: jax.lax.dynamic_index_in_dim(x, b, 0, keepdims=False)
    put = lambda x, v, b: jax.lax.dynamic_update_index_in_dim(x, v, b, 0)

    def body(state):
        b, R, dm, dc, dcol, dal = state
        mb, cb, colb, ab = (take(mb_, b), take(cb_, b), take(colb_, b),
                            take(ab_, b))
        t_start = take(t_starts, b)
        a, raw, gauss, power, dx, dy = _block_alpha(mb, cb, ab, gx, gy)
        tb = jnp.cumprod(1.0 - a, axis=1)
        t_prev = jnp.concatenate([jnp.ones_like(tb[:, :1]), tb[:, :-1]], axis=1)
        T = t_start[:, None, :] * t_prev           # exact forward T_i [C,BM,P]
        w = a * T
        cg = jnp.einsum("cpk,cmk->cmp", grgb, colb)  # (gbar . c_i) [C,BM,P]
        s = cg * w
        suffix = jnp.sum(s, axis=1, keepdims=True) - jnp.cumsum(s, axis=1)
        Ri = R[:, None, :] + suffix                # R_i = sum_{j>i} s_j
        d_a = cg * T - Ri / (1.0 - a)
        # clamp masks: a = min(alpha*G, 0.99) zeroed below 1/255
        live = (a >= ALPHA_MIN) & (raw < ALPHA_MAX)
        d_raw = jnp.where(live, d_a, 0.0)
        d_alpha = jnp.sum(d_raw * gauss, axis=2)             # [C,BM]
        d_gauss = d_raw * ab[:, :, None]
        d_power = jnp.where(power < 0.0, d_gauss * gauss, 0.0)
        d_c0 = jnp.sum(d_power * (-0.5) * dx * dx, axis=2)
        d_c1 = jnp.sum(d_power * (-1.0) * dx * dy, axis=2)
        d_c2 = jnp.sum(d_power * (-0.5) * dy * dy, axis=2)
        cA, cB, cC = cb[:, :, 0:1], cb[:, :, 1:2], cb[:, :, 2:3]
        d_mx = jnp.sum(d_power * (cA * dx + cB * dy), axis=2)
        d_my = jnp.sum(d_power * (cB * dx + cC * dy), axis=2)
        R = R + jnp.sum(s, axis=1)
        dm = put(dm, jnp.stack([d_mx, d_my], axis=2), b)
        dc = put(dc, jnp.stack([d_c0, d_c1, d_c2], axis=2), b)
        dcol = put(dcol, jnp.einsum("cpk,cmp->cmk", grgb, w), b)
        dal = put(dal, d_alpha, b)
        return (b - 1, R, dm, dc, dcol, dal)

    bg_dot = jnp.einsum("cpk,k->cp", grgb, bg)
    R0 = bg_dot * t_final
    # back-to-front from the last PROCESSED block; untouched blocks keep
    # zero grads (their forward contribution was truncated at T < T_EPS)
    state = (n_done - 1, R0,
             jnp.zeros((nb, c_sz, bm, 2)), jnp.zeros((nb, c_sz, bm, 3)),
             jnp.zeros((nb, c_sz, bm, 3)), jnp.zeros((nb, c_sz, bm)))
    state = jax.lax.while_loop(lambda s: s[0] >= 0, body, state)
    _, _, dm, dc, dcol, dal = state
    unresh = lambda x: x.swapaxes(0, 1).reshape(c_sz, m, *x.shape[3:])
    d_bg = jnp.einsum("cpk,cp->k", grgb, t_final)
    return (unresh(dm), unresh(dc), unresh(dcol), unresh(dal),
            jnp.zeros_like(gx), jnp.zeros_like(gy), d_bg,
            jnp.zeros((), jnp.float32))


_composite.defvjp(_composite_fwd, _composite_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("max_per_tile", "tile_chunk", "sh_degree", "binning",
                     "max_global", "remat", "block_m", "max_mid",
                     "band_plan"),
)
def render(
    cloud: SplatCloud,
    cam: Camera,
    bg: jax.Array | None = None,
    max_per_tile: int = 256,
    tile_chunk: int = 32,
    sh_degree: int | None = None,
    binning: str = "windowed",
    max_global: int = 32,
    remat: bool = True,
    block_m: int = 32,
    max_mid: int = 16384,
    tile_order: jax.Array | None = None,
    band_plan: tuple | None = None,
) -> jax.Array:
    """Render [H,W,3] linear-RGB image. Differentiable w.r.t. all splat params.

    binning="windowed": production path (default) — tiered key binning:
                        splats with radius <= 1 tile emit 9 key slots,
                        radius <= 3 tiles are compacted to ``max_mid`` and
                        emit 49 slots, one stable sort groups all keys by
                        tile in depth order, per-tile candidate windows are
                        fixed [max_per_tile] slices.  Only radius > 3-tile
                        giants (and mid-capacity overflow) escape to a
                        global candidate list (front-most ``max_global`` by
                        depth) merged into every tile's window, so
                        near-camera giants keep their full footprint.
    binning="exact":    per-tile overlap over ALL splats (O(tiles*N) select) —
                        the verification oracle path.

    ``tile_order`` + ``band_plan`` (from :func:`auto_budget` /
    :func:`plan_bands`) switch on occupancy-banded scheduling: tiles are
    processed grouped by their measured candidate need, each band with its
    own (pow2) budget, so sparse tiles stop paying the densest tile's
    gather + compositing cost.  ``band_plan`` is a static tuple of
    ``(n_chunks, budget)`` per band; ``tile_order`` the matching
    concatenation of per-band tile ids, each band padded to a multiple of
    ``tile_chunk`` with the sentinel ``n_tiles``.
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
    color = jnp.clip(color, 0.0, None)
    depth_key = jnp.where(proj["in_front"], proj["depth"], jnp.inf)

    if binning == "windowed":
        # NO global depth pre-sort: depth rides as the SECOND sort key of
        # both the category sort and the entry sort below, so per-tile runs
        # come out front-to-back without ever reordering the attribute
        # arrays (round 4 paid an argsort + 13 column gathers ~93 ms at 1M
        # — and their scatter-add VJPs again in the backward).
        means2d = proj["means2d"]
        conic = proj["conic"]
        radius = proj["radius"]
        valid = proj["in_front"]
    else:
        # exact oracle path: score-by-index selection needs depth-sorted
        # arrays (tiny scenes only — the pre-sort cost is irrelevant here)
        order = jnp.argsort(depth_key)
        means2d = proj["means2d"][order]
        conic = proj["conic"][order]
        radius = proj["radius"][order]
        valid = proj["in_front"][order]
        color = color[order]
        alpha = alpha[order]

    # ---- tile binning ----
    tx = jnp.arange(n_tiles) % tw
    ty = jnp.arange(n_tiles) // tw
    x0 = (tx * TILE).astype(jnp.float32)
    y0 = (ty * TILE).astype(jnp.float32)
    # overlap of splat bbox [mean±r] with tile AABB (exact path)
    lo_x = means2d[:, 0] - radius
    hi_x = means2d[:, 0] + radius
    lo_y = means2d[:, 1] - radius
    hi_y = means2d[:, 1] + radius

    if binning == "windowed":
        # Tiered binning (see R_SMALL_MAX/R_MID_MAX notes): smalls emit 9
        # key slots each, retained mids emit 49 slots over a COMPACTED
        # [max_mid] array, giants + mid-overflow escape to the global list.
        # Round-3 used span 6 / escape at 2*TILE: 36N keys made the key
        # build + sort ~70% of the 1M-splat forward for a population that
        # is overwhelmingly sub-tile sized; round-4's span-3 + global
        # escape truncated multi-tile splats (1082 of 1338 on the bench
        # scene).  The compacted mid tier keeps 9N+49*max_mid keys while
        # giving every <=3-tile splat its exact footprint.
        small, keep_mid, glob = _classify(radius, valid, max_mid)
        m_mid = min(max_mid, n)
        # ONE (category, depth) sort: globals first in depth order, then
        # retained mids.  top_k at k=256 over 1M is far slower.
        cat = jnp.where(
            glob, jnp.uint8(0), jnp.where(keep_mid, jnp.uint8(1), jnp.uint8(2))
        )
        cat_s, _, ids_cat = jax.lax.sort(
            (cat, depth_key, jnp.arange(n, dtype=jnp.int32)),
            num_keys=2, is_stable=False,
        )
        n_glob = min(max_global, n)
        sel_g = ids_cat[:n_glob]
        valid_g = cat_s[:n_glob] == 0
        # retained mids start right after the globals: dynamic_slice from a
        # sentinel-padded copy (start can never clamp), masked by count
        n_globc = jnp.sum(glob.astype(jnp.int32))
        n_midc = jnp.sum(keep_mid.astype(jnp.int32))
        ids_pad = jnp.concatenate([ids_cat, jnp.zeros(m_mid, jnp.int32)])
        sel_mid = jax.lax.dynamic_slice(ids_pad, (n_globc,), (m_mid,))
        mid_valid = jnp.arange(m_mid) < n_midc

        tid_s, _ = _tile_cover(means2d, jnp.minimum(radius, R_SMALL_MAX),
                               small, tw, th, SPAN_SMALL)
        tid_m, _ = _tile_cover(means2d[sel_mid], radius[sel_mid], mid_valid,
                               tw, th, SPAN_MID)
        ids_s = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None],
            (n, SPAN_SMALL * SPAN_SMALL),
        ).reshape(-1)
        ids_m = jnp.broadcast_to(
            sel_mid[:, None], (m_mid, SPAN_MID * SPAN_MID)
        ).reshape(-1)
        dep_s = jnp.broadcast_to(
            depth_key[:, None], (n, SPAN_SMALL * SPAN_SMALL)
        ).reshape(-1)
        dep_m = jnp.broadcast_to(
            depth_key[sel_mid][:, None], (m_mid, SPAN_MID * SPAN_MID)
        ).reshape(-1)
        # global candidates are INJECTED as keys into every tile
        # (n_glob * n_tiles entries — trivial at the default max_global):
        # they then flow through the normal windows in depth position, so
        # the per-tile glob-merge concat + [C, M+G] sort of rounds 3-4
        # (~90-145 ms at 1M/1080p, round-5 micro-profile) disappears.
        tid_g = jnp.where(
            valid_g[None, :], jnp.arange(n_tiles, dtype=jnp.int32)[:, None],
            n_tiles,
        ).reshape(-1)
        ids_g = jnp.broadcast_to(sel_g[None, :], (n_tiles, n_glob)).reshape(-1)
        dep_g = jnp.broadcast_to(
            depth_key[sel_g][None, :], (n_tiles, n_glob)
        ).reshape(-1)
        # TWO-key sort (tile, depth) with the splat id as payload
        sorted_tid, _, entry_splat = jax.lax.sort(
            (jnp.concatenate([tid_s.reshape(-1), tid_m.reshape(-1), tid_g]),
             jnp.concatenate([dep_s, dep_m, dep_g]),
             jnp.concatenate([ids_s, ids_m, ids_g])),
            num_keys=2, is_stable=False,
        )

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
        return sel, sel_valid, jnp.sum(sel_valid, axis=1).astype(jnp.int32)

    def select_windowed(tile_idx, budget):
        # per-tile runs of the 2-key-sorted entry array are depth-ordered
        # and already include the injected global candidates — the window
        # is a pure contiguous slice, no merge, no per-tile sort
        start = jnp.searchsorted(sorted_tid, tile_idx, side="left")
        end = jnp.searchsorted(sorted_tid, tile_idx, side="right")
        idx = start[:, None] + jnp.arange(budget)[None, :]
        w_valid = idx < end[:, None]
        idx = jnp.clip(idx, 0, sorted_tid.shape[0] - 1)
        ids = jnp.where(w_valid, entry_splat[idx], n)
        counts = jnp.minimum(end - start, budget)
        return jnp.clip(ids, 0, n - 1), ids < n, counts

    # depth-block size for the compositing scan: candidates are consumed in
    # blocks of BM, carrying (rgb accumulator, running transmittance) — the
    # full [C, M, P] alpha/weight tensors of the round-3 cumprod layout
    # never materialize in HBM (measured ~1.7x on the compositing stage).
    # Total scan steps = (tiles/tile_chunk) * (M/BM): keep it in the low
    # thousands or per-step launch overhead dominates.
    BM = block_m

    # Packed row table for the candidate gathers: TPU gather cost is
    # per-ROW, not per-element (round-5 probe: a [N,12] row gather of 8M
    # indices costs 76 ms where 9 separate column gathers cost ~680 ms) —
    # the single biggest lever on the 1M/1080p forward.  Alpha stays a
    # SEPARATE column gather: scatter-add (the gather's VJP) is
    # per-ELEMENT, so a loss differentiated w.r.t. opacity alone would pay
    # a full 9-column scatter if alpha rode in the packed table, versus a
    # 1-column scatter on its own (~330 ms -> ~36 ms at 1M/1080p).
    packed = jnp.concatenate(
        [means2d, conic, color], axis=1
    )  # [N, 8]: mean(2) conic(3) color(3)

    def bin_and_render(tile_idx, budget=max_per_tile):
        # tile_idx: [C] chunk of tile ids
        c_sz = tile_idx.shape[0]
        tx0 = x0[tile_idx]  # [C]
        ty0 = y0[tile_idx]
        if binning == "windowed":
            sel, sel_valid, counts = select_windowed(tile_idx, budget)
        else:
            sel, sel_valid, counts = select_exact(tile_idx)

        m = sel.shape[1]
        nb = -(-m // BM)
        pad = nb * BM - m
        if pad:
            sel = jnp.pad(sel, ((0, 0), (0, pad)))
            sel_valid = jnp.pad(sel_valid, ((0, 0), (0, pad)))

        # pixel grid for each tile [C, TILE*TILE]
        px = jnp.arange(TILE, dtype=jnp.float32) + 0.5
        gx = jnp.broadcast_to(
            tx0[:, None, None] + px[None, None, :], (c_sz, TILE, TILE)
        ).reshape(-1, TILE * TILE)
        gy = jnp.broadcast_to(
            ty0[:, None, None] + px[None, :, None], (c_sz, TILE, TILE)
        ).reshape(-1, TILE * TILE)

        g = packed[sel]  # [C,M',8] — one row gather for geometry + color
        g_mean = g[..., 0:2]
        g_conic = g[..., 2:5]
        g_color = g[..., 5:8]
        g_alpha = jnp.where(sel_valid, alpha[sel], 0.0)
        # dynamic block bound: valid candidates sort to the front, so the
        # compositing loop only needs ceil(max_count/BM) blocks — at the
        # bench scene's mean ~360-of-1024 occupancy that's ~2.5x fewer
        # blocks than the static budget
        n_valid_max = jnp.max(counts).astype(jnp.float32)
        rgb = _composite(BM, g_mean, g_conic, g_color, g_alpha, gx, gy, bg,
                         n_valid_max)
        return rgb.reshape(-1, TILE, TILE, 3)

    # remat the per-chunk body: free in forward-only evaluation, and the
    # backward re-renders each tile chunk instead of saving its [C,M,P]
    # weight tensors — without it the 1M-splat 1080p gradient program is
    # large enough to crash the TPU compiler
    if band_plan is not None:
        if binning != "windowed" or tile_order is None:
            raise ValueError("band_plan requires windowed binning + tile_order")
        out = jnp.zeros((n_tiles + 1, TILE, TILE, 3))
        off = 0
        for nc, mb in band_plan:
            ids_b = tile_order[off : off + nc * tile_chunk]
            off += nc * tile_chunk
            safe = jnp.minimum(ids_b, n_tiles - 1)  # sentinel pads render tile
            body = functools.partial(bin_and_render, budget=min(mb, n))
            body = jax.checkpoint(body) if remat else body
            tiles_b = jax.lax.map(body, safe.reshape(nc, tile_chunk))
            # pad entries (id == n_tiles) land in the dropped extra row
            out = out.at[ids_b].set(tiles_b.reshape(-1, TILE, TILE, 3))
        tiles = out[:n_tiles]
    else:
        chunks = n_tiles // tile_chunk if n_tiles % tile_chunk == 0 else -(-n_tiles // tile_chunk)
        pad_tiles = chunks * tile_chunk - n_tiles
        tile_ids = jnp.concatenate([jnp.arange(n_tiles), jnp.zeros(pad_tiles, jnp.int32)])
        body = jax.checkpoint(bin_and_render) if remat else bin_and_render
        tiles = jax.lax.map(body, tile_ids.reshape(chunks, tile_chunk))
        tiles = tiles.reshape(-1, TILE, TILE, 3)[:n_tiles]  # [T, 16,16,3]
    img = tiles.reshape(th, tw, TILE, TILE, 3).transpose(0, 2, 1, 3, 4).reshape(h, w, 3)
    return img


@functools.partial(jax.jit, static_argnames=("saturation", "max_mid"))
def _tile_occupancy(pos, log_scale, quat, opacity, cam: Camera,
                    saturation: bool = True, max_mid: int = 16384):
    """Per-tile windowed-candidate counts + global-escape count (jit).

    Mirrors the renderer's tiered binning exactly: smalls over span-3,
    compacted mids over span-7, giants + mid-capacity overflow to the
    global list (the returned ``n_glob``).

    With ``saturation``, also returns a per-tile SATURATION DEPTH: the
    number of depth-ordered candidates a tile needs before a conservative
    tile-level transmittance bound falls below T_EPS — candidates behind
    that point cannot change the image (the compositing loop would skip
    them anyway; a budget sized to the saturation depth skips their
    per-chunk gather cost too).  The bound uses each candidate's
    footprint-integrated mean-pixel occlusion spread over its covered
    tiles (see GAMMA_COVER), so the depth overestimates the per-pixel
    reality; the bench's windowed-vs-exact crop PSNR is the measured
    check.
    """
    h, w = cam.height, cam.width
    tw, th = w // TILE, h // TILE
    n_tiles = tw * th
    proj = project_gaussians(pos, log_scale, quat, cam)
    means2d, radius, valid = proj["means2d"], proj["radius"], proj["in_front"]
    # mirror the renderer: unsorted arrays, depth rides as a sort key
    depth_key = jnp.where(valid, proj["depth"], jnp.inf)
    n = means2d.shape[0]
    m_mid = min(max_mid, n)
    small, keep_mid, glob = _classify(radius, valid, m_mid)
    n_globc = jnp.sum(glob.astype(jnp.int32))
    n_midc = jnp.sum(keep_mid.astype(jnp.int32))
    cat = jnp.where(
        glob, jnp.uint8(0), jnp.where(keep_mid, jnp.uint8(1), jnp.uint8(2))
    )
    _, _, ids_cat = jax.lax.sort(
        (cat, depth_key, jnp.arange(n, dtype=jnp.int32)),
        num_keys=2, is_stable=False,
    )
    ids_pad = jnp.concatenate([ids_cat, jnp.zeros(m_mid, jnp.int32)])
    sel_mid = jax.lax.dynamic_slice(ids_pad, (n_globc,), (m_mid,))
    mid_valid = jnp.arange(m_mid) < n_midc

    tid_s, ncov_s = _tile_cover(means2d, jnp.minimum(radius, R_SMALL_MAX),
                                small, tw, th, SPAN_SMALL)
    tid_m, ncov_m = _tile_cover(means2d[sel_mid], radius[sel_mid], mid_valid,
                                tw, th, SPAN_MID)
    tid_all = jnp.concatenate([tid_s.reshape(-1), tid_m.reshape(-1)])
    counts = jnp.zeros(n_tiles + 1, jnp.int32).at[
        jnp.clip(tid_all, 0, n_tiles)
    ].add(1)
    if not saturation:
        return counts[:n_tiles], n_globc, counts[:n_tiles]
    # ---- per-tile saturation depth ----
    # per-entry MEAN-pixel occlusion: the Gaussian's integrated footprint
    # 2*pi*sigma^2 (sigma = radius/3 px) spread over the n_cov tiles the
    # splat covers (advisor r4: depositing the FULL integral into every
    # covered tile overestimated multi-tile occlusion), capped at 1.
    # GAMMA_COVER is applied exactly once, in the log term below.
    alpha = jax.nn.sigmoid(opacity)

    def occl(rad, ncov):
        return jnp.minimum(
            1.0,
            (2.0 * jnp.pi / 9.0) * rad * rad
            / (float(TILE * TILE) * jnp.maximum(ncov, 1)),
        )

    a_s = alpha * occl(jnp.minimum(radius, R_SMALL_MAX), ncov_s)
    a_m = alpha[sel_mid] * occl(radius[sel_mid], ncov_m)
    a_ent = jnp.concatenate([
        jnp.broadcast_to(a_s[:, None], (n, SPAN_SMALL * SPAN_SMALL)).reshape(-1),
        jnp.broadcast_to(a_m[:, None], (m_mid, SPAN_MID * SPAN_MID)).reshape(-1),
    ])
    dep_ent = jnp.concatenate([
        jnp.broadcast_to(
            depth_key[:, None], (n, SPAN_SMALL * SPAN_SMALL)
        ).reshape(-1),
        jnp.broadcast_to(
            depth_key[sel_mid][:, None], (m_mid, SPAN_MID * SPAN_MID)
        ).reshape(-1),
    ])
    # 2-key sort (tile, depth): the saturation prefix needs per-tile
    # front-to-back order, which the raw entry concatenation does not have
    sorted_tid, _, a_sorted = jax.lax.sort(
        (tid_all, dep_ent, a_ent), num_keys=2, is_stable=False
    )
    real = sorted_tid < n_tiles
    l = jnp.where(real, jnp.log1p(-GAMMA_COVER * jnp.minimum(a_sorted, 0.99)),
                  0.0)
    ecs = jnp.cumsum(l) - l  # exclusive global prefix
    # per-tile segment base WITHOUT a 9N scan (an associative_scan here
    # never returned from the remote TPU compiler): sorted_tid is
    # ascending, so each tile's first entry index is one searchsorted over
    # the small tile-id range, and the base broadcasts back by tid gather
    first_idx = jnp.searchsorted(sorted_tid, jnp.arange(n_tiles))
    bases = ecs[jnp.clip(first_idx, 0, sorted_tid.shape[0] - 1)]
    pre = ecs - bases[jnp.clip(sorted_tid, 0, n_tiles - 1)]
    # log-transmittance bound BEFORE this entry
    contributing = real & (pre > jnp.log(T_EPS))
    k_sat = jnp.zeros(n_tiles + 1, jnp.int32).at[
        jnp.clip(sorted_tid, 0, n_tiles)
    ].add(contributing.astype(jnp.int32))
    return counts[:n_tiles], n_globc, k_sat[:n_tiles]


def plan_bands(needed: np.ndarray, tile_chunk: int = 64, cap: int = 1024,
               min_budget: int = 32) -> tuple[np.ndarray, tuple]:
    """Host-side occupancy banding for :func:`render`.

    Groups tiles by the pow2-rounded budget each NEEDS (from
    :func:`auto_budget`'s per-tile ``needed`` counts), densest band first,
    tiles within a band ordered by descending need so each ``tile_chunk``
    is occupancy-homogeneous (the compositing loop's dynamic block bound
    is a chunk max — homogeneous chunks stop sparse tiles from paying the
    densest tile's block count).  Each band is padded to a multiple of
    ``tile_chunk`` with the sentinel ``n_tiles``.

    Returns ``(tile_order int32 [sum bands], band_plan)`` where
    ``band_plan`` is a static tuple of ``(n_chunks, budget)``.
    """
    needed = np.asarray(needed)
    n_tiles = needed.shape[0]
    clipped = np.minimum(np.maximum(needed.astype(np.int64), 1), cap)
    budg = np.maximum(
        min_budget, 1 << np.ceil(np.log2(clipped)).astype(np.int64)
    )
    budg = np.minimum(budg, cap)
    order_all = np.argsort(-needed, kind="stable")
    parts, plan = [], []
    for bv in sorted(set(budg.tolist()), reverse=True):
        ids = order_all[budg[order_all] == bv]
        pad = (-len(ids)) % tile_chunk
        ids = np.concatenate([ids, np.full(pad, n_tiles, dtype=np.int64)])
        parts.append(ids)
        plan.append((len(ids) // tile_chunk, int(bv)))
    return np.concatenate(parts).astype(np.int32), tuple(plan)


def auto_budget(cloud: SplatCloud, cam: Camera, cap: int = 1024,
                glob_cap: int = 256, saturation: bool = True,
                max_mid: int = 16384, band_chunk: int | None = None) -> dict:
    """Measure the scene's per-tile candidate occupancy and size the
    static render budgets from it (the per-band treatment the distributed
    renderer got in round 3, applied to the single-device path).

    With ``saturation`` (default), each tile's NEEDED budget is capped at
    2x its measured depth-to-saturation + 32: candidates deeper than the
    point where the tile's conservative transmittance bound collapses are
    invisible (< T_EPS contribution), so paying their gather cost buys
    nothing.  The compositing loop's own early exit makes the same cut on
    compute; this makes the same cut on the per-chunk gathers.  Quality is
    measured, not assumed — bench.py renders a windowed-vs-exact crop PSNR
    at full scale under the chosen budget.

    Returns a dict with ``max_per_tile`` / ``max_global`` (pow2, capped)
    plus the report: ``occ_max``, ``occ_mean``, ``n_big`` (the
    global-escape population: radius > 3-tile giants + mid-capacity
    overflow), ``sat_max`` (largest per-tile saturation depth), and
    ``truncated_tiles`` — tiles whose candidate list the chosen budget
    truncates BEYOND the saturation-justified point (0 unless ``cap``
    binds).  With ``band_chunk`` set, also returns ``tile_order`` /
    ``band_plan`` from :func:`plan_bands` for occupancy-banded rendering.
    """
    counts, n_big, k_sat = _tile_occupancy(
        jnp.asarray(cloud.pos), jnp.asarray(cloud.log_scale),
        jnp.asarray(cloud.quat), jnp.asarray(cloud.opacity), cam,
        saturation=saturation, max_mid=max_mid,
    )
    counts = np.asarray(counts)
    k_sat = np.asarray(k_sat)
    n_big = int(n_big)
    g = 32
    while g < n_big and g < glob_cap:
        g *= 2
    # the renderer INJECTS the global candidates into every tile's window
    # (min(n_big, g) entries per tile) — budgets must cover them
    n = cloud.pos.shape[0]
    counts = counts + min(n_big, min(g, n))
    occ_max = int(counts.max()) if counts.size else 0
    if saturation:
        needed = np.minimum(counts, 2 * k_sat + 32 + min(n_big, min(g, n)))
    else:
        needed = counts
    need_max = int(needed.max()) if needed.size else 0
    m = 32
    while m < need_max and m < cap:
        m *= 2
    out = dict(
        max_per_tile=m,
        max_global=g,
        occ_max=occ_max,
        occ_mean=float(counts.mean()) if counts.size else 0.0,
        n_big=n_big,
        sat_max=int(k_sat.max()) if saturation and k_sat.size else None,
        truncated_tiles=int((needed > m).sum()),
        big_truncated=max(0, n_big - g),
    )
    if band_chunk is not None:
        out["tile_order"], out["band_plan"] = plan_bands(
            needed, tile_chunk=band_chunk, cap=cap
        )
    return out


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
