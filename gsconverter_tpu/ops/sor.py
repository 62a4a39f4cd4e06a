"""Statistical Outlier Removal (SOR) — grid KNN mean-distance filter on TPU.

Reference contract (processing/gpu_ops.py:99-263, data_processor.py:119-182):
cells sized for ~32 points, 27-neighbor-cell scan, mean distance to the K
nearest neighbors (K capped at 50), keep points with
``mean_dist < mean + sigma * std``.  Intensity slider i in [1,10] maps to
K = int(10 + (i-1)*40/9), sigma = 20.0 - (i-1)*17/9 (data_processor.py:131-134).

TPU-first redesign (SURVEY.md §7.3): the reference's spatial *hash* merges
distant cells on collision; we instead clamp the grid to 1024 cells/axis and
pack exact 30-bit cell keys — collision-free, same statistical contract.
Binning is a device sort; per-point candidates are gathered as fixed-shape
[27*cap] windows (cap = 2x target occupancy) and reduced with ``top_k`` —
everything static-shaped and fused by XLA, chunked over N to bound memory.

Known divergence (documented, SURVEY.md §2.2): the reference's CPU fallback
computes the mask but never applies it (data_processor.py:180-182).  We
implement the intended behavior everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

GRID_BITS = 10  # 1024 cells per axis
GRID_MAX = (1 << GRID_BITS) - 1
TARGET_PER_CELL = 32  # reference gpu_ops.py:209
MAX_K = 50  # reference gpu_ops.py:119,244
DEFAULT_CAP = 64  # candidates gathered per neighbor cell (2x target occupancy)


def intensity_to_params(intensity: float) -> tuple[int, float]:
    """Slider mapping (reference data_processor.py:131-134)."""
    k = int(10 + (intensity - 1) * (40 / 9))
    factor = 20.0 - (intensity - 1) * (17.0 / 9)
    return k, factor


def _cell_keys(pos, mins, cell):
    ci = jnp.clip(jnp.floor((pos - mins) / cell), 0, GRID_MAX).astype(jnp.int32)
    keys = (ci[:, 0] << (2 * GRID_BITS)) | (ci[:, 1] << GRID_BITS) | ci[:, 2]
    return ci, keys


def _adaptive_cell_size(pos, mins, extent):
    """Density-adaptive cell size, fully traced.

    The reference derives cell size from bbox volume (gpu_ops.py:203-213),
    which degenerates when outliers inflate the bbox: every real point lands
    in one cell and the kernel devolves to O(N^2).  We instead estimate the
    dominant point spacing from median Morton-neighbor distance (one sort),
    then refine once so median cell occupancy hits the 32-points/cell target.
    """
    n = pos.shape[0]
    rng = jnp.where(extent > 0, extent, 1.0)
    t = (pos - mins) / rng
    g = jnp.clip(t * 1024.0, 0, 1023).astype(jnp.uint32)
    from .quant import morton3_u32

    mkey = morton3_u32(g[:, 0], g[:, 1], g[:, 2])
    mpos = pos[jnp.argsort(mkey)]
    gaps = jnp.linalg.norm(mpos[1:] - mpos[:-1], axis=1)
    spacing = jnp.median(gaps)
    cell = jnp.maximum(spacing * TARGET_PER_CELL ** (1.0 / 3.0), 1e-4)
    cell = jnp.maximum(cell, jnp.max(extent) / GRID_MAX)

    # one occupancy-driven refinement toward the 32/cell target
    _, keys = _cell_keys(pos, mins, cell)
    sk = jnp.sort(keys)
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    cid = jnp.cumsum(first) - 1
    occ = jax.ops.segment_sum(jnp.ones(n, jnp.float32), cid, num_segments=n)
    per_point_occ = occ[cid]  # in sorted order; distribution is order-free
    occ_med = jnp.median(per_point_occ)
    factor = jnp.clip(
        (TARGET_PER_CELL / jnp.maximum(occ_med, 1.0)) ** (1.0 / 3.0), 0.25, 4.0
    )
    cell = jnp.maximum(cell * factor, jnp.max(extent) / GRID_MAX)
    return jnp.maximum(cell, 1e-4)


@functools.partial(jax.jit, static_argnames=("k", "cap", "block"))
def sor_mean_knn_dists(
    pos: jax.Array, k: int = 25, cap: int = DEFAULT_CAP, block: int = 2048
) -> jax.Array:
    """Mean distance to the <=k nearest neighbors for every point [N,3].

    Neighbors beyond the 27-cell ring are unseen (same approximation as the
    reference kernel); unlike the reference — which averages only what it
    found and returns 0.0 for isolated points, silently KEEPING them
    (gpu_ops.py:170-174) — missing neighbors are filled at the ring-reach
    lower bound ``cell``, so isolated flyers rank as outliers.
    """
    k = min(int(k), MAX_K)
    n = pos.shape[0]

    mins = jnp.min(pos, axis=0)
    maxs = jnp.max(pos, axis=0)
    extent = maxs - mins
    cell = _adaptive_cell_size(pos, mins, extent)

    ci, keys = _cell_keys(pos, mins, cell)
    order = jnp.argsort(keys)
    skeys = keys[order]
    spos = pos[order]

    # --- neighbor-cell offsets (static [27]) ---
    d = jnp.arange(-1, 2)
    offs = jnp.stack(jnp.meshgrid(d, d, d, indexing="ij"), axis=-1).reshape(27, 3)

    pad = (-n) % block
    spos_p = jnp.pad(spos, ((0, pad), (0, 0)))
    ci_sorted = ci[order]
    ci_p = jnp.pad(ci_sorted, ((0, pad), (0, 0)))

    def one_block(args):
        bpos, bci = args  # [B,3], [B,3]
        ncells = bci[:, None, :] + offs[None, :, :]  # [B,27,3]
        valid_cell = jnp.all((ncells >= 0) & (ncells <= GRID_MAX), axis=-1)
        nkeys = (
            (ncells[..., 0] << (2 * GRID_BITS))
            | (ncells[..., 1] << GRID_BITS)
            | ncells[..., 2]
        )  # [B,27]
        start = jnp.searchsorted(skeys, nkeys.reshape(-1), side="left").reshape(nkeys.shape)
        end = jnp.searchsorted(skeys, nkeys.reshape(-1), side="right").reshape(nkeys.shape)
        # fixed-cap candidate windows
        idx = start[..., None] + jnp.arange(cap)[None, None, :]  # [B,27,cap]
        valid = (idx < end[..., None]) & valid_cell[..., None]
        idx = jnp.clip(idx, 0, n - 1).reshape(bpos.shape[0], 27 * cap)
        valid = valid.reshape(bpos.shape[0], 27 * cap)
        cand = spos[idx]  # [B, 27*cap, 3]
        diff = cand - bpos[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(valid & (d2 > 1e-12), d2, jnp.inf)  # drop self & invalid
        neg_top, _ = jax.lax.top_k(-d2, k)  # k smallest
        dk2 = -neg_top
        ok = jnp.isfinite(dk2)
        dist = jnp.sqrt(jnp.where(ok, dk2, 0.0))
        cnt = jnp.sum(ok, axis=1)
        # fill unfound neighbors at the ring-reach lower bound `cell`
        fill = (k - cnt).astype(jnp.float32) * cell
        return (jnp.sum(dist, axis=1) + fill) / k

    nb = spos_p.shape[0] // block
    means_sorted = jax.lax.map(
        one_block, (spos_p.reshape(nb, block, 3), ci_p.reshape(nb, block, 3))
    ).reshape(-1)[:n]

    # unsort back to input order
    return jnp.zeros(n, jnp.float32).at[order].set(means_sorted)


@functools.partial(jax.jit, static_argnames=("k",))
def sor_mask(pos: jax.Array, k: int, sigma: float) -> jax.Array:
    """Keep-mask: mean_knn_dist < mean + sigma * std (reference gpu_ops.py:259-263)."""
    md = sor_mean_knn_dists(pos, k=k)
    thresh = jnp.mean(md) + sigma * jnp.std(md)
    return md < thresh
