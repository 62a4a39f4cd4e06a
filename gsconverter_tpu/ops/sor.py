"""Statistical Outlier Removal (SOR) — grid KNN mean-distance filter on TPU.

Reference contract (processing/gpu_ops.py:99-263, data_processor.py:119-182):
cells sized for ~32 points, 27-neighbor-cell scan, mean distance to the K
nearest neighbors (K capped at 50), keep points with
``mean_dist < mean + sigma * std``.  Intensity slider i in [1,10] maps to
K = int(10 + (i-1)*40/9), sigma = 20.0 - (i-1)*17/9 (data_processor.py:131-134).

TPU-first redesign (SURVEY.md §7.3):
  - the reference's spatial *hash* merges distant cells on collision; we
    clamp the grid to 1024 cells/axis and pack exact 30-bit cell keys —
    collision-free, same statistical contract;
  - cell size is density-adaptive (median Morton-neighbor spacing + one
    occupancy refinement), where the reference's bbox-volume formula
    degenerates to O(N^2) when outliers inflate the bbox;
  - the splat axis is padded to power-of-two buckets with a dynamic valid
    count, so each (bucket, k) pair compiles exactly once and is reused for
    every scene and filter stage;
  - neighbors beyond the 27-cell ring are unseen (same approximation as the
    reference); unlike the reference — which averages only what it found and
    returns 0.0 for isolated points, silently KEEPING them
    (gpu_ops.py:170-174) — missing neighbors are filled at the ring-reach
    lower bound ``cell``, so isolated flyers rank as outliers.

Known divergence (documented, SURVEY.md §2.2): the reference's CPU fallback
computes the mask but never applies it (data_processor.py:180-182).  We
implement the intended behavior everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .padding import PAD_POS, next_pow2, pad_rows

GRID_BITS = 10  # 1024 cells per axis
GRID_MAX = (1 << GRID_BITS) - 1
KEY_SENTINEL = jnp.int32(0x7FFFFFFF)
TARGET_PER_CELL = 32  # reference gpu_ops.py:209
MAX_K = 50  # reference gpu_ops.py:119,244
DEFAULT_CAP = 64  # candidates gathered per neighbor cell (2x target occupancy)


def intensity_to_params(intensity: float) -> tuple[int, float]:
    """Slider mapping (reference data_processor.py:131-134)."""
    k = int(10 + (intensity - 1) * (40 / 9))
    factor = 20.0 - (intensity - 1) * (17.0 / 9)
    return k, factor


def _cell_keys(pos, valid, mins, cell):
    ci = jnp.clip(jnp.floor((pos - mins) / cell), 0, GRID_MAX).astype(jnp.int32)
    keys = (ci[:, 0] << (2 * GRID_BITS)) | (ci[:, 1] << GRID_BITS) | ci[:, 2]
    return ci, jnp.where(valid, keys, KEY_SENTINEL)


def _adaptive_cell_size(pos, valid, mins, extent):
    """Density-adaptive cell size over the valid points, fully traced."""
    n = pos.shape[0]
    rng = jnp.where(extent > 0, extent, 1.0)
    t = jnp.clip((pos - mins) / rng, 0.0, 1.0)
    g = (t * 1023.0).astype(jnp.uint32)
    from .quant import morton3_u32

    mkey = jnp.where(
        valid, morton3_u32(g[:, 0], g[:, 1], g[:, 2]), jnp.uint32(0xFFFFFFFF)
    )
    morder = jnp.argsort(mkey)
    mpos = pos[morder]
    mvalid = valid[morder]
    gaps = jnp.linalg.norm(mpos[1:] - mpos[:-1], axis=1)
    gap_ok = mvalid[1:] & mvalid[:-1]
    spacing = jnp.nanmedian(jnp.where(gap_ok, gaps, jnp.nan))
    spacing = jnp.where(jnp.isnan(spacing), 1.0, spacing)
    cell = jnp.maximum(spacing * TARGET_PER_CELL ** (1.0 / 3.0), 1e-4)
    cell = jnp.maximum(cell, jnp.max(extent) / GRID_MAX)

    # one occupancy-driven refinement toward the 32/cell target
    _, keys = _cell_keys(pos, valid, mins, cell)
    sk = jnp.sort(keys)
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    cid = jnp.cumsum(first) - 1
    sv = sk != KEY_SENTINEL
    occ = jax.ops.segment_sum(sv.astype(jnp.float32), cid, num_segments=n)
    per_point_occ = occ[cid]
    occ_med = jnp.nanmedian(jnp.where(sv, per_point_occ, jnp.nan))
    occ_med = jnp.where(jnp.isnan(occ_med), 1.0, occ_med)
    factor = jnp.clip(
        (TARGET_PER_CELL / jnp.maximum(occ_med, 1.0)) ** (1.0 / 3.0), 0.25, 4.0
    )
    cell = jnp.maximum(cell * factor, jnp.max(extent) / GRID_MAX)
    return jnp.maximum(cell, 1e-4)


def _sor_md_impl(
    pos: jax.Array, valid: jax.Array, k: int, cap: int, block: int,
    approx: bool = False,
) -> jax.Array:
    """Mean-KNN distance per point; ``valid`` marks real candidate points.

    Rows with valid=False get meaningless values — callers mask them out.
    ``approx=True`` selects neighbors with the TPU-native partial-reduction
    primitive ``jax.lax.approx_max_k`` (recall ~0.95) instead of an exact
    top-k sort.

    NOTE: composed from two separately-jitted stages (_sor_stage_bin and
    _sor_stage_loop).  The fully-fused program miscompiles on the axon TPU
    AOT compiler at N >= ~1M (device kernel fault) while each stage compiles
    and runs fine — see tools/bisect_tpu_fault*.py.  Numerics are identical.
    """
    k = min(int(k), MAX_K)
    order, skeys, spos, svalid, ci_sorted, cell = _sor_stage_bin(pos, valid)
    md_sorted = _sor_stage_loop(skeys, spos, svalid, ci_sorted, cell,
                                k, cap, block, approx)
    n = pos.shape[0]
    return jnp.zeros(n, jnp.float32).at[order].set(md_sorted)


@jax.jit
def _sor_stage_bin(pos: jax.Array, valid: jax.Array):
    """Stage 1: adaptive cell size + collision-free cell binning (one sort)."""
    big = jnp.float32(PAD_POS)
    mins = jnp.min(jnp.where(valid[:, None], pos, big), axis=0)
    maxs = jnp.max(jnp.where(valid[:, None], pos, -big), axis=0)
    extent = maxs - mins
    cell = _adaptive_cell_size(pos, valid, mins, extent)

    ci, keys = _cell_keys(pos, valid, mins, cell)
    order = jnp.argsort(keys)
    return order, keys[order], pos[order], valid[order], ci[order], cell


@functools.partial(jax.jit, static_argnames=("k", "cap", "block", "approx"))
def _sor_stage_loop(skeys, spos, svalid, ci_sorted, cell, k: int, cap: int,
                    block: int, approx: bool):
    """Stage 2: 27-cell candidate windows + mean of k nearest, block-wise."""
    n = spos.shape[0]
    d = jnp.arange(-1, 2)
    offs = jnp.stack(jnp.meshgrid(d, d, d, indexing="ij"), axis=-1).reshape(27, 3)

    pad = (-n) % block
    spos_p = jnp.pad(spos, ((0, pad), (0, 0)))
    ci_p = jnp.pad(ci_sorted, ((0, pad), (0, 0)))

    def one_block(args):
        bpos, bci = args  # [B,3], [B,3]
        ncells = bci[:, None, :] + offs[None, :, :]  # [B,27,3]
        valid_cell = jnp.all((ncells >= 0) & (ncells <= GRID_MAX), axis=-1)
        nkeys = (
            (ncells[..., 0] << (2 * GRID_BITS))
            | (ncells[..., 1] << GRID_BITS)
            | ncells[..., 2]
        )
        start = jnp.searchsorted(skeys, nkeys.reshape(-1), side="left").reshape(nkeys.shape)
        end = jnp.searchsorted(skeys, nkeys.reshape(-1), side="right").reshape(nkeys.shape)
        idx = start[..., None] + jnp.arange(cap)[None, None, :]  # [B,27,cap]
        ok = (idx < end[..., None]) & valid_cell[..., None]
        idx = jnp.clip(idx, 0, n - 1).reshape(bpos.shape[0], 27 * cap)
        ok = ok.reshape(bpos.shape[0], 27 * cap) & svalid[idx]
        cand = spos[idx]  # [B, 27*cap, 3]
        diff = cand - bpos[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(ok & (d2 > 1e-12), d2, jnp.inf)  # drop self & invalid
        if approx:
            neg_top, _ = jax.lax.approx_max_k(-d2, k, recall_target=0.95)
        else:
            neg_top, _ = jax.lax.top_k(-d2, k)
        dk2 = -neg_top
        found = jnp.isfinite(dk2)
        dist = jnp.sqrt(jnp.where(found, dk2, 0.0))
        cnt = jnp.sum(found, axis=1)
        fill = (k - cnt).astype(jnp.float32) * cell
        return (jnp.sum(dist, axis=1) + fill) / k

    nb = spos_p.shape[0] // block
    return jax.lax.map(
        one_block, (spos_p.reshape(nb, block, 3), ci_p.reshape(nb, block, 3))
    ).reshape(-1)[:n]


_sor_md_masked = _sor_md_impl  # staged-jit composition (see docstring)


# --------------------------------------------------------- window method
#
# TPU-native fast path: candidates are a contiguous +-window slice in
# Morton-sorted order instead of gathered 27-cell lists.  Contiguous
# dynamic_slice loads (pure DMA, no gathers) + one [B,3]x[3,C] MXU matmul
# per block for all pairwise distances.  Exact whenever the window covers
# the whole cloud (n <= block + 2*window); at larger n it is an approximate
# KNN with the same flavor of approximation the reference already accepts
# (hash-collision cell merging + 27-cell ring misses, gpu_ops.py:216-248).
# Missing neighbors (only possible when fewer than k valid points exist in
# the window) are filled at the largest found distance, keeping isolated
# flyers ranked as outliers.


@jax.jit
def _sor_window_bin(pos: jax.Array, valid: jax.Array,
                    rot=None, shift=(0.0, 0.0, 0.0)):
    """Morton sort over the valid points (invalid rows sort to the end).

    ``rot``/``shift`` select an alternative space-filling order for the
    multi-pass recall ensemble: each ordering misses a different neighbor
    set, so the elementwise MIN of per-pass mean-KNN distances converges on
    the true value.  ``rot`` rotates the frame the curve is built in
    (distances are rotation-invariant, so only the ordering changes);
    ``shift`` is a per-axis GRID translation (in units of the extent):
    coords map to half the grid range and translate by shift*512 cells,
    moving EVERY octree split plane — high-level planes are what cause
    correlated misses (a dense blob on the t=0.5 plane splits identically
    in any axis-permuted order).  Measured on the adversarial two-blob
    scene (tests/test_filters.py): identity-only 1 pass ~93% KNN recall;
    4 rotated+shifted passes reach KDTree mask agreement 0.9996.
    """
    from .quant import morton3_u32

    posr = pos if rot is None else pos @ jnp.asarray(rot, jnp.float32).T
    big = jnp.float32(PAD_POS)
    mins = jnp.min(jnp.where(valid[:, None], posr, big), axis=0)
    maxs = jnp.max(jnp.where(valid[:, None], posr, -big), axis=0)
    rng = jnp.where(maxs > mins, maxs - mins, 1.0)
    t = jnp.clip((posr - mins) / rng, 0.0, 1.0)
    g = (t * 511.0 + jnp.asarray(shift, jnp.float32) * 512.0).astype(jnp.uint32)
    mkey = jnp.where(
        valid, morton3_u32(g[:, 0], g[:, 1], g[:, 2]), jnp.uint32(0xFFFFFFFF)
    )
    order = jnp.argsort(mkey)
    return order, pos[order], valid[order]


def _sor_window_loop(spos, svalid, k: int, window: int, block: int, approx: bool,
                     batch: int = 8):
    n = spos.shape[0]
    pad = (-n) % block
    cwidth = block + 2 * window
    posp = jnp.pad(spos, ((window, window + pad), (0, 0)),
                   constant_values=PAD_POS)
    validp = jnp.pad(svalid, (window, window + pad))
    nb = (n + pad) // block

    def one_block(b):
        start = b * block
        cand = jax.lax.dynamic_slice(posp, (start, 0), (cwidth, 3))
        cvalid = jax.lax.dynamic_slice(validp, (start,), (cwidth,))
        x = cand[window:window + block]
        # ||x-c||^2 via the MXU; self-pairs excluded by index.
        d2 = (
            jnp.sum(x * x, axis=1)[:, None]
            + jnp.sum(cand * cand, axis=1)[None, :]
            - 2.0 * (x @ cand.T)
        )
        self_idx = jnp.arange(block)[:, None] + window == jnp.arange(cwidth)[None, :]
        ok = cvalid[None, :] & ~self_idx & (d2 > 1e-12)
        # the [block, cwidth] d2 intermediate dominates HBM traffic (this
        # loop is bandwidth-bound); bf16 halves it, and the ~0.4% rounding
        # is far below the mu + sigma*f statistical contract
        d2 = jnp.where(ok, jnp.maximum(d2, 0.0), jnp.inf).astype(jnp.bfloat16)
        if approx:
            neg_top, _ = jax.lax.approx_max_k(-d2, k, recall_target=0.95)
        else:
            neg_top, _ = jax.lax.top_k(-d2, k)
        dk2 = -neg_top.astype(jnp.float32)
        found = jnp.isfinite(dk2)
        dist = jnp.sqrt(jnp.where(found, dk2, 0.0))
        cnt = jnp.sum(found, axis=1)
        fill = (k - cnt).astype(jnp.float32) * jnp.max(dist, axis=1)
        return (jnp.sum(dist, axis=1) + fill) / k

    return jax.lax.map(
        one_block, jnp.arange(nb), batch_size=min(batch, nb)
    ).reshape(-1)[:n]


def _euler_mat(a, b, c):
    import numpy as _np

    ca, sa, cb, sb, cc, sc = (_np.cos(a), _np.sin(a), _np.cos(b),
                              _np.sin(b), _np.cos(c), _np.sin(c))
    rx = _np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    ry = _np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    rz = _np.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1]])
    return (rz @ ry @ rx).astype(_np.float32)


# (rotation, grid shift) per ensemble pass — rotated frames AND translated
# octree planes give near-independent neighbor-miss patterns (measured:
# 1/2/4 passes -> 0.988/0.993/0.9996 KDTree mask agreement on the
# adversarial two-blob scene)
_PASS_ORDERS = (
    (None, (0.0, 0.0, 0.0)),
    (_euler_mat(0.6, 1.1, 0.3), (0.47, 0.23, 0.71)),
    (_euler_mat(2.1, 0.4, 1.7), (0.19, 0.83, 0.37)),
    (_euler_mat(1.0, 2.5, 0.8), (0.71, 0.41, 0.13)),
)


def _sor_md_window(pos, valid, k: int, approx: bool = False,
                   window: int = 512, block: int = 1024, passes: int = 2):
    # window+candidate width tuned on a v5e chip: all (window, block) with
    # candidate width 2048 run ~280ms at 4M points (HBM-bound on the d2
    # intermediates; bf16 halves that). Single-pass window recall ~0.93
    # overestimates md by ~7% on dense clustered scenes; the 2-pass
    # ensemble MIN brings KDTree mask agreement above 0.999 (see
    # tests/test_filters.py::test_sor_adversarial_clustered_scene).
    k = min(int(k), MAX_K)
    n = pos.shape[0]
    md = jnp.full(n, jnp.inf, jnp.float32)
    for rot, shift in _PASS_ORDERS[:max(1, passes)]:
        order, spos, svalid = _sor_window_bin(pos, valid, rot, shift)
        md_sorted = _sor_window_loop(spos, svalid, k, window, block, approx)
        md = jnp.minimum(
            md, jnp.zeros(n, jnp.float32).at[order].set(md_sorted)
        )
    return md


@functools.partial(jax.jit, static_argnames=("k", "approx", "passes"))
def _sor_mask_window_fused(pos, n_valid, sigma, k: int, approx: bool,
                           passes: int = 2):
    """bin + window loop + stats as ONE program (one device round trip)."""
    p = pos.shape[0]
    valid = jnp.arange(p) < n_valid
    md = _sor_md_window(pos, valid, k, approx=approx, passes=passes)
    return _sor_mask_stats(md, valid, n_valid, sigma)


def sor_mean_knn_dists(pos: jax.Array, k: int = 25, cap: int = DEFAULT_CAP,
                       block: int = 2048) -> jax.Array:
    """Mean distance to the <=k nearest neighbors for every point [N,3]."""
    n = pos.shape[0]
    p = next_pow2(n)
    posp = pad_rows(pos, p, PAD_POS)
    valid = jnp.arange(p) < n
    return _sor_md_masked(posp, valid, int(k), cap, block)[:n]


@jax.jit
def _sor_mask_stats(md, valid, n_valid, sigma):
    cnt = n_valid.astype(jnp.float32)
    mean = jnp.sum(jnp.where(valid, md, 0.0)) / cnt
    var = jnp.sum(jnp.where(valid, (md - mean) ** 2, 0.0)) / cnt
    thresh = mean + sigma * jnp.sqrt(jnp.maximum(var, 0.0))
    return (md < thresh) & valid


def _sor_mask_padded(pos, n_valid, k: int, sigma, approx: bool = False,
                     method: str = "window", passes: int = 2):
    if method == "grid":
        p = pos.shape[0]
        valid = jnp.arange(p) < n_valid
        md = _sor_md_impl(pos, valid, k, DEFAULT_CAP, 2048, approx=approx)
        return _sor_mask_stats(md, valid, n_valid, sigma)
    return _sor_mask_window_fused(pos, n_valid, sigma, k, approx, passes)


def sor_mask(pos: jax.Array, k: int, sigma: float, approx: bool | None = None,
             method: str = "window", passes: int = 2) -> jax.Array:
    """Keep-mask: mean_knn_dist < mean + sigma * std (reference gpu_ops.py:259-263).

    Pads to a power-of-two bucket internally — one compile per (bucket, k).
    ``method``: "window" (default; Morton-window candidates, MXU distances,
    exact for n <= 3072) or "grid" (27-cell exact grid scan, gather-heavy).
    ``passes``: window-method recall ensemble — md is the elementwise MIN
    over this many space-filling orderings (2 gives >0.999 KDTree mask
    agreement on adversarial clustered scenes; 1 is the cheap single-pass).
    ``approx``: select the k nearest via ``jax.lax.approx_max_k`` (the TPU
    partial-reduction primitive, ~16x faster than an exact per-row top-k,
    recall 0.95) instead of ``lax.top_k``.  Defaults to True for the window
    method — the candidate window is already approximate, and measured mask
    agreement vs an exact KDTree is >0.9999 either way — and False for grid.
    """
    if approx is None:
        approx = method == "window"
    n = pos.shape[0]
    p = next_pow2(n)
    posp = pad_rows(pos, p, PAD_POS)
    return _sor_mask_padded(
        posp, jnp.int32(n), min(int(k), MAX_K), jnp.float32(sigma),
        approx=approx, method=method, passes=passes,
    )[:n]
