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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
        # Unified missing-neighbor rule (shared with the window path,
        # _sor_window_loop): fill at the largest FOUND distance, floored at
        # the method's search reach (one cell ring here) so fully isolated
        # points — zero neighbors in the 27-cell scan — still rank as
        # outliers instead of md=0.  Keeps sor_mean_knn_dists (grid) and
        # sor_mask (window) ranking sparse points identically
        # (tests/test_filters.py::test_sor_fill_semantics_agree).
        fill = (k - cnt).astype(jnp.float32) * jnp.maximum(
            jnp.max(dist, axis=1), cell)
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


def _morton_key(pos, valid, rot, shift):
    """Space-filling key for one ensemble ordering (invalid rows sort last).

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

    Single source of truth for the quantization/shift keying — used by both
    ``_sor_window_bin`` and the fused ensemble loop so the two window paths
    can never drift apart.
    """
    from .quant import morton3_u32

    posr = pos if rot is None else pos @ jnp.asarray(rot, jnp.float32).T
    big = jnp.float32(PAD_POS)
    mins = jnp.min(jnp.where(valid[:, None], posr, big), axis=0)
    maxs = jnp.max(jnp.where(valid[:, None], posr, -big), axis=0)
    rng = jnp.where(maxs > mins, maxs - mins, 1.0)
    t = jnp.clip((posr - mins) / rng, 0.0, 1.0)
    g = (t * 511.0 + jnp.asarray(shift, jnp.float32) * 512.0).astype(jnp.uint32)
    return jnp.where(
        valid, morton3_u32(g[:, 0], g[:, 1], g[:, 2]), jnp.uint32(0xFFFFFFFF)
    )


@jax.jit
def _sor_window_bin(pos: jax.Array, valid: jax.Array,
                    rot=None, shift=(0.0, 0.0, 0.0)):
    """Morton sort over the valid points (invalid rows sort to the end).
    Keying delegated to ``_morton_key`` (shared with the ensemble loop)."""
    mkey = _morton_key(pos, valid, rot, shift)
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


# ------------------------------------------------- pallas window kernel
#
# The XLA window loop materializes the [block, cwidth] distance matrix in
# HBM between the matmul and the top-k (bandwidth-bound, ~280ms/pass at
# 4M).  The Pallas kernel keeps it resident in VMEM and replaces top-k
# with a per-lane binary search for the k-th-neighbor radius (the mean of
# the k nearest needs only the threshold + a masked sum, not the sorted
# values).  Layout: candidates on SUBLANES [cwidth, block], points on
# LANES — every reduction is an elementwise accumulation over sublanes,
# never a cross-lane shuffle.  Distances are computed directly as
# sum((c-x)^2) on the VPU: exact for nearby pairs (no ||c||^2-2cx
# cancellation) and self-pairs land on an exact 0.0.

_D_VALID_MAX = 1e12  # pad sentinels sit at PAD_POS=1e15; real pairs are closer
_PALLAS_BLOCK = 512  # lane-tile block of the Pallas kernel (scoped VMEM < 16MB)


def _window_md_kernel(xt_ref, *refs, k: int, iters: int, window: int,
                      block: int, rows_per_out: int):
    # VMEM discipline: the only [cwidth, block] resident tensor is the bf16
    # distance scratch; every reduction re-reads it so Mosaic streams tiles
    # instead of materializing extra full-size f32 temporaries (a first
    # draft kept dv/fin/dz live simultaneously -> 24MB scoped-vmem OOM).
    chunk_refs, out_ref, d_ref = refs[:-2], refs[-2], refs[-1]
    cand = jnp.concatenate([r[:] for r in chunk_refs], axis=0)  # [cw, 3]
    acc = None
    for a in range(3):
        t = cand[:, a:a + 1] - xt_ref[a:a + 1, :]  # [cw,1] - [1,block]
        acc = t * t if acc is None else acc + t * t
    d = jnp.sqrt(acc)
    # self/duplicate pairs (exact or near-zero distance) and PAD_POS
    # sentinel rows are invalid -> inf
    d_ref[:] = jnp.where(
        (d > 1e-6) & (d < _D_VALID_MAX), d, jnp.inf
    ).astype(jnp.bfloat16)
    kf = jnp.float32(k)

    # Each stat re-reads the bf16 scratch so its elementwise chain has a
    # single consumer (the reduction) and streams tile-by-tile — naming a
    # shared [cwidth, block] f32 temp would materialize it in scoped VMEM.
    def _stats(lo_row, n_rows):
        dv = d_ref[pl.ds(lo_row, n_rows), :].astype(jnp.float32)
        fin = dv < _D_VALID_MAX  # stored invalids are +inf
        dz = jnp.where(fin, dv, 0.0)
        return (
            jnp.sum(fin.astype(jnp.float32), axis=0, keepdims=True),
            jnp.sum(dz, axis=0, keepdims=True),
            jnp.max(dz, axis=0, keepdims=True),
        )

    cntv, sumv, dmax = _stats(0, block + 2 * window)  # [1, block] each
    # Tight upper bound for the search: the k-th nearest of ALL candidates
    # is <= the max over the Morton-middle block (>= k candidates there),
    # typically ~2-3x the true radius instead of dmax's window diameter.
    cntm, _, hmid = _stats(window, block)
    hi = jnp.where(cntm >= kf, hmid, dmax)
    lo = jnp.zeros_like(hi)

    # Invariant: count(d <= lo) < k <= count(d <= hi) whenever cntv >= k.
    # (bf16 compares are rejected by Mosaic on v5e — "Target does not
    # support this comparison" — so the scratch is upcast per read.)
    def body(_, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(
            (d_ref[:].astype(jnp.float32) <= mid).astype(jnp.float32),
            axis=0, keepdims=True,
        )
        pred = cnt >= kf
        return jnp.where(pred, lo, mid), jnp.where(pred, mid, hi)

    # (A quad-section variant — 3 thresholds per scratch scan — was
    # measured at parity or worse: the search is bound by threshold
    # compare+sum compute, not by scan count, and binary is the most
    # threshold-efficient bracketing.)
    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))

    dsel = d_ref[:].astype(jnp.float32)
    sel = dsel <= lo
    cl = jnp.sum(sel.astype(jnp.float32), axis=0, keepdims=True)
    sl = jnp.sum(jnp.where(sel, dsel, 0.0), axis=0, keepdims=True)
    # neighbors between lo and the k-th radius all sit within [lo, hi]
    mdk = (sl + (kf - cl) * 0.5 * (lo + hi)) / kf
    # fewer than k valid neighbors: fill at the largest found distance
    # (same rule as the XLA loop's max(dist) fill)
    mdf = (sumv + (kf - cntv) * dmax) / kf
    # out blocks span rows_per_out grid steps (Mosaic requires sublane
    # blocks of 8); each step writes its own row of the revisited block
    row = pl.program_id(0) % rows_per_out
    out_ref[pl.ds(row, 1), :] = jnp.where(cntv >= kf, mdk, mdf)


@functools.partial(
    jax.jit, static_argnames=("k", "window", "block", "iters", "interpret")
)
def _sor_window_loop_pallas(spos, k: int, window: int = 512,
                            block: int = 512, iters: int = 10,
                            interpret: bool = False):
    """Pallas mean-KNN over Morton windows.  ``spos`` must be Morton-sorted
    with padded/invalid rows at PAD_POS (how _sor_window_bin emits them);
    validity is recovered from the sentinel positions."""
    n = spos.shape[0]
    assert n % block == 0 and block % window == 0
    chunk = window
    posp = jnp.pad(spos, ((window, window), (0, 0)), constant_values=PAD_POS)
    post = jnp.pad(spos.T, ((0, 5), (0, 0)))  # [8, n] (rows 3..7 unused)
    nb = n // block
    nch = (block + 2 * window) // chunk
    rpc = block // chunk
    in_specs = [
        pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    ]
    for c in range(nch):
        in_specs.append(
            pl.BlockSpec(
                (chunk, 3), (lambda i, c=c: (i * rpc + c, 0)),
                memory_space=pltpu.VMEM,
            )
        )
    rpo = min(nb, 8)
    md = pl.pallas_call(
        functools.partial(
            _window_md_kernel, k=k, iters=iters, window=window, block=block,
            rows_per_out=rpo,
        ),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rpo, block), lambda i: (i // rpo, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, block), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block + 2 * window, block), jnp.bfloat16)
        ],
        interpret=interpret,
    )(post, *([posp] * nch))
    return md.reshape(-1)[:n]


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
                   window: int = 512, block: int = 1024, passes: int = 2,
                   impl: str = "xla", iters: int = 10):
    # Tuning history (v5e, 4M points): the original argsort+gather bin +
    # per-pass scatter-back cost ~160ms/pass on top of the window loop.
    # This version carries the payload THROUGH a variadic ``lax.sort``
    # (44ms vs 80ms argsort+gather) and keeps the running ensemble MIN in
    # sorted order — each pass re-sorts (positions, original index,
    # running md) by the next pass's Morton key, and only the LAST pass
    # pays one unsort (33ms vs 48ms scatter).  Single-pass window recall
    # ~0.93 overestimates md on dense clustered scenes; the rotated+
    # shifted ensemble MIN brings KDTree mask agreement above 0.999 (see
    # tests/test_filters.py::test_sor_adversarial_clustered_scene).
    # ``impl``: "xla" | "pallas" | "pallas_interpret" — the Pallas kernel
    # keeps the distance matrix in VMEM (see _window_md_kernel); it
    # requires the padded N to divide by its block (callers pad to pow2,
    # so any N >= 512 qualifies).
    k = min(int(k), MAX_K)
    n = pos.shape[0]
    pallas_block = _PALLAS_BLOCK
    use_pallas = (impl.startswith("pallas") and n % pallas_block == 0
                  and pallas_block % window == 0)
    # invalid rows -> sentinel positions, so validity survives the sorts
    # (and the Pallas kernel recovers it from the coordinates alone)
    cpos = jnp.where(valid[:, None], pos, PAD_POS)
    cidx = jnp.arange(n, dtype=jnp.int32)
    cmd = jnp.full(n, jnp.inf, jnp.float32)
    for rot, shift in _PASS_ORDERS[:max(1, passes)]:
        cvalid = cpos[:, 0] < _D_VALID_MAX
        key = _morton_key(cpos, cvalid, rot, shift)
        _, x_, y_, z_, cidx, cmd = jax.lax.sort(
            (key, cpos[:, 0], cpos[:, 1], cpos[:, 2], cidx, cmd), num_keys=1
        )
        cpos = jnp.stack([x_, y_, z_], axis=1)
        if use_pallas:
            md_sorted = _sor_window_loop_pallas(
                cpos, k, window, pallas_block, iters=iters,
                interpret=(impl == "pallas_interpret"),
            )
        else:
            svalid = x_ < _D_VALID_MAX
            md_sorted = _sor_window_loop(cpos, svalid, k, window,
                                         min(block, n), approx)
        cmd = jnp.minimum(cmd, md_sorted)
    # one unsort back to the caller's order
    _, md = jax.lax.sort((cidx, cmd), num_keys=1)
    return md


@functools.partial(
    jax.jit, static_argnames=("k", "approx", "passes", "impl", "window",
                              "iters")
)
def _sor_mask_window_fused(pos, n_valid, sigma, k: int, approx: bool,
                           passes: int = 2, impl: str = "xla",
                           window: int = 512, iters: int = 10):
    """bin + window loop + stats as ONE program (one device round trip)."""
    p = pos.shape[0]
    valid = jnp.arange(p) < n_valid
    md = _sor_md_window(pos, valid, k, approx=approx, passes=passes,
                        impl=impl, window=window, iters=iters)
    return _sor_mask_stats(md, valid, n_valid, sigma)


def sor_mean_knn_dists(pos: jax.Array, k: int = 25, cap: int = DEFAULT_CAP,
                       block: int = 2048) -> jax.Array:
    """Mean distance to the <=k nearest neighbors for every point [N,3].

    Missing-neighbor rule (shared with ``sor_mask``'s window path): when
    fewer than k neighbors are found, the missing slots fill at the largest
    found distance, floored at the method's search reach — so isolated
    points rank as outliers under BOTH code paths (one documented rule;
    tests/test_filters.py::test_sor_fill_semantics_agree)."""
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
                     method: str = "window", passes: int = 2,
                     impl: str = "xla", window: int = 512, iters: int = 10):
    if method == "grid":
        p = pos.shape[0]
        valid = jnp.arange(p) < n_valid
        md = _sor_md_impl(pos, valid, k, DEFAULT_CAP, 2048, approx=approx)
        return _sor_mask_stats(md, valid, n_valid, sigma)
    return _sor_mask_window_fused(pos, n_valid, sigma, k, approx, passes,
                                  impl=impl, window=window, iters=iters)


def resolve_window(k: int) -> int:
    """Candidate window ~10x the neighbor count (pow2): measured mask
    agreement vs an exact KDTree stays >0.999 at every production sigma
    while the VPU-bound candidate scans shrink proportionally (sweep in
    tools/sor_r3_prof.py; accuracy table in the round-3 notes)."""
    return max(128, next_pow2(8 * min(int(k), MAX_K)))


def sor_mask(pos: jax.Array, k: int, sigma: float, approx: bool | None = None,
             method: str = "window", passes: int | None = None,
             impl: str = "auto", window: int | None = None,
             iters: int | None = None) -> jax.Array:
    """Keep-mask: mean_knn_dist < mean + sigma * std (reference gpu_ops.py:259-263).

    Pads to a power-of-two bucket internally — one compile per (bucket, k).
    ``method``: "window" (default; Morton-window candidates, MXU distances,
    exact for n <= 3072) or "grid" (27-cell exact grid scan, gather-heavy).
    ``passes``: window-method recall ensemble — md is the elementwise MIN
    over this many space-filling orderings.  Default (None) resolves by
    sigma: 1 pass when sigma >= 3 (the production slider's floor; measured
    single-pass mask agreement vs an exact KDTree is already > 0.999
    there because the mu + sigma*std threshold sits far above the md
    overestimation), 2 passes for tighter thresholds.
    ``approx``: select the k nearest via ``jax.lax.approx_max_k`` (the TPU
    partial-reduction primitive, ~16x faster than an exact per-row top-k,
    recall 0.95) instead of ``lax.top_k``.  Defaults to True for the window
    method — the candidate window is already approximate, and measured mask
    agreement vs an exact KDTree is >0.9999 either way — and False for grid.
    NOTE: the Pallas window kernel uses its own binary-search radius
    approximation and ignores ``approx``; an explicit approx=False under
    impl="auto" therefore routes to the XLA loop (exact top-k within the
    window).
    ``impl``: "auto" resolves to the Pallas VMEM-resident kernel on TPU
    and the XLA loop elsewhere (resolved here, OUTSIDE jit, from the
    array's devices — inside a trace the platform is unknowable, the
    round-1 sharded-kmeans dispatch bug).
    """
    explicit_exact = approx is False
    if approx is None:
        approx = method == "window"
    # Quality escalation by sigma: the production slider bottoms out at
    # sigma=3 (intensity 10), where the mu+sigma*std threshold sits far
    # above the md approximation error — one pass, a k-scaled candidate
    # window and a 7-step radius search already give >0.999 KDTree mask
    # agreement.  Tighter (expert) sigmas get the high-accuracy config:
    # 2 ensemble passes, >=512 window, 10 search steps.
    fast = float(sigma) >= 3.0
    if passes is None:
        passes = 1 if fast else 2
    if window is None:
        window = resolve_window(k) if fast else max(512, resolve_window(k))
    if iters is None:
        iters = 7 if fast else 10
    if window <= 0:
        raise ValueError(f"sor_mask: window must be positive, got {window}")
    pos = jnp.asarray(pos)  # committed to a device BEFORE impl resolution
    n = pos.shape[0]
    p = next_pow2(n)
    auto_resolved = impl == "auto"
    if auto_resolved:
        from .kmeans import _resolve_impl

        impl = _resolve_impl(pos, "auto") if p >= 4096 else "xla"
        if explicit_exact and impl.startswith("pallas"):
            impl = "xla"  # caller asked for exact within-window top-k
    if impl.startswith("pallas") and _PALLAS_BLOCK % window != 0:
        # Mosaic kernel constraint: window must divide its 512-lane block.
        # Auto resolution silently takes the XLA loop (which handles any
        # window); only an EXPLICIT pallas request gets the clear error.
        if auto_resolved:
            impl = "xla"
        else:
            raise ValueError(
                f"sor_mask: impl='pallas' requires window to divide "
                f"{_PALLAS_BLOCK} (got {window}); use impl='xla' for "
                "arbitrary windows"
            )
    posp = pad_rows(pos, p, PAD_POS)
    return _sor_mask_padded(
        posp, jnp.int32(n), min(int(k), MAX_K), jnp.float32(sigma),
        approx=approx, method=method, passes=passes, impl=impl,
        window=window, iters=iters,
    )[:n]
