"""K-Means on TPU — the replacement for the reference's Taichi kernels.

The reference (processing/gpu_ops.py:58-96, 178-191) runs a scalar
brute-force assign loop (O(N*K*D) per element) and an atomic-add update.
TPU-first redesign:

  - **fused Lloyd step** (the hot path): one Pallas kernel computes labels
    AND the segment sums/counts in a single pass over x, with the FULL
    centroid set resident in VMEM (K <= 2048 covers every workload the
    pipeline generates; larger K falls back to the tiled two-kernel path).
    Distance and one-hot matmuls run on the MXU in bf16 with f32
    accumulation by default — splat attributes are headed for 8-bit
    codebooks, so the ~0.4% bf16 input rounding is far below the
    quantization floor (``precision="f32"`` for exact parity tests).
    This replaced a two-kernel (assign, update) design whose [BN=512]x
    [BK=256] grid of 8k steps was per-step-overhead-bound at ~3% MXU
    utilization (round-1 measurement: 83 ms/iter; fused: ~7 ms/iter).
  - **assign**: argmin_k ||x - c||^2 computed as x2 - 2 x@c^T + c2 — the
    dominant term is a [BN,D]x[D,BK] matmul on the MXU; K-tiled kernel
    kept for the K > 2048 fallback, plus an XLA fallback with the same
    chunking for CPU/interpret tests.
  - **update**: segment-sum of points and counts via one-hot MXU matmuls;
    with ``axis_name`` the sums/counts are ``psum``'d across the device
    mesh — the distributed K-Means required by SURVEY.md §2.4 ("K-Means
    centroids all-reduced").
  - fixed ``iters`` with no convergence check (parity with the reference's
    contract, gpu_ops.py:27,186); empty clusters keep their previous
    centroid (divergence: the reference zeroes them, gpu_ops.py:76-96).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .padding import PAD_POS, next_pow2, pad_rows

_BN = 512   # points per tile
_BK = 256   # centroids per tile
_LANE = 128


def _pad_axis(a, mult, axis, value=0.0):
    n = a.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=value)


# ----------------------------------------------------------- pallas assign


def _assign_kernel(x_ref, ct_ref, c2_ref, dist_ref, idx_ref):
    j = pl.program_id(1)
    x = x_ref[:]   # [BN, Dp]
    ct = ct_ref[:]  # [Dp, BK]  (pre-transposed on host)
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; drop ||x||^2 (constant per row).
    # The canonical [M,K]@[K,N] shape is the only contraction this chip's
    # Mosaic lowers straight to the MXU — contracting the last dims of
    # [BN,Dp]x[BK,Dp] makes it materialize a [BN,BK,Dp] broadcast on the
    # scoped-vmem stack (64M for 512x256x128 f32, over the 16M chip limit).
    xc = jnp.dot(x, ct, preferred_element_type=jnp.float32)  # [BN, BK]
    d = c2_ref[:] - 2.0 * xc
    tile_best = jnp.min(d, axis=1)
    tile_idx = jnp.argmin(d, axis=1).astype(jnp.int32) + j * _BK

    @pl.when(j == 0)
    def _():
        dist_ref[:] = tile_best[:, None]
        idx_ref[:] = tile_idx[:, None]

    @pl.when(j > 0)
    def _():
        prev = dist_ref[:, 0]
        better = tile_best < prev
        dist_ref[:] = jnp.where(better, tile_best, prev)[:, None]
        idx_ref[:] = jnp.where(better, tile_idx, idx_ref[:, 0])[:, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _assign_pallas(x: jax.Array, c: jax.Array, interpret: bool = False) -> jax.Array:
    n, d = x.shape
    k = c.shape[0]
    xp = _pad_axis(_pad_axis(x, _LANE, 1), _BN, 0)
    # Pad centroids with large-but-finite sentinels so padded entries never
    # win for real points (3e8 keeps ||c||^2 ~ 1e18, safely inside f32).
    cp = _pad_axis(_pad_axis(c, _LANE, 1), _BK, 0, value=3e8)
    np_, dp = xp.shape
    kp = cp.shape[0]
    # Zero the lane-padding columns so they contribute nothing to x.c or c2.
    cpt = jnp.where(jnp.arange(dp)[None, :] < d, cp, 0.0).T  # [dp, kp]
    c2 = jnp.sum(cpt * cpt, axis=0)[None, :]  # [1, kp]
    grid = (np_ // _BN, kp // _BK)
    dist, idx = pl.pallas_call(
        _assign_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BN, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, _BK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_BN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        ),
        interpret=interpret,
    )(xp, cpt, c2)
    return idx[:n, 0]


# -------------------------------------------------------------- xla assign


@jax.jit
def _assign_xla(x: jax.Array, c: jax.Array) -> jax.Array:
    n, d = x.shape
    k = c.shape[0]
    bn = 32768
    xp = _pad_axis(x, bn, 0)
    c2 = jnp.sum(c * c, axis=1)

    def one_block(xb):
        dist = c2[None, :] - 2.0 * xb @ c.T
        return jnp.argmin(dist, axis=1).astype(jnp.int32)

    labels = jax.lax.map(one_block, xp.reshape(-1, bn, d))
    return labels.reshape(-1)[:n]


def _resolve_impl(x, impl: str) -> str:
    if impl != "auto":
        return impl
    try:
        platform = next(iter(x.devices())).platform
    except Exception:
        platform = jax.default_backend()
    return "pallas" if platform in ("tpu", "axon") else "xla"


def assign(x: jax.Array, c: jax.Array, impl: str = "auto") -> jax.Array:
    """Nearest-centroid labels [N] for points [N,D] and centroids [K,D]."""
    impl = _resolve_impl(x, impl)
    if impl == "pallas":
        return _assign_pallas(x, c)
    if impl == "pallas_interpret":
        return _assign_pallas(x, c, interpret=True)
    return _assign_xla(x, c)


# ------------------------------------------------------------------ update


def _update_kernel(lab_ref, x_ref, sums_ref, cnt_ref):
    j = pl.program_id(0)
    i = pl.program_id(1)
    lab = lab_ref[:]  # [1, BN] int32
    x = x_ref[:]      # [BN, Dp]
    rows = jax.lax.broadcasted_iota(jnp.int32, (_BK, _BN), 0) + j * _BK
    onehot = (rows == lab).astype(jnp.float32)  # [BK, BN]
    # Segment-sum as an MXU matmul: sums_j += onehot @ x.  This replaces
    # jax.ops.segment_sum, whose scatter lowering serializes on TPU and
    # measured 8x the cost of the assign matmul at N=1M, K=1024.
    psum = jnp.dot(onehot, x, preferred_element_type=jnp.float32)  # [BK, Dp]
    pcnt = jnp.sum(onehot, axis=1)[:, None]  # [BK, 1]

    @pl.when(i == 0)
    def _():
        sums_ref[:] = psum
        cnt_ref[:] = pcnt

    @pl.when(i > 0)
    def _():
        sums_ref[:] += psum
        cnt_ref[:] += pcnt


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _update_sums_pallas(x: jax.Array, labels: jax.Array, k: int,
                        interpret: bool = False):
    """(sums [k,D], counts [k]) via one-hot MXU matmuls, no scatter.

    Out-of-range labels (the ``k`` discard bin for padded rows) land in the
    centroid-padding region and are sliced away — kp is always > the real k
    when a discard bin is in use because pads round UP to _BK (when k is an
    exact multiple of _BK, label k matches no iota row at all).
    """
    n, d = x.shape
    xp = _pad_axis(_pad_axis(x, _LANE, 1), _BN, 0)
    np_, dp = xp.shape
    kp = max(_BK, ((k + _BK - 1) // _BK) * _BK)
    # Padded x rows carry label -1 (matches no row of the iota).
    labp = jnp.full((1, np_), -1, jnp.int32).at[0, :n].set(labels.astype(jnp.int32))
    grid = (kp // _BK, np_ // _BN)
    sums, counts = pl.pallas_call(
        _update_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BN), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, dp), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_BK, dp), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BK, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((kp, dp), jnp.float32),
            jax.ShapeDtypeStruct((kp, 1), jnp.float32),
        ),
        interpret=interpret,
    )(labp, xp)
    return sums[:k, :d], counts[:k, 0]


def update(x: jax.Array, labels: jax.Array, k: int, prev: jax.Array,
           axis_name: str | None = None, valid: jax.Array | None = None,
           impl: str = "auto"):
    """New centroids = mean of assigned points; empty clusters keep prev.

    ``valid`` masks out padded rows (their labels route to a discard bin).
    """
    if valid is not None:
        labels = jnp.where(valid, labels, k)
    impl = _resolve_impl(x, impl)
    if impl in ("pallas", "pallas_interpret"):
        sums, counts = _update_sums_pallas(
            x, labels, k, interpret=(impl == "pallas_interpret")
        )
    else:
        sums = jax.ops.segment_sum(x, labels, num_segments=k + 1)[:k]
        counts = jax.ops.segment_sum(
            jnp.ones_like(labels, jnp.float32), labels, num_segments=k + 1
        )[:k]
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
        counts = jax.lax.psum(counts, axis_name)
    safe = jnp.maximum(counts, 1.0)
    new = sums / safe[:, None]
    return jnp.where(counts[:, None] > 0, new, prev), counts


# -------------------------------------------------------- fused lloyd step
#
# labels + segment sums/counts in ONE pass over x: per [BN, 128] block, the
# kernel runs the distance matmul against the VMEM-resident [128, KP]
# transposed centroids, takes the row argmin, builds the [KP, BN] one-hot,
# and accumulates one-hot @ x into the revisited [KP, 128] sums block.
# x is read from HBM exactly once per Lloyd iteration.

_RESIDENT_K = 2048  # max padded K the fused kernel keeps resident in VMEM


def _lloyd_kernel(nv_ref, x_ref, ct_ref, c2_ref, sums_ref, cnt_ref, lab_ref,
                  *, bn: int, kp: int, dtype):
    i = pl.program_id(0)
    xf = x_ref[:]              # [BN, 128] f32
    x = xf.astype(dtype)
    d = c2_ref[:] - 2.0 * jnp.dot(x, ct_ref[:], preferred_element_type=jnp.float32)
    lab = jnp.argmin(d, axis=1).astype(jnp.int32)      # [BN]
    lab_ref[:] = lab[:, None]
    # rows at global index >= n_valid are padding: label -1 matches no
    # one-hot row, so they contribute nothing to sums/counts
    gid = i * bn + jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0)[:, 0]
    labm = jnp.where(gid < nv_ref[0, 0], lab, -1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (kp, bn), 0)
    onehot = (rows == labm[None, :]).astype(dtype)     # [KP, BN] exact 0/1
    psums = jnp.dot(onehot, x, preferred_element_type=jnp.float32)  # [KP, 128]
    pcnt = jnp.sum(onehot.astype(jnp.float32), axis=1)[:, None]

    @pl.when(i == 0)
    def _():
        sums_ref[:] = psums
        cnt_ref[:] = pcnt

    @pl.when(i > 0)
    def _():
        sums_ref[:] += psums
        cnt_ref[:] += pcnt


def _lloyd_pallas(x, c, k: int, n_valid, interpret: bool, precision: str):
    n, d = x.shape
    kp = max(128, ((k + 127) // 128) * 128)
    bn = 1024 if kp <= 1024 else 512
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    xp = _pad_axis(_pad_axis(x, _LANE, 1), bn, 0)
    np_, dp = xp.shape
    cp = _pad_axis(_pad_axis(c, _LANE, 1), kp, 0, value=3e8)
    cpt = jnp.where(jnp.arange(dp)[None, :] < d, cp, 0.0).T  # [128, kp]
    c2 = jnp.sum(cpt * cpt, axis=0)[None, :].astype(jnp.float32)
    nv = jnp.full((1, 1), n, jnp.int32) if n_valid is None else (
        jnp.asarray(n_valid, jnp.int32).reshape(1, 1))
    kern = functools.partial(_lloyd_kernel, bn=bn, kp=kp, dtype=dtype)
    sums, cnt, lab = pl.pallas_call(
        kern,
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((kp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((kp, dp), jnp.float32),
            jax.ShapeDtypeStruct((kp, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        ),
        interpret=interpret,
    )(nv, xp, cpt.astype(dtype), c2)
    return sums[:k, :d], cnt[:k, 0], lab[:n, 0]


def _lloyd_xla(x, c, k: int, n_valid):
    """Blocked XLA fallback with identical semantics (CPU meshes, tests)."""
    n, d = x.shape
    bn = min(8192, max(256, n))
    xp = _pad_axis(x, bn, 0)
    nv = jnp.int32(n) if n_valid is None else jnp.asarray(n_valid, jnp.int32)
    c2 = jnp.sum(c * c, axis=1)

    def blk(carry, args):
        sums, cnt = carry
        xb, i0 = args
        dist = c2[None, :] - 2.0 * xb @ c.T
        lab = jnp.argmin(dist, axis=1).astype(jnp.int32)
        valid = (i0 + jnp.arange(bn)) < nv
        onehot = jnp.where(
            valid[:, None], lab[:, None] == jnp.arange(k)[None, :], False
        ).astype(jnp.float32)                              # [bn, k]
        return (sums + onehot.T @ xb, cnt + jnp.sum(onehot, axis=0)), lab

    nb = xp.shape[0] // bn
    (sums, cnt), labs = jax.lax.scan(
        blk,
        (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)),
        (xp.reshape(nb, bn, d), jnp.arange(nb) * bn),
    )
    return sums, cnt, labs.reshape(-1)[:n]


def lloyd_step(x, c, k: int, n_valid=None, impl: str = "auto",
               precision: str = "bf16"):
    """One fused Lloyd iteration: (sums [k,D], counts [k], labels [N]).

    Callers divide (and optionally ``psum`` across a mesh first):
    ``new_c = where(counts > 0, sums / max(counts, 1), prev_c)``.
    """
    impl = _resolve_impl(x, impl)
    kp = max(128, ((k + 127) // 128) * 128)
    if impl in ("pallas", "pallas_interpret") and kp <= _RESIDENT_K \
            and x.shape[1] <= _LANE:
        return _lloyd_pallas(
            x, c, k, n_valid, interpret=(impl == "pallas_interpret"),
            precision=precision,
        )
    return _lloyd_xla(x, c, k, n_valid)


# ------------------------------------------------------------------ driver


# 64k pool: >=64x oversampling at k=1024.  NOTE: 16384 measured slightly
# faster init but repeatedly faulted this environment's TPU tunnel
# (program-dependent axon wedge); 65536 runs clean — do not shrink.
_INIT_SUBSAMPLE = 65536


def init_centroids(x: jax.Array, k: int, key: jax.Array,
                   valid: jax.Array | None = None,
                   n_valid: jax.Array | None = None) -> jax.Array:
    """k-means++ D^2-sampling init.

    Quality improvement over the reference's uniform random choice
    (gpu_ops.py:182) — avoids the merged/split-cluster local minima that
    plague Lloyd with fixed iteration counts.  O(k*N) via a running
    min-distance accumulator in a fori_loop.  ``valid`` masks padded rows
    out of the sampling distribution.

    The D^2-sampling rounds each sweep the candidate pool, so the pool is
    capped at a uniform random subsample of 64k points (the sklearn-style
    practice) — at 1M points this cuts init from ~0.8s to ~30ms on-chip
    without a measurable quality change over 10 Lloyd iterations.
    ``n_valid`` (traced) enables the subsampling path.
    """
    if n_valid is not None and x.shape[0] > _INIT_SUBSAMPLE > k:
        skey, key = jax.random.split(key)
        u = jax.random.uniform(skey, (_INIT_SUBSAMPLE,))
        idx = jnp.clip((u * n_valid).astype(jnp.int32), 0, x.shape[0] - 1)
        x = x[idx]
        valid = None  # all sampled rows are valid by construction
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = x[0]
    centroids = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)
    d2 = jnp.sum((x - first[None, :]) ** 2, axis=1)
    if valid is not None:
        d2 = jnp.where(valid, d2, 0.0)

    # Over-sampling: draw m candidates per round (k-means||-style) so the
    # serial chain is ~128 rounds instead of k — at k=1024 the sequential
    # loop was latency-bound at ~50 ms on-chip; batched it's ~6 ms.  Within
    # a round the m draws share one D^2 distribution (duplicates are
    # possible but vanishingly rare on a 64k pool and merely yield an
    # empty cluster later).
    m = max(1, k // 128)
    rounds = -(-(k - 1) // m)
    keys = jax.random.split(key, rounds)
    x2 = jnp.sum(x * x, axis=1)

    def body(r, state):
        centroids, d2 = state
        logits = jnp.log(jnp.maximum(d2, 1e-30))
        idx = jax.random.categorical(keys[r], logits, shape=(m,))
        c = x[idx]                                       # [m, D]
        off = jnp.minimum(1 + r * m, k - m)
        centroids = jax.lax.dynamic_update_slice(centroids, c, (off, 0))
        dc = x2[:, None] - 2.0 * x @ c.T + jnp.sum(c * c, axis=1)[None, :]
        nd2 = jnp.minimum(d2, jnp.min(dc, axis=1))
        if valid is not None:
            nd2 = jnp.where(valid, nd2, 0.0)
        return centroids, nd2

    centroids, _ = jax.lax.fori_loop(0, rounds, body, (centroids, d2))
    return centroids


def _centroid_means(sums, counts, prev):
    new = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(counts[:, None] > 0, new, prev)


@functools.partial(jax.jit, static_argnames=("k", "iters", "impl", "precision"))
def _kmeans_jit(x, n_valid, seed, k, iters, impl, precision):
    valid = jnp.arange(x.shape[0]) < n_valid
    init = init_centroids(x, k, jax.random.PRNGKey(seed), valid=valid,
                          n_valid=n_valid)

    def body(c, _):
        sums, counts, _ = lloyd_step(x, c, k, n_valid=n_valid, impl=impl,
                                     precision=precision)
        return _centroid_means(sums, counts, c), None

    c, _ = jax.lax.scan(body, init, None, length=iters)
    # final labels against the final centroids: one more fused pass (the
    # extra one-hot matmul is noise next to a separate assign program)
    _, _, labels = lloyd_step(x, c, k, n_valid=n_valid, impl=impl,
                              precision=precision)
    return c, labels


def kmeans(
    data,
    k: int,
    max_iter: int = 10,
    seed: int = 0,
    impl: str = "auto",
    precision: str = "bf16",
):
    """Lloyd iterations with fixed ``max_iter`` (reference gpu_ops.kmeans contract).

    Returns (centroids [K,D] f32, labels [N] i32). If k >= N, returns the
    data itself as centroids (reference gpu_ops.py:30-31).  The point axis
    is padded to a power-of-two bucket — one compile per (bucket, D, k).
    """
    x = jnp.asarray(data, jnp.float32)
    if x.ndim == 1:
        x = x[:, None]
    n = x.shape[0]
    if k >= n:
        return np.asarray(x), np.arange(n, dtype=np.int32)
    p = next_pow2(n)
    xp = pad_rows(x, p, PAD_POS)
    if impl == "auto":
        mesh = _dispatch_mesh(p)
        if mesh is not None:
            from ..parallel.distributed import sharded_kmeans

            c, labels = sharded_kmeans(
                xp, int(k), mesh, max_iter=int(max_iter), seed=int(seed),
                n_valid=jnp.int32(n), precision=precision,
            )
            return c, labels[:n]
    c, labels = _kmeans_jit(
        xp, jnp.int32(n), jnp.uint32(seed), int(k), int(max_iter),
        _resolve_impl(x, impl), precision,
    )
    return c, labels[:n]


def _dispatch_mesh(n_rows: int, chunks: int | None = None):
    """The active mesh iff the padded workload divides across its devices —
    automatic multi-chip dispatch, the TPU-native analogue of the
    reference's GPU/CPU fallback ladder (gpu_ops.py:33-46)."""
    from ..parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None or mesh.devices.size <= 1:
        return None
    nd = mesh.devices.size
    if n_rows % nd != 0 or (chunks is not None and chunks % nd != 0):
        return None
    return mesh


# --------------------------------------------------------- chunked kmeans


def _chunked_core(x, n_valid, seed, num_chunks: int, k: int, iters: int,
                  impl: str, chunk_offset=0, precision: str = "bf16"):
    """Chunked-clustering core shared by the single-device jit and the
    mesh-sharded path (parallel/distributed.sharded_kmeans_chunked), where
    ``chunk_offset`` is the shard's first GLOBAL chunk index — it keys both
    the per-chunk PRNG fold and the label offsets, so results are identical
    for any device count."""
    p, d = x.shape
    chunk = p // num_chunks
    xc = x.reshape(num_chunks, chunk, d)
    row = jnp.arange(chunk)

    def one(args):
        xb, cidx = args
        gcidx = cidx + chunk_offset
        valid = (gcidx * chunk + row) < n_valid
        nv_local = jnp.clip(n_valid - gcidx * chunk, 0, chunk)
        init = init_centroids(
            xb, k, jax.random.fold_in(jax.random.PRNGKey(seed), gcidx), valid=valid
        )

        def body(c, _):
            sums, counts, _ = lloyd_step(xb, c, k, n_valid=nv_local,
                                         impl=impl, precision=precision)
            return _centroid_means(sums, counts, c), None

        c, _ = jax.lax.scan(body, init, None, length=iters)
        _, _, labels = lloyd_step(xb, c, k, n_valid=nv_local, impl=impl,
                                  precision=precision)
        return c, labels

    cents, labels = jax.lax.map(one, (xc, jnp.arange(num_chunks)))
    offs = ((jnp.arange(num_chunks) + chunk_offset) * k)[:, None]
    return cents.reshape(num_chunks * k, d), (labels + offs).reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("num_chunks", "k", "iters", "impl", "precision")
)
def _kmeans_chunked_jit(x, n_valid, seed, num_chunks: int, k: int, iters: int,
                        impl: str, precision: str):
    return _chunked_core(x, n_valid, seed, num_chunks, k, iters, impl,
                         precision=precision)


def kmeans_chunked(
    data,
    num_chunks: int,
    k_per_chunk: int,
    max_iter: int = 10,
    seed: int = 0,
    impl: str = "auto",
    precision: str = "bf16",
):
    """Locality-chunked K-Means (the SOG shN palette strategy, reference
    sog.py:526-549) as ONE jit program: ``lax.map`` over equal-size chunks,
    each fitting its own k-means++-initialized codebook.

    Returns (centroids [num_chunks*k, D], labels [N] offset per chunk).
    """
    x = jnp.asarray(data, jnp.float32)
    if x.ndim == 1:
        x = x[:, None]
    n = x.shape[0]
    chunk = -(-n // num_chunks)
    chunk = next_pow2(chunk, floor=max(256, k_per_chunk))
    p = chunk * num_chunks
    xp = pad_rows(x, p, PAD_POS)
    if impl == "auto":
        mesh = _dispatch_mesh(p, chunks=num_chunks)
        if mesh is not None:
            from ..parallel.distributed import sharded_kmeans_chunked

            c, labels = sharded_kmeans_chunked(
                xp, jnp.int32(n), int(num_chunks), int(k_per_chunk),
                int(max_iter), int(seed), mesh, precision=precision,
            )
            return c, labels[:n]
    c, labels = _kmeans_chunked_jit(
        xp, jnp.int32(n), int(seed), int(num_chunks), int(k_per_chunk),
        int(max_iter), _resolve_impl(x, impl), precision,
    )
    return c, labels[:n]
