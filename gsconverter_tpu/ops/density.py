"""Density filter — voxel histogram + connected-component clustering on TPU.

Reference contract (processing/data_processor.py:11-117): voxelize at
floor(coords/voxel_size); count per voxel; keep voxels with
count >= N * threshold%/100; 6-connected BFS over dense voxels -> clusters;
keep the largest cluster (by voxel count, first wins on ties), or every
cluster >= 5% of the largest when ``keep_multicluster``.  Sensitivity slider
s in [0,1] maps to voxel = max(0.1, 2.0 - 1.8 s), threshold = 0.1 + 0.9 s
(data_processor.py:24-28).

TPU-first redesign (SURVEY.md §7.4 item 4): the reference's Python BFS is
inherently serial; we label clusters with iterative min-label propagation +
pointer jumping over the 6-neighbor voxel graph — O(log diameter) rounds of
fully-vectorized gathers inside a ``lax.while_loop``.

Two-stage execution (round-3 redesign, ~an order of magnitude less gather
traffic than the round-2 single-jit version): stage 1 sorts the point keys
once (one variadic ``lax.sort`` carries the unsort payload) and counts the
OCCUPIED voxels; that count — typically 30-100x smaller than N at the
reference's ~32 points/voxel densities — crosses to the host as one scalar
and sizes the static voxel table of stage 2, so the 6-neighbor
searchsorted adjacency and the label-propagation loop run over a
power-of-two table of occupied voxels instead of an N-row table.  The
splat axis and the voxel table are both padded to power-of-two buckets
(one compile per bucket pair).

Grid keys are exact 30-bit int32 packs (1024 cells/axis) on the fast path;
when the scene extent needs more, the wide path packs exact 60-bit int64
keys (1M cells/axis) under ``jax.experimental.enable_x64`` — matching the
reference's unbounded int64 voxel coords up to extent/voxel ~1e6 (beyond
that, coordinates clip; the reference's float64 voxel ids lose integer
exactness at similar magnitudes anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .padding import PAD_POS, next_pow2, pad_rows

GRID_BITS = 10
GRID_MAX = (1 << GRID_BITS) - 1
WIDE_BITS = 20
KEY_SENTINEL = jnp.int32(0x7FFFFFFF)


def sensitivity_to_params(sensitivity: float) -> tuple[float, float]:
    voxel = max(0.1, 2.0 - sensitivity * 1.8)
    threshold = 0.1 + sensitivity * 0.9
    return voxel, threshold


@functools.partial(jax.jit, static_argnames=("bits",))
def _density_stage1(pos, n_valid, voxel_size, bits: int):
    """Voxel keys -> one sort -> per-point voxel ids + occupied-voxel count.

    Returns (skeys [N] sorted keys, voxel_id_sorted [N], inv [N] per-point
    voxel id in ORIGINAL order, n_vox scalar occupied-voxel count).
    """
    kdt = jnp.int32 if bits <= GRID_BITS else jnp.int64
    gmax = (1 << bits) - 1
    sentinel = jnp.asarray(jnp.iinfo(kdt).max, kdt)
    n = pos.shape[0]
    valid = jnp.arange(n) < n_valid
    vox = jnp.floor(pos / voxel_size)
    base = jnp.min(jnp.where(valid[:, None], vox, jnp.float32(PAD_POS)), axis=0)
    ci = jnp.clip(vox - base, 0, gmax).astype(kdt)
    keys = (ci[:, 0] << (2 * bits)) | (ci[:, 1] << bits) | ci[:, 2]
    keys = jnp.where(valid, keys, sentinel)

    # one variadic sort carries the unsort payload (saves the second full
    # argsort of the round-2 version)
    skeys, order = jax.lax.sort(
        (keys, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    is_first = jnp.concatenate([jnp.ones(1, bool), skeys[1:] != skeys[:-1]])
    voxel_id_sorted = (jnp.cumsum(is_first) - 1).astype(jnp.int32)
    sv = skeys != sentinel
    n_vox = jnp.sum((is_first & sv).astype(jnp.int32))
    inv = jnp.zeros(n, jnp.int32).at[order].set(voxel_id_sorted)
    return skeys, voxel_id_sorted, sv, inv, n_vox, valid


@functools.partial(jax.jit, static_argnames=("keep_multicluster", "bits", "m"))
def _density_stage2(
    skeys, voxel_id_sorted, sv, n_valid, threshold_percentage,
    keep_multicluster: bool, bits: int, m: int,
):
    """Cluster the occupied voxels; returns keep-flag per voxel id [m]."""
    kdt = skeys.dtype
    gmax = (1 << bits) - 1
    sentinel = jnp.asarray(jnp.iinfo(kdt).max, kdt)

    # voxel table: unique keys + counts (segment ops scatter N rows into the
    # SMALL static table; ids >= m — only the sentinel pad group — drop out)
    uniq_keys = jax.ops.segment_max(
        jnp.where(sv, skeys, jnp.asarray(-1, kdt)), voxel_id_sorted,
        num_segments=m,
    )
    counts = jax.ops.segment_sum(
        sv.astype(jnp.int32), voxel_id_sorted, num_segments=m
    )

    min_points = (threshold_percentage / 100.0 * n_valid.astype(jnp.float32)).astype(jnp.int32)
    # a real occupied voxel: empty table slots yield segment_max's identity
    # (INT_MIN) and any in-range pad group carries the sentinel
    vox_valid = (uniq_keys >= 0) & (uniq_keys != sentinel)
    # match the reference's int() truncation then >= comparison
    dense = (counts >= min_points) & vox_valid & (counts > 0)

    # --- 6-neighbor adjacency among dense voxels via searchsorted ---
    ux = uniq_keys >> (2 * bits)
    uy = (uniq_keys >> bits) & gmax
    uz = uniq_keys & gmax
    offs = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        kdt,
    )
    ncoord = jnp.stack([ux, uy, uz], axis=1)[:, None, :] + offs[None, :, :]  # [m,6,3]
    in_grid = jnp.all((ncoord >= 0) & (ncoord <= gmax), axis=-1)
    nkeys = (
        (ncoord[..., 0] << (2 * bits)) | (ncoord[..., 1] << bits) | ncoord[..., 2]
    )
    search_keys = jnp.where(vox_valid, uniq_keys, sentinel)  # stays ascending
    loc = jnp.searchsorted(search_keys, nkeys.reshape(-1)).reshape(nkeys.shape)
    loc = jnp.clip(loc, 0, m - 1).astype(jnp.int32)
    found = (search_keys[loc] == nkeys) & in_grid
    neigh_dense = dense[loc] & found

    # --- min-label propagation + pointer jumping ---
    labels0 = jnp.where(dense, jnp.arange(m, dtype=jnp.int32), m)
    neigh_idx = jnp.where(neigh_dense, loc, m)  # [m,6]

    def body(state):
        labels, _ = state
        padded = jnp.concatenate([labels, jnp.array([m], jnp.int32)])
        nl = jnp.min(padded[neigh_idx], axis=1)
        new = jnp.where(dense, jnp.minimum(labels, nl), labels)
        new = jnp.where(dense, jnp.minimum(new, padded[new]), new)
        new = jnp.where(dense, jnp.minimum(new, padded[padded[new]]), new)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], body, (labels0, jnp.array(True))
    )

    # --- cluster sizes in voxels (reference counts voxels, not points) ---
    sizes = jax.ops.segment_sum(
        dense.astype(jnp.int32), jnp.clip(labels, 0, m - 1), num_segments=m
    )
    max_size = jnp.max(sizes)
    if keep_multicluster:
        keep_cluster = sizes.astype(jnp.float32) >= max_size * 0.05
    else:
        # single largest cluster only; first label wins on ties
        # (reference breaks after the first cluster, data_processor.py:106)
        keep_cluster = jnp.arange(m) == jnp.argmax(sizes)
    return dense & keep_cluster[jnp.clip(labels, 0, m - 1)]


@jax.jit
def _density_gather(vox_keep, inv, valid):
    return vox_keep[jnp.clip(inv, 0, vox_keep.shape[0] - 1)] & valid


def _density_mask_host(
    pos: np.ndarray,
    voxel_size: float,
    threshold_percentage: float,
    keep_multicluster: bool,
) -> np.ndarray:
    """Host-resident numpy path — same contract as the device path.

    Rationale (measured, 1M splats): the device path is three dispatches
    plus a scalar sync; on this environment's high-latency device link that
    costs ~0.4 s while the arithmetic itself is trivial.  The host path is
    one int64 sort + searchsorted adjacency + an O(log diameter) label-
    propagation loop over the ~30-100x-smaller occupied-voxel table:
    ~0.1 s, no transfers.  Device-resident/sharded clouds still take the
    jit path (residency-aware dispatch in ``density_mask``).
    """
    n = pos.shape[0]
    vox = np.floor(pos.astype(np.float32, copy=False) / np.float32(voxel_size))
    base = vox.min(axis=0)
    # Key width by extent, like the device path: scenes within the 1023^3
    # grid pack exact 30-bit int32 keys (numpy's int32 sort/compare passes
    # run ~2x the int64 ones at ~1M points); wider scenes take the exact
    # 60-bit int64 pack.
    extent = float((vox.max(axis=0) - base).max()) if n else 0.0
    bits = GRID_BITS if extent <= GRID_MAX else WIDE_BITS
    kdt = np.int32 if bits == GRID_BITS else np.int64
    gmax = (1 << bits) - 1
    vox -= base
    np.clip(vox, 0, gmax, out=vox)
    ci = vox.astype(kdt)
    del vox
    keys = (ci[:, 0] << kdt(2 * bits)) | (ci[:, 1] << kdt(bits)) | ci[:, 2]

    skeys = np.sort(keys)
    is_first = np.empty(n, bool)
    is_first[0] = True
    np.not_equal(skeys[1:], skeys[:-1], out=is_first[1:])
    uniq = skeys[is_first]  # ascending occupied-voxel keys [m]
    starts = np.flatnonzero(is_first)
    counts = np.diff(np.append(starts, n)).astype(np.int64)
    m = uniq.shape[0]

    min_points = int(threshold_percentage / 100.0 * n)
    dense = counts >= min_points  # [m]

    # 6-neighbor adjacency among dense voxels via searchsorted on uniq
    ux, uy, uz = uniq >> kdt(2 * bits), (uniq >> kdt(bits)) & gmax, uniq & gmax
    offs = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        kdt,
    )
    ncoord = np.stack([ux, uy, uz], axis=1)[:, None, :] + offs[None, :, :]
    in_grid = np.all((ncoord >= 0) & (ncoord <= gmax), axis=-1)
    nkeys = ((ncoord[..., 0] << kdt(2 * bits))
             | (ncoord[..., 1] << kdt(bits)) | ncoord[..., 2])
    loc = np.searchsorted(uniq, nkeys.reshape(-1)).reshape(m, 6)
    loc = np.clip(loc, 0, m - 1)
    found = (uniq[loc] == nkeys) & in_grid
    neigh_ok = found & dense[loc] & dense[:, None]

    # min-label propagation with pointer jumping (same scheme as stage 2)
    labels = np.where(dense, np.arange(m, dtype=np.int64), m)
    neigh_idx = np.where(neigh_ok, loc, m)  # [m,6]
    while True:
        padded = np.append(labels, m)
        nl = padded[neigh_idx].min(axis=1)
        new = np.where(dense, np.minimum(labels, nl), labels)
        new = np.where(dense, np.minimum(new, padded[new]), new)
        new = np.where(dense, np.minimum(new, padded[padded[new]]), new)
        if np.array_equal(new, labels):
            break
        labels = new

    sizes = np.bincount(np.clip(labels, 0, m - 1), weights=dense, minlength=m)
    if keep_multicluster:
        keep_cluster = sizes >= sizes.max() * 0.05
    else:
        keep_cluster = np.arange(m) == int(np.argmax(sizes))
    vox_keep = dense & keep_cluster[np.clip(labels, 0, m - 1)]

    # Per-point result: the final N-point lookup is this path's dominant
    # cost when done as a binary search over uniq (~80 ms at 1M).  When the
    # occupied bounding subgrid is small enough to sit in cache, a direct-
    # index table turns it into one O(N) gather (~10 ms): mixed-radix flat
    # index over (dx, dy, dz) from the already-computed voxel coords.
    dx = int(ux.max()) + 1 if m else 1
    dy = int(uy.max()) + 1 if m else 1
    dz = int(uz.max()) + 1 if m else 1
    cells = dx * dy * dz
    if cells <= (1 << 26):  # <= 64 MB bool table
        table = np.zeros(cells, bool)
        table[(ux * dy + uy) * dz + uz] = vox_keep
        flat = (ci[:, 0].astype(np.int64) * dy + ci[:, 1]) * dz + ci[:, 2]
        return table[flat]
    return vox_keep[np.searchsorted(uniq, keys)]


def density_mask(
    pos: jax.Array,
    voxel_size: float,
    threshold_percentage: float,
    keep_multicluster: bool = False,
) -> jax.Array:
    """Keep-mask for the density filter over positions [N,3].

    Residency-aware: host numpy positions run the pure-numpy path (no
    device round trips — see ``_density_mask_host``); device arrays run
    the two-stage jit path, padded to power-of-two buckets (one compile
    per (point bucket, voxel bucket) pair).  Scenes whose extent exceeds
    1023 voxels per axis automatically take the exact int64 wide-grid path
    (1M cells/axis).
    """
    n = pos.shape[0]
    if isinstance(pos, np.ndarray) and n:
        return _density_mask_host(
            pos, float(voxel_size), float(threshold_percentage),
            keep_multicluster,
        )
    p = next_pow2(n)
    if isinstance(pos, np.ndarray):
        extent = float(np.max(pos.max(axis=0) - pos.min(axis=0))) if n else 0.0
    else:
        extent = float(
            jnp.max(jnp.max(pos[:n], axis=0) - jnp.min(pos[:n], axis=0))
        )
    posp = pad_rows(jnp.asarray(pos), p, PAD_POS)
    bits = GRID_BITS if extent / float(voxel_size) <= GRID_MAX else WIDE_BITS

    def run():
        skeys, vid, sv, inv, n_vox, valid = _density_stage1(
            posp, jnp.int32(n), jnp.float32(voxel_size), bits
        )
        # one scalar readback sizes the static voxel table (occupied voxels
        # + the sentinel pad group), typically 30-100x smaller than N
        m = next_pow2(max(int(n_vox) + 1, 256))
        vox_keep = _density_stage2(
            skeys, vid, sv, jnp.int32(n), jnp.float32(threshold_percentage),
            keep_multicluster, bits, m,
        )
        return _density_gather(vox_keep, inv, valid)[:n]

    if bits == GRID_BITS:
        return run()
    # wide grid: exact 60-bit int64 keys (x64 enabled for this trace only)
    with jax.enable_x64(True):
        return run()
