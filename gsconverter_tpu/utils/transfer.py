"""Host<->device transfer policy for the conversion pipeline.

Measured on this environment's TPU tunnel (see ARCHITECTURE.md §transfers):
host->device sustains ~1 GB/s, while device->host is ~16 MB/s for a single
large readback and ~40 MB/s when split into concurrent chunked readbacks
with ``copy_to_host_async``.  That asymmetry drives the pipeline design:

  - heavy splat attributes stay HOST-resident (numpy leaves) between IO
    stages; only the arrays a device op actually consumes are uploaded
    (upload is cheap),
  - device ops return small results (masks, indices, statistics, packed
    codebooks) so the device->host direction carries kilobytes-to-a-few-MB,
  - when a full tensor readback is unavoidable (device-resident sharded
    pipelines), ``to_host`` uses the chunked-async path, ~2.5x faster than
    a plain ``np.asarray``.

The reference has no equivalent split: it is numpy end-to-end with Taichi
GPU round trips per hot op (/root/reference/gsconverter/processing/
gpu_ops.py:193-263).  On real TPU hosts (PCIe-attached, tens of GB/s both
ways) the same API simply becomes cheaper; nothing here is tunnel-specific
except the constants.
"""

from __future__ import annotations

import concurrent.futures as _cf

import jax
import numpy as np

# Chunk size for device->host readbacks: large enough to amortize the
# ~25 ms per-transfer RPC latency, small enough to overlap several streams.
_CHUNK_BYTES = 4 << 20
_MAX_STREAMS = 16


def is_host(x) -> bool:
    """True when ``x`` is host-resident (numpy) data."""
    return isinstance(x, (np.ndarray, np.generic))


def cloud_is_host(cloud) -> bool:
    """True when the cloud's array leaves live on host (numpy pipeline)."""
    return is_host(cloud.pos)


def to_host(arr) -> np.ndarray:
    """Device->host readback using chunked concurrent transfers.

    numpy inputs pass through untouched.  jax.Arrays are split along axis 0
    into ~8 MB chunks which are fetched concurrently — measured ~2.5x
    faster than a single ``np.asarray`` on this environment's tunnel.
    """
    if is_host(arr):
        return np.asarray(arr)
    arr = jax.block_until_ready(arr)
    nbytes = arr.size * arr.dtype.itemsize
    n = arr.shape[0] if arr.ndim else 0
    if nbytes <= _CHUNK_BYTES or n < 2:
        return np.asarray(arr)
    row_bytes = max(1, nbytes // n)
    rows_per_chunk = max(1, _CHUNK_BYTES // row_bytes)
    chunks = [arr[i:i + rows_per_chunk] for i in range(0, n, rows_per_chunk)]
    for c in chunks:
        c.copy_to_host_async()
    with _cf.ThreadPoolExecutor(min(_MAX_STREAMS, len(chunks))) as ex:
        outs = list(ex.map(np.asarray, chunks))
    return np.concatenate(outs, axis=0)


def tree_to_host(tree):
    """``to_host`` over a pytree (None leaves preserved)."""
    return jax.tree_util.tree_map(to_host, tree)
