"""Multi-host sharded file IO.

Reference analogue: none — single-file read/write (SURVEY.md §2.4 row
"Multi-host IO").  Binary PLY vertex elements are fixed-size records, so
each host seeks to its slice and reads only its shard; writes assemble on
host 0 (or stripe per-host with ``save``/``load`` in utils.checkpoint).
"""

from __future__ import annotations

import numpy as np

from ..cloud import SplatCloud
from ..formats.ply_gs import cloud_from_vertex_array
from ..utils import ply as ply_io


def shard_bounds(n: int, shard: int, num_shards: int) -> tuple[int, int]:
    """Contiguous row range [start, end) for a shard (balanced split)."""
    base = n // num_shards
    rem = n % num_shards
    start = shard * base + min(shard, rem)
    end = start + base + (1 if shard < rem else 0)
    return start, end


def read_ply_sharded(path: str, shard: int, num_shards: int) -> SplatCloud:
    """Read only this host's slice of a binary PLY's vertex element.

    Seeks directly to the shard's byte range — each of H hosts reads 1/H of
    the file.  Extra (non-vertex) elements are only attached on shard 0.
    """
    with open(path, "rb") as f:
        specs, fmt, _ = ply_io.read_header(f)
        if fmt != "binary_little_endian":
            raise ValueError("sharded read requires binary_little_endian PLY")
        header_end = f.tell()

        offset = header_end
        for name, count, props in specs:
            if any(kind[0] == "list" for _, kind in props):
                raise ValueError("sharded read does not support list properties")
            dt = np.dtype(
                [(p, "<" + ply_io._PLY_TO_NP[k[1]]) for p, k in props]
            )
            if name == "vertex":
                start, end = shard_bounds(count, shard, num_shards)
                f.seek(offset + start * dt.itemsize)
                raw = f.read((end - start) * dt.itemsize)
                vertices = np.frombuffer(raw, dtype=dt)
                return cloud_from_vertex_array(np.ascontiguousarray(vertices))
            offset += dt.itemsize * count
    raise ValueError("PLY file does not contain 'vertex' element")


def gather_and_write(cloud: SplatCloud, path: str, writer, process_index: int = 0,
                     **kwargs) -> None:
    """Host-0 write of a (host-local shard of a) cloud.

    For formats without a parallel container, hosts send their shards to
    host 0 via jax process-level all_gather and host 0 writes the file.
    Single-process: writes directly.
    """
    import jax

    if jax.process_count() == 1:
        writer(cloud, path, **kwargs)
        return
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        dict(
            pos=cloud.pos, sh_dc=cloud.sh_dc, sh_rest=cloud.sh_rest,
            opacity=cloud.opacity, log_scale=cloud.log_scale, quat=cloud.quat,
            normal=cloud.normal,
        )
    )
    if process_index == 0:
        import jax.numpy as jnp

        merged = cloud.replace(
            **{k: jnp.asarray(v).reshape((-1,) + v.shape[2:]) for k, v in gathered.items()}
        )
        writer(merged, path, **kwargs)
