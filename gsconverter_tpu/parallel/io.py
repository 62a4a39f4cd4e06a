"""Multi-host sharded file IO.

Reference analogue: none — single-file read/write (SURVEY.md §2.4 row
"Multi-host IO").  Binary PLY vertex elements are fixed-size records, so
each host seeks to its slice and reads only its shard; writes assemble on
host 0 (or stripe per-host with ``save``/``load`` in utils.checkpoint).
"""

from __future__ import annotations

import os

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


def _ply_header_bytes(dtype: np.dtype, total_n: int,
                      comments: tuple[str, ...] = ()) -> bytes:
    """Deterministic binary-little-endian PLY header for a vertex dtype.

    Every host must produce IDENTICAL bytes from (dtype, total_n) — the
    strided write relies on all hosts agreeing on the header length.
    Matches utils.ply._write_to's header layout exactly."""
    lines = ["ply", "format binary_little_endian 1.0"]
    lines += [f"comment {c}" for c in comments]
    lines.append(f"element vertex {total_n}")
    for name in dtype.names:
        lines.append(f"property {ply_io._np_type_name(dtype[name])} {name}")
    lines.append("end_header")
    return ("\n".join(lines) + "\n").encode("ascii")


def write_ply_strided(cloud: SplatCloud, path: str, shard: int,
                      num_shards: int, total_n: int,
                      prefix_nonspatial: bool = False) -> None:
    """Each host seek-writes ONLY its shard's record range (VERDICT r4
    item 6: ``gather_and_write`` all-gathered the full cloud to every host
    — O(N*hosts) traffic and O(N) memory per host at 100M-splat scale).

    Binary PLY vertex elements are fixed-size records, so shard offsets
    are exact: shard k owns rows ``shard_bounds(total_n, k, num_shards)``
    and writes them at ``header_len + start * itemsize``.  Shard 0 also
    writes the header.  The shard's row count must match its bounds.
    SH crop is disabled (record layout must be identical across hosts —
    ``crop_sh`` sizes the record from shard-local data).
    """
    from ..formats.ply_gs import vertex_array_from_cloud

    arr = vertex_array_from_cloud(cloud, crop_sh=False,
                                  prefix_nonspatial=prefix_nonspatial)
    start, end = shard_bounds(total_n, shard, num_shards)
    if end - start != len(arr):
        raise ValueError(
            f"shard {shard}/{num_shards} holds {len(arr)} rows, bounds say "
            f"{end - start}")
    header = _ply_header_bytes(arr.dtype, total_n)
    # open without truncating if the file exists (other shards' ranges may
    # already be on disk); each writer touches only its own byte range
    mode = "r+b" if os.path.exists(path) else "w+b"
    with open(path, mode) as f:
        if shard == 0:
            f.write(header)
        f.seek(len(header) + start * arr.dtype.itemsize)
        f.write(arr.tobytes())


def gather_and_write(cloud: SplatCloud, path: str, writer, process_index: int = 0,
                     **kwargs) -> None:
    """Multi-host write of a (host-local shard of a) cloud.

    PLY writers take the strided path — every host seek-writes its own
    record range, nothing is gathered.  Formats whose containers are not
    fixed-record (splat/ksplat/spz/sog/...) fall back to a host-0 gather
    via jax process-level all_gather.  Single-process: writes directly.
    """
    import jax

    if jax.process_count() == 1:
        writer(cloud, path, **kwargs)
        return
    from jax.experimental import multihost_utils

    n_local = np.asarray(jax.device_get(cloud.pos)).shape[0]
    if str(path).endswith(".ply") and not kwargs:
        # strided path: only the per-shard row counts cross the network
        counts = np.asarray(multihost_utils.process_allgather(
            jax.numpy.asarray([n_local])
        )).reshape(-1)
        total_n = int(counts.sum())
        # shard bounds must match each host's local count — true for
        # clouds read via read_ply_sharded; otherwise fall through
        ok = all(
            shard_bounds(total_n, k, jax.process_count())[1]
            - shard_bounds(total_n, k, jax.process_count())[0] == int(c)
            for k, c in enumerate(counts)
        )
        if ok:
            write_ply_strided(cloud, path, process_index,
                              jax.process_count(), total_n)
            multihost_utils.sync_global_devices("gsconverter_strided_write")
            return

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
