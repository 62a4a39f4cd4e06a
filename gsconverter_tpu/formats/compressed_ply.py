"""PlayCanvas / splat-transform "compressed PLY" codec.

Container (reference formats/compressed_ply.py): PLY with three elements —
``chunk`` (per-256-splat min/max bounds, 18 f32), ``vertex`` (4 packed u32
per splat: position 11-10-11, rotation 2+10-10-10 smallest-three, scale
11-10-11, color 8888) and optional ``sh`` (u8 per AC coeff in [-4,4]).

TPU-first design deltas:
  - the whole quantize path (chunk bounds via segment min/max, packing,
    unpacking) is jit-able jnp over padded [C,256] chunk tensors;
  - the reference's recursive Morton sort (compressed_ply.py:252-297) is
    replaced by a single two-level Morton lexsort (20 bits/axis) — same
    spatial-locality contract, no data-dependent recursion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import SH_C0, SplatCloud, covering_degree_for_dim
from ..ops import quant
from ..utils import ply
from ..utils.log import debug_print, status_print
from .base import BaseFormat, register
from .ply_gs import Ply3DGSFormat

CHUNK = 256

_CHUNK_FIELDS = [
    "min_x", "min_y", "min_z", "max_x", "max_y", "max_z",
    "min_scale_x", "min_scale_y", "min_scale_z",
    "max_scale_x", "max_scale_y", "max_scale_z",
    "min_r", "min_g", "min_b", "max_r", "max_g", "max_b",
]


def _xp(a):
    return np if isinstance(a, (np.ndarray, np.generic)) else jnp


def morton_order(pos: jax.Array) -> jax.Array:
    """Two-level Morton sort: 10-bit global + 10-bit intra-cell refinement.

    Residency-generic (numpy in -> numpy order out)."""
    xp = _xp(pos)
    mins = xp.min(pos, axis=0)
    maxs = xp.max(pos, axis=0)
    rng = xp.where(maxs - mins > 0, maxs - mins, 1.0)
    t = (pos - mins) / rng  # [0,1]
    hi = xp.clip(t * 1024.0, 0, 1023).astype(jnp.uint32)
    lo = xp.clip((t * 1024.0 - hi) * 1024.0, 0, 1023).astype(jnp.uint32)
    key_hi = quant.morton3_u32(hi[:, 0], hi[:, 1], hi[:, 2])
    key_lo = quant.morton3_u32(lo[:, 0], lo[:, 1], lo[:, 2])
    return xp.lexsort((key_lo, key_hi))


def _pad_to_chunks(a: jax.Array) -> jax.Array:
    """Pad axis 0 to a multiple of CHUNK by edge replication (keeps min/max)."""
    xp = _xp(a)
    n = a.shape[0]
    pad = (-n) % CHUNK
    if pad:
        a = xp.concatenate([a, xp.repeat(a[-1:], pad, axis=0)], axis=0)
    return a.reshape((-1, CHUNK) + a.shape[1:])


def _pack_chunked(cv, mins, maxs, xp):
    """Per-chunk-normalized 11-10-11 pack over [C, CHUNK, 3] values.

    Normalizing here then packing against unit bounds is bit-identical to
    packing against the per-chunk bounds directly (the pack's own
    normalization divides by 1.0 exactly)."""
    rng = maxs - mins  # [C,3]
    norm = xp.where(
        rng[:, None, :] < 1e-5, 0.0,
        (cv - mins[:, None, :]) / xp.where(rng == 0, 1.0, rng)[:, None, :],
    )
    zero3 = xp.zeros(3, jnp.float32)
    one3 = xp.ones(3, jnp.float32)
    return quant.pack_11_10_11(norm.reshape(-1, 3), zero3, one3)


def _encode(pos, log_scale, quat, opacity, sh_dc):
    """Residency-generic encode (host numpy or traced jnp; see ops/quant.py)."""
    xp = _xp(pos)
    order = morton_order(pos)
    pos = pos[order]
    scl = xp.clip(log_scale[order], -20, 20)
    rgb = sh_dc[order] * SH_C0 + 0.5
    alpha = quant.sigmoid(opacity[order])

    cpos, cscl, crgb = _pad_to_chunks(pos), _pad_to_chunks(scl), _pad_to_chunks(rgb)
    mins_p, maxs_p = xp.min(cpos, axis=1), xp.max(cpos, axis=1)  # [C,3]
    mins_s, maxs_s = xp.min(cscl, axis=1), xp.max(cscl, axis=1)
    mins_c, maxs_c = xp.min(crgb, axis=1), xp.max(crgb, axis=1)

    p_pos = _pack_chunked(cpos, mins_p, maxs_p, xp)
    p_scl = _pack_chunked(cscl, mins_s, maxs_s, xp)
    rng_c = maxs_c - mins_c
    norm_c = xp.where(
        rng_c[:, None, :] < 1e-5, 0.0,
        (crgb - mins_c[:, None, :]) / xp.where(rng_c == 0, 1.0, rng_c)[:, None, :],
    )
    p_col = quant.pack_8888(
        norm_c.reshape(-1, 3), _pad_to_chunks(alpha).reshape(-1),
        xp.zeros(3, jnp.float32), xp.ones(3, jnp.float32),
    )
    p_rot = quant.pack_rot_cply(quat[order])
    n = pos.shape[0]
    chunk_bounds = xp.concatenate(
        [mins_p, maxs_p, mins_s, maxs_s, mins_c, maxs_c], axis=1
    )  # [C,18]
    return order, chunk_bounds, p_pos[:n], p_rot, p_scl[:n], p_col[:n]


_encode_jit = jax.jit(_encode)


def _decode(p_pos, p_rot, p_scl, p_col, chunk_bounds):
    """Residency-generic decode."""
    xp = _xp(p_pos)
    mins_p, maxs_p = chunk_bounds[:, 0:3], chunk_bounds[:, 3:6]
    mins_s, maxs_s = chunk_bounds[:, 6:9], chunk_bounds[:, 9:12]
    mins_c, maxs_c = chunk_bounds[:, 12:15], chunk_bounds[:, 15:18]
    n = p_pos.shape[0]
    cidx = xp.arange(n) // CHUNK
    zero3 = xp.zeros(3, jnp.float32)
    one3 = xp.ones(3, jnp.float32)
    pos = quant.unpack_11_10_11(p_pos, zero3, one3)
    # re-apply per-chunk bounds (unpack used unit bounds; rescale per row)
    pos = pos * (maxs_p - mins_p)[cidx] + mins_p[cidx]
    scl = quant.unpack_11_10_11(p_scl, zero3, one3)
    scl = scl * (maxs_s - mins_s)[cidx] + mins_s[cidx]
    rgb01, alpha = quant.unpack_8888(p_col, zero3, one3)
    rgb01 = rgb01 * (maxs_c - mins_c)[cidx] + mins_c[cidx]
    quat = quant.unpack_rot_cply(p_rot)
    sh_dc = (rgb01 - 0.5) / SH_C0
    a = xp.clip(alpha, 1e-6, 1.0 - 1e-6)
    opacity = xp.log(a / (1.0 - a))
    return pos, scl, quat, sh_dc, opacity


@register
class CompressedPlyFormat(BaseFormat):
    name = "compressed_ply"
    extension = ".ply"
    max_sh_degree = 3

    def read(self, path: str, **kwargs) -> SplatCloud:
        plyf = ply.read(path)
        if "chunk" not in plyf:
            debug_print("[WARNING] No 'chunk' element; falling back to standard PLY read.")
            return Ply3DGSFormat().read(path, **kwargs)
        chunks = plyf["chunk"].data
        verts = plyf["vertex"].data
        n = len(verts)
        chunk_bounds = np.stack([chunks[f] for f in _CHUNK_FIELDS], axis=1).astype(np.float32)

        # host decode via the residency-generic cores (utils/transfer.py)
        pos, scl, quat, sh_dc, opacity = _decode(
            np.ascontiguousarray(verts["packed_position"]),
            np.ascontiguousarray(verts["packed_rotation"]),
            np.ascontiguousarray(verts["packed_scale"]),
            np.ascontiguousarray(verts["packed_color"]),
            chunk_bounds,
        )

        sh_rest = np.zeros((n, 3, 15), np.float32)
        sh_deg = 0
        if "sh" in plyf:
            sh_el = plyf["sh"].data
            names = [f for f in sh_el.dtype.names]
            flat = np.stack([sh_el[f] for f in names], axis=1).astype(np.float32)
            flat = (flat / 256.0 - 0.5) * 8.0
            sh_rest = SplatCloud.sh_rest_from_flat(flat)
            # covering degree (rounds UP): non-standard column counts fill
            # len(names)//3 per-channel coeffs; a floor degree would let
            # degree-sized writers drop the band overhang (see cloud.py)
            sh_deg = covering_degree_for_dim(len(names) // 3)
        self.metadata = dict(count=n, sh_degree=sh_deg, chunks=len(chunks))

        return SplatCloud(
            pos=pos, sh_dc=sh_dc, sh_rest=sh_rest, opacity=opacity,
            log_scale=scl, quat=quat,
            normal=np.zeros((n, 3), np.float32),
            active_sh_degree=sh_deg,
        )

    def write(self, cloud: SplatCloud, path: str, **kwargs) -> None:
        from ..ops.sh import effective_sh_degree
        from ..cloud import COEFFS_FOR_DEGREE

        n = cloud.n
        enc = _encode if cloud.is_host else _encode_jit
        order, chunk_bounds, p_pos, p_rot, p_scl, p_col = enc(
            cloud.pos, cloud.log_scale, cloud.quat, cloud.opacity, cloud.sh_dc
        )
        chunk_np = np.asarray(chunk_bounds)
        c = len(chunk_np)
        chunk_arr = np.zeros(c, dtype=[(f, "<f4") for f in _CHUNK_FIELDS])
        for i, f in enumerate(_CHUNK_FIELDS):
            chunk_arr[f] = chunk_np[:, i]

        vert_arr = np.zeros(
            n,
            dtype=[("packed_position", "<u4"), ("packed_rotation", "<u4"),
                   ("packed_scale", "<u4"), ("packed_color", "<u4")],
        )
        vert_arr["packed_position"] = np.asarray(p_pos)
        vert_arr["packed_rotation"] = np.asarray(p_rot)
        vert_arr["packed_scale"] = np.asarray(p_scl)
        vert_arr["packed_color"] = np.asarray(p_col)

        elements = [ply.PlyElement("chunk", chunk_arr), ply.PlyElement("vertex", vert_arr)]

        deg = effective_sh_degree(cloud, kwargs, 3)
        n_coeffs = COEFFS_FOR_DEGREE[deg]
        if n_coeffs > 0:
            # degree-packed channel-major (stride = per-channel dim), the
            # splat-transform convention; NOTE the reference instead dumps
            # the first n_coeffs of its 45-wide stride-15 array
            # (compressed_ply.py:169), mis-grouping G/B for degree < 3.
            dim = n_coeffs // 3
            flat = cloud.sh_rest[:, :, :dim].reshape(n, n_coeffs)[order]
            xp = np if cloud.is_host else jnp
            q = np.asarray(
                xp.clip((flat / 8.0 + 0.5) * 256.0, 0, 255).astype(jnp.uint8)
            )
            sh_arr = np.zeros(n, dtype=[(f"f_rest_{i}", "u1") for i in range(n_coeffs)])
            for i in range(n_coeffs):
                sh_arr[f"f_rest_{i}"] = q[:, i]
            elements.append(ply.PlyElement("sh", sh_arr))

        ply.write(path, elements)
        status_print(f"Compressed PLY write completed. {n} points in {c} chunks.")
