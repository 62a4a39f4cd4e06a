"""antimatter15 .splat codec.

32-byte records: pos f32x3, linear scale f32x3, RGBA u8x4, quat u8x4 packed
as val*128+128 (reference formats/splat.py).  Writer sorts splats descending
by exp(sum(log_scale)) * sigmoid(opacity) (reference splat.py:92-98).

Residency-aware (utils/transfer.py): host-resident clouds encode/decode in
numpy (the packed record IS the file; a device round trip would pull it
over the slow link); device-resident clouds use the jit encode core with
chunked readback.  The quantization math is shared via ops/quant's
residency-generic helpers.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import SplatCloud
from ..ops import quant, sh
from ..utils.log import debug_print
from .base import BaseFormat, register

_RECORD = np.dtype(
    [("pos", "<f4", (3,)), ("scale", "<f4", (3,)), ("color", "u1", (4,)), ("rot", "u1", (4,))]
)


@jax.jit
def _encode(pos, log_scale, quat, opacity, sh_dc):
    metric = jnp.exp(jnp.sum(log_scale, axis=1)) * jax.nn.sigmoid(opacity)
    order = jnp.argsort(-metric)
    pos = pos[order]
    scales = jnp.exp(log_scale[order])
    q = quant.normalize_quat(quat[order])
    rot_u8 = quant.quat_to_u8(q)
    rgb = sh.rgb_u8_linear_from_dc(sh_dc[order])
    a = jnp.clip(jax.nn.sigmoid(opacity[order]) * 255.0, 0, 255).astype(jnp.uint8)
    color = jnp.concatenate([rgb, a[:, None]], axis=1)
    return pos.astype(jnp.float32), scales.astype(jnp.float32), color, rot_u8


@register
class SplatFormat(BaseFormat):
    name = "splat"
    extension = ".splat"
    max_sh_degree = 0
    needs_rgb = True

    def read(self, path: str, **kwargs) -> SplatCloud:
        size = os.path.getsize(path)
        if size % _RECORD.itemsize != 0:
            debug_print(f"[WARNING] {size} not a multiple of 32; truncating.")
        raw = np.fromfile(path, dtype=_RECORD)
        n = len(raw)
        # host decode via the residency-generic quant ops (utils/transfer.py)
        scales = np.ascontiguousarray(raw["scale"])
        log_scale = np.log(np.maximum(scales, 1e-6))
        quat = quant.u8_to_quat(np.ascontiguousarray(raw["rot"]))
        color = np.ascontiguousarray(raw["color"])
        sh_dc = sh.dc_from_rgb_u8(color[:, :3])
        opacity = quant.u8_to_logit_splat(color[:, 3])
        return SplatCloud(
            pos=np.ascontiguousarray(raw["pos"]),
            sh_dc=sh_dc,
            sh_rest=np.zeros((n, 3, 15), np.float32),
            opacity=opacity,
            log_scale=log_scale,
            quat=quat,
            normal=np.zeros((n, 3), np.float32),
            rgb=np.ascontiguousarray(color[:, :3]),
            active_sh_degree=0,
        )

    def write(self, cloud: SplatCloud, path: str, **kwargs) -> None:
        n = cloud.n
        out = np.zeros(n, dtype=_RECORD)
        if cloud.is_host:
            # host-resident encode: identical math in numpy — the whole
            # record is file bytes, so a device encode would pull the full
            # output back over the slow device->host direction for nothing
            # (utils/transfer.py rationale)
            from ..cloud import SH_C0

            c = cloud
            alpha_lin = quant.sigmoid(c.opacity)
            metric = np.exp(np.sum(c.log_scale, axis=1)) * alpha_lin
            order = np.argsort(-metric)
            q = c.quat[order]
            q = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-12
            )
            out["pos"] = c.pos[order]
            out["scale"] = np.exp(c.log_scale[order])
            rgb = np.clip((0.5 + SH_C0 * c.sh_dc[order]) * 255.0, 0, 255)
            a = np.clip(alpha_lin[order] * 255.0, 0, 255)
            out["color"][:, :3] = rgb.astype(np.uint8)
            out["color"][:, 3] = a.astype(np.uint8)
            out["rot"] = np.clip(q * 128.0 + 128.0, 0, 255).astype(np.uint8)
        else:
            pos, scales, color, rot = _encode(
                cloud.pos, cloud.log_scale, cloud.quat, cloud.opacity, cloud.sh_dc
            )
            from ..utils.transfer import to_host

            out["pos"] = to_host(pos)
            out["scale"] = to_host(scales)
            out["color"] = to_host(color)
            out["rot"] = to_host(rot)
        with open(path, "wb") as f:
            f.write(memoryview(out))  # zero-copy buffer write
        debug_print(f".splat write completed. {n} splats sorted and packed.")
