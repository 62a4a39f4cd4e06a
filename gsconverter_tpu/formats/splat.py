"""antimatter15 .splat codec.

32-byte records: pos f32x3, linear scale f32x3, RGBA u8x4, quat u8x4 packed
as val*128+128 (reference formats/splat.py).  Writer sorts splats descending
by exp(sum(log_scale)) * sigmoid(opacity) (reference splat.py:92-98).

TPU-first: the whole encode (sort metric, sort, quantize, interleave-ready
planes) is one jit region; only the byte interleave + file write run on host.
"""

from __future__ import annotations

import os
from functools import partial

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


@jax.jit
def _decode(pos, scales, color, rot_u8):
    log_scale = jnp.log(jnp.maximum(scales, 1e-6))
    quat = quant.u8_to_quat(rot_u8)
    sh_dc = sh.dc_from_rgb_u8(color[:, :3])
    opacity = quant.u8_to_logit_splat(color[:, 3])
    return log_scale, quat, sh_dc, opacity


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
        log_scale, quat, sh_dc, opacity = _decode(
            jnp.asarray(raw["pos"].copy()),
            jnp.asarray(raw["scale"].copy()),
            jnp.asarray(raw["color"].copy()),
            jnp.asarray(raw["rot"].copy()),
        )
        n = len(raw)
        return SplatCloud(
            pos=jnp.asarray(raw["pos"].copy()),
            sh_dc=sh_dc,
            sh_rest=jnp.zeros((n, 3, 15), jnp.float32),
            opacity=opacity,
            log_scale=log_scale,
            quat=quat,
            normal=jnp.zeros((n, 3), jnp.float32),
            rgb=jnp.asarray(raw["color"][:, :3].copy()),
            active_sh_degree=0,
        )

    def write(self, cloud: SplatCloud, path: str, **kwargs) -> None:
        pos, scales, color, rot = _encode(
            cloud.pos, cloud.log_scale, cloud.quat, cloud.opacity, cloud.sh_dc
        )
        n = cloud.n
        out = np.zeros(n, dtype=_RECORD)
        out["pos"] = np.asarray(pos)
        out["scale"] = np.asarray(scales)
        out["color"] = np.asarray(color)
        out["rot"] = np.asarray(rot)
        with open(path, "wb") as f:
            f.write(out.tobytes())
        debug_print(f".splat write completed. {n} splats sorted and packed.")
