"""Quantize / dequantize bit-ops shared by the format codecs.

Every scheme the reference implements in per-codec numpy is centralized here
as pure functions over u32/u8 arrays:

  - logit <-> linear-u8 opacity            (splat.py:67-69, ksplat.py:24-27)
  - quaternion u8 (val*128+128)            (splat.py:52-63, 124-129)
  - 24-bit fixed-point positions           (spz.py:112-117, 190-197)
  - smallest-three u32 rotation, SPZ flavor (spz.py:267-343)
  - smallest-three u32 rotation, compressed-PLY flavor (compressed_ply.py:321-378)
  - smallest-three u8x3+idx, SOG flavor    (sog.py:315-388, 105-142)
  - 11-10-11 packed u32                    (compressed_ply.py:299-308, 342-349)
  - 8-8-8-8 packed u32                     (compressed_ply.py:310-319, 351-358)
  - SPZ bit-snapped SH u8                  (spz.py:162-170)
  - codebook nearest lookup                (sog.py:408-419)

Residency-generic: each function computes with numpy when handed host
numpy arrays and with jax.numpy when handed device arrays or tracers
(the two APIs are call-compatible for everything used here, and jnp's
dtype objects ARE numpy dtypes).  This is the mechanism behind the
pipeline's transfer policy (utils/transfer.py): codec cores fuse into jit
programs on device-resident data, and run at host memory bandwidth on
host-resident data without a device round trip.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

SQRT1_2 = 0.7071067811865476
SQRT2 = 1.4142135623730951


def _xp(*arrays):
    """numpy for host inputs, jax.numpy for device arrays / tracers."""
    for a in arrays:
        if isinstance(a, (np.ndarray, np.generic)):
            return np
    return jnp


# ------------------------------------------------------------------ opacity


def sigmoid(x):
    if isinstance(x, (np.ndarray, np.generic)):
        with np.errstate(over="ignore"):
            return 1.0 / (1.0 + np.exp(-x))
    return jax.nn.sigmoid(x)


def logit_to_u8(opacity_logit, clip: float = 20.0):
    """alpha_u8 = sigmoid(logit)*255 (reference spz.py:122)."""
    xp = _xp(opacity_logit)
    a = sigmoid(xp.clip(opacity_logit, -clip, clip))
    return xp.clip(a * 255.0, 0, 255).astype(jnp.uint8)


def u8_to_logit(u8, eps: float = 1e-7):
    """Inverse sigmoid of u8/255 (reference spz.py:345-348, ksplat.py:24-27)."""
    xp = _xp(u8)
    v = xp.clip(u8.astype(jnp.float32) / 255.0, eps, 1.0 - eps)
    return xp.log(v / (1.0 - v))


def u8_to_logit_splat(u8):
    """.splat flavor: clip to [1/255, 0.9999] (reference splat.py:67-69)."""
    xp = _xp(u8)
    v = xp.clip(u8.astype(jnp.float32) / 255.0, 1.0 / 255.0, 0.9999)
    return -xp.log(1.0 / v - 1.0)


# --------------------------------------------------------------- quaternion


def normalize_quat(q, eps: float = 1e-12):
    xp = _xp(q)
    return q / xp.maximum(xp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_u8(q):
    """u8 = clip(val*128+128) per component (reference splat.py:124-129)."""
    xp = _xp(q)
    return xp.clip(q * 128.0 + 128.0, 0, 255).astype(jnp.uint8)


def u8_to_quat(u8):
    """Inverse with renormalization (reference splat.py:52-63)."""
    q = (u8.astype(jnp.float32) - 128.0) / 128.0
    return normalize_quat(q, eps=1e-6)


# ------------------------------------------------- 24-bit fixed point (SPZ)


def pos_to_fixed24(pos, frac_bits: int):
    """[N,3] f32 -> [N,3,3] u8 little-endian 24-bit signed fixed point
    (reference spz.py:112-116)."""
    xp = _xp(pos)
    scale = float(1 << frac_bits)
    q = xp.round(pos * scale).astype(jnp.int32)
    b0 = (q & 0xFF).astype(jnp.uint8)
    b1 = ((q >> 8) & 0xFF).astype(jnp.uint8)
    b2 = ((q >> 16) & 0xFF).astype(jnp.uint8)
    return xp.stack([b0, b1, b2], axis=-1)


def fixed24_to_pos(b, frac_bits: int):
    """[N,3,3] u8 -> [N,3] f32 with sign extension (reference spz.py:190-197)."""
    xp = _xp(b)
    b0 = b[..., 0].astype(jnp.int32)
    b1 = b[..., 1].astype(jnp.int32)
    b2 = b[..., 2].astype(jnp.int32)
    i32 = b0 | (b1 << 8) | (b2 << 16)
    i32 = xp.where((i32 & 0x800000) != 0, i32 | (~0xFFFFFF), i32)
    return i32.astype(jnp.float32) / float(1 << frac_bits)


# -------------------------------------- smallest-three rotation, SPZ flavor
# Layout (spz.py:268-272): bits 30-31 = index of largest |component| in XYZW
# order; bits 20-29 / 10-19 / 0-9 = the remaining three components in
# ascending-index order, each as sign bit (bit 9) + 9-bit magnitude scaled by
# 511/sqrt(1/2); components negated when the largest is negative.


def pack_rot_spz(quat_wxyz):
    xp = _xp(quat_wxyz)
    q = normalize_quat(quat_wxyz + 0.0)
    # SPZ component order is XYZW (spz.py:302).
    R = xp.stack([q[:, 1], q[:, 2], q[:, 3], q[:, 0]], axis=1)  # [N,4]
    max_idx = xp.argmax(xp.abs(R), axis=1)  # [N]
    max_val = xp.take_along_axis(R, max_idx[:, None], axis=1)[:, 0]
    should_neg = max_val < 0
    scale = 511.0 / SQRT1_2

    packed = max_idx.astype(jnp.uint32) << 30
    # slot index for component j: number of non-max components before j.
    comp_idx = xp.arange(4)[None, :]  # [1,4]
    is_max = comp_idx == max_idx[:, None]
    slot = xp.cumsum(xp.where(is_max, 0, 1), axis=1) - xp.where(is_max, 0, 1)
    # negbit: component sign differs from... (reference spz.py:335: flips when
    # (val<0) != should_neg, i.e. stores value negated if largest is negative)
    val = R  # [N,4]
    negbit = ((val < 0) != should_neg[:, None]).astype(jnp.uint32)
    mag = xp.clip(xp.abs(val) * scale + 0.5, 0, 511).astype(jnp.uint32)
    component = (negbit << 9) | mag
    shift = ((2 - slot) * 10).astype(jnp.uint32)
    contrib = xp.where(is_max, 0, component << shift).astype(jnp.uint32)
    return (packed | contrib[:, 0] | contrib[:, 1] | contrib[:, 2]
            | contrib[:, 3]).astype(jnp.uint32)


def unpack_rot_spz(packed):
    """u32 [N] -> quat wxyz [N,4] (reference spz.py:267-296)."""
    xp = _xp(packed)
    packed = packed.astype(jnp.uint32)
    idx = (packed >> 30) & 0x3
    raw = xp.stack(
        [(packed >> 20) & 0x3FF, (packed >> 10) & 0x3FF, packed & 0x3FF], axis=1
    )
    mag = (raw & 0x1FF).astype(jnp.float32) / 511.0 * SQRT1_2
    neg = ((raw >> 9) & 0x1).astype(jnp.float32)
    v = mag * (1.0 - 2.0 * neg)  # [N,3] slots in ascending-index order
    missing = xp.sqrt(xp.maximum(0.0, 1.0 - xp.sum(v * v, axis=1)))
    # Scatter slots back into XYZW positions around the max index.
    comp_idx = xp.arange(4)[None, :]
    is_max = comp_idx == idx[:, None].astype(jnp.int32)
    slot = xp.cumsum(xp.where(is_max, 0, 1), axis=1) - xp.where(is_max, 0, 1)
    gathered = xp.take_along_axis(v, xp.clip(slot, 0, 2), axis=1)
    xyzw = xp.where(is_max, missing[:, None], gathered)
    return xp.stack([xyzw[:, 3], xyzw[:, 0], xyzw[:, 1], xyzw[:, 2]], axis=1)


# ---------------------- smallest-three rotation, compressed-PLY flavor
# Layout (compressed_ply.py:321-340): bits 30-31 = index of largest in WXYZ
# order; remaining components in ascending order packed 10-bit unorm of
# (v*sqrt(1/2)+0.5); all components sign-flipped so largest is positive.


def pack_rot_cply(quat_wxyz):
    xp = _xp(quat_wxyz)
    q = normalize_quat(quat_wxyz + 0.0)
    largest = xp.argmax(xp.abs(q), axis=1)
    sign = xp.sign(xp.take_along_axis(q, largest[:, None], axis=1))
    q = q * sign
    t = 1023.0

    def pack_unorm(v):
        return xp.clip(xp.floor((v * SQRT1_2 + 0.5) * t + 0.5), 0, t).astype(
            jnp.uint32
        )

    res = largest.astype(jnp.uint32)
    # Reference folds components in index order: res = (res << 10) | comp for
    # each non-largest i in 0..3 (compressed_ply.py:336-340).
    for i in range(4):
        comp = pack_unorm(q[:, i])
        res = xp.where(largest != i, (res << 10) | comp, res).astype(jnp.uint32)
    return res


def unpack_rot_cply(packed):
    xp = _xp(packed)
    packed = packed.astype(jnp.uint32)
    largest = packed >> 30
    v = xp.stack(
        [(packed >> 20) & 0x3FF, (packed >> 10) & 0x3FF, packed & 0x3FF], axis=1
    )
    dv = (v.astype(jnp.float32) / 1023.0 - 0.5) / SQRT1_2
    missing = xp.sqrt(xp.clip(1.0 - xp.sum(dv * dv, axis=1), 0.0, 1.0))
    comp_idx = xp.arange(4)[None, :]
    is_max = comp_idx == largest[:, None].astype(jnp.int32)
    slot = xp.cumsum(xp.where(is_max, 0, 1), axis=1) - xp.where(is_max, 0, 1)
    gathered = xp.take_along_axis(dv, xp.clip(slot, 0, 2), axis=1)
    return xp.where(is_max, missing[:, None], gathered)


# ------------------------------- smallest-three rotation, SOG flavor (u8x3)
# Layout (sog.py:315-388): normalize, flip so largest (by |.|, WXYZ order) is
# positive, multiply by sqrt(2), store the three non-largest components as
# u8 = (v*0.5+0.5)*255, alpha channel = 252 + largest_idx.


def pack_rot_sog(quat_wxyz):
    xp = _xp(quat_wxyz)
    q = quat_wxyz
    # argmax on the RAW quat: normalization is a positive per-row scale, so
    # the component ordering is unchanged — and skipping the divide before
    # the argmax removes two full [N,4] passes (this is the hottest host
    # stage of a 3M-splat SOG write).  Flip + normalize + sqrt(2) fuse into
    # one [N,1] scale and a single [N,4] multiply.
    max_idx = xp.argmax(xp.abs(q), axis=1)
    max_val = xp.take_along_axis(q, max_idx[:, None], axis=1)
    nrm = xp.maximum(xp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    q = q * (xp.where(max_val >= 0, SQRT2, -SQRT2) / nrm)
    # The 3 non-max components in ascending index order: slot s holds
    # component s, shifted past the max index — pure arithmetic instead of
    # a per-row argsort (the argsort was ~2/3 of the host pack cost at 3M).
    slots = xp.arange(3)[None, :]
    comp = slots + (slots >= max_idx[:, None])
    rest = xp.take_along_axis(q, comp, axis=1)  # [N,3]
    u8 = xp.clip((rest * 0.5 + 0.5) * 255.0, 0, 255).astype(jnp.uint8)
    return u8, (252 + max_idx).astype(jnp.uint8)


def unpack_rot_sog(u8, alpha):
    xp = _xp(u8)
    max_idx = xp.clip(alpha.astype(jnp.int32) - 252, 0, 3)
    rest = (u8.astype(jnp.float32) / 255.0 - 0.5) * 2.0  # [N,3]
    missing = xp.sqrt(xp.maximum(1.0 - xp.sum(rest * rest, axis=1), 0.0))
    comp_idx = xp.arange(4)[None, :]
    is_max = comp_idx == max_idx[:, None]
    slot = xp.cumsum(xp.where(is_max, 0, 1), axis=1) - xp.where(is_max, 0, 1)
    gathered = xp.take_along_axis(rest, xp.clip(slot, 0, 2), axis=1)
    return xp.where(is_max, missing[:, None], gathered)


# --------------------------------------------------- 11-10-11 / 8888 packing


def pack_11_10_11(xyz, mins, maxs):
    """[N,3] f32 + [3] bounds -> [N] u32 (reference compressed_ply.py:299-308).

    Degenerate ranges (< 1e-5) pack as 0, matching the reference.
    """
    xp = _xp(xyz)
    bits = xp.asarray([11, 10, 11])
    t = ((1 << bits) - 1).astype(jnp.float32)
    rng = maxs - mins
    norm = xp.where(rng[None, :] < 1e-5, 0.0, (xyz - mins[None, :]) / xp.where(rng == 0, 1.0, rng)[None, :])
    q = xp.clip(xp.floor(norm * t[None, :] + 0.5), 0, t[None, :]).astype(jnp.uint32)
    return (q[:, 0] << 21) | (q[:, 1] << 11) | q[:, 2]


def unpack_11_10_11(packed, mins, maxs):
    xp = _xp(packed)
    packed = packed.astype(jnp.uint32)
    q = xp.stack(
        [(packed >> 21) & 0x7FF, (packed >> 11) & 0x3FF, packed & 0x7FF], axis=1
    ).astype(jnp.float32)
    t = xp.asarray([2047.0, 1023.0, 2047.0], dtype=jnp.float32)
    return q / t[None, :] * (maxs - mins)[None, :] + mins[None, :]


def pack_8888(rgb, alpha, mins, maxs):
    """rgb [N,3] normalized to chunk bounds, alpha [N] absolute
    (reference compressed_ply.py:310-319)."""
    xp = _xp(rgb)
    rng = maxs - mins
    norm = xp.where(rng[None, :] < 1e-5, 0.0, (rgb - mins[None, :]) / xp.where(rng == 0, 1.0, rng)[None, :])
    q = xp.clip(xp.floor(norm * 255.0 + 0.5), 0, 255).astype(jnp.uint32)
    qa = xp.clip(xp.floor(alpha * 255.0 + 0.5), 0, 255).astype(jnp.uint32)
    return (q[:, 0] << 24) | (q[:, 1] << 16) | (q[:, 2] << 8) | qa


def unpack_8888(packed, mins, maxs):
    xp = _xp(packed)
    packed = packed.astype(jnp.uint32)
    q = xp.stack(
        [(packed >> 24) & 0xFF, (packed >> 16) & 0xFF, (packed >> 8) & 0xFF],
        axis=1,
    ).astype(jnp.float32)
    rgb = q / 255.0 * (maxs - mins)[None, :] + mins[None, :]
    alpha = (packed & 0xFF).astype(jnp.float32) / 255.0
    return rgb, alpha


# -------------------------------------------------------- SPZ SH bit-snap


def quant_sh_spz(vals, bits: int):
    """u8 with (8-bits)-step snapping (reference spz.py:162-165)."""
    xp = _xp(vals)
    bs = 1 << (8 - bits)
    q = xp.round(vals * 128.0 + 128.0).astype(jnp.int32)
    return xp.clip((q + bs // 2) // bs * bs, 0, 255).astype(jnp.uint8)


def dequant_sh_spz(u8):
    return (u8.astype(jnp.float32) - 128.0) / 128.0


# ------------------------------------------------------------ codebook ops


def nearest_codebook_index(vals, codebook):
    """Nearest entry in a SORTED 1-D codebook (reference sog.py:408-419).

    One searchsorted against the cell midpoints: val maps to entry i iff
    mid[i-1] <= val < mid[i], which IS the nearest entry of a sorted
    codebook — same result as the old binary-search-plus-refine at a
    third of the memory passes.  Returns int32 indices."""
    xp = _xp(vals, codebook)
    mid = (codebook[1:] + codebook[:-1]) * 0.5
    # side="right": a value exactly on a midpoint snaps to the RIGHT
    # entry, matching the old refine step's strict-< comparison
    if isinstance(vals, np.ndarray) and vals.size > 2_000_000:
        # np.searchsorted releases the GIL and this lookup is ~0.7 s at a
        # 3M-splat SOG write's 9M values — split it across threads (same
        # per-element op, so results are bit-identical to the single call)
        from concurrent.futures import ThreadPoolExecutor

        flat = vals.reshape(-1)
        out = np.empty(flat.shape[0], np.int32)
        nw = min(4, os.cpu_count() or 1)
        step = -(-flat.shape[0] // nw)

        def work(s):
            e = min(s + step, flat.shape[0])
            out[s:e] = np.searchsorted(mid, flat[s:e], side="right")

        with ThreadPoolExecutor(nw) as ex:
            list(ex.map(work, range(0, flat.shape[0], step)))
        return out.reshape(vals.shape)
    return xp.searchsorted(mid, vals, side="right").astype(jnp.int32)


# ------------------------------------------------------------- morton code


def morton3_u32(ix, iy, iz):
    """Interleave 10-bit coords into a 30-bit Morton code
    (reference compressed_ply.py:255-263), vectorized.

    uint32 in, uint32 out in both numpy and jnp residencies.  NOTE: shift
    amounts are python ints and masks numpy scalars — ``jnp.uint32(x)``
    scalars would silently promote the numpy path onto the device.
    """
    u = np.uint32

    def part(n):
        n = n.astype(u) & u(0x000003FF)
        n = (n ^ (n << 16)) & u(0xFF0000FF)
        n = (n ^ (n << 8)) & u(0x0300F00F)
        n = (n ^ (n << 4)) & u(0x030C30C3)
        n = (n ^ (n << 2)) & u(0x09249249)
        return n

    return ((part(iz) << 2) | (part(iy) << 1) | part(ix)).astype(u)