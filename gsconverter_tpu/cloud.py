"""SplatCloud — the canonical in-memory Gaussian-splat representation.

TPU-first redesign of the reference's canonical numpy structured array
(/root/reference/gsconverter/structures.py:23-59).  Where the reference keeps
an AoS record per splat, we keep a **SoA pytree** of device arrays so that
every filter / codec core is a fused, sharded XLA computation over the splat
axis N.

Numerics contract (identical to the reference, SURVEY.md §1.5):
  - ``pos``       [N,3] f32 world position (x, y, z)
  - ``normal``    [N,3] f32 (always 0 in practice; kept for PLY schema parity)
  - ``sh_dc``     [N,3] f32 SH DC; RGB = 0.5 + C0*dc, C0 = 0.28209479...
  - ``sh_rest``   [N,3,15] f32 SH AC at full degree-3 width, channel-major:
                  ``sh_rest[:, c, j]`` = channel c (RGB), coeff j — matching
                  the planar ``f_rest_{c*15+j}`` grouping (Inria order,
                  reference spz.py:151-154, parquet.py:72-77).  Lower active
                  degrees are represented by zeroing the per-channel tail,
                  mirroring the reference's 45-coeff zero-padding policy.
  - ``opacity``   [N]   f32 logit: alpha = sigmoid(opacity)
  - ``log_scale`` [N,3] f32: linear scale = exp(log_scale)
  - ``quat``      [N,4] f32 quaternion in (w, x, y, z) order
  - ``rgb``       [N,3] u8 optional display RGB (sRGB-gamma'd)
  - ``extras``    dict[str -> [N,...]] pass-through non-standard PLY vertex
                  props (reference structures.py:52-57)

``active_sh_degree`` is static metadata (not traced); ``extra_elements`` is a
host-side sidecar holding non-vertex PLY elements (reference base.py:6).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Zeroth spherical-harmonic basis constant (reference data_processor.py:307).
SH_C0 = 0.28209479177387814

# Per-channel AC coefficient count by degree (reference spz.py:264-265).
DIM_FOR_DEGREE = {0: 0, 1: 3, 2: 8, 3: 15}
# Total f_rest count by degree (reference structures.py:31-36).
COEFFS_FOR_DEGREE = {0: 0, 1: 9, 2: 24, 3: 45}
MAX_SH_DIM = 15  # degree 3 per-channel width


def degree_for_dim(dim: int) -> int:
    """Per-channel coeff count -> SH degree."""
    for deg, d in DIM_FOR_DEGREE.items():
        if d == dim:
            return deg
    raise ValueError(f"invalid per-channel SH dim: {dim}")


def degree_for_coeffs(n_coeffs: int) -> int:
    """Total f_rest column count -> naive SH degree (reference converter.py:125-127)."""
    if n_coeffs >= 45:
        return 3
    if n_coeffs >= 24:
        return 2
    if n_coeffs >= 9:
        return 1
    return 0


def degree_for_last_active(last_idx: int) -> int:
    """Last non-zero f_rest index -> active degree (reference converter.py:143-146)."""
    if last_idx >= 24:
        return 3
    if last_idx >= 9:
        return 2
    if last_idx >= 0:
        return 1
    return 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SplatCloud:
    """Canonical SoA splat pytree.  Device-array leaves; static metadata."""

    pos: jax.Array  # [N,3] f32
    sh_dc: jax.Array  # [N,3] f32
    sh_rest: jax.Array  # [N,3,15] f32
    opacity: jax.Array  # [N] f32 logit
    log_scale: jax.Array  # [N,3] f32
    quat: jax.Array  # [N,4] f32 wxyz
    normal: jax.Array  # [N,3] f32
    rgb: jax.Array | None = None  # [N,3] u8
    extras: dict[str, jax.Array] = dataclasses.field(default_factory=dict)
    # Static (untraced) metadata:
    active_sh_degree: int = dataclasses.field(
        default=3, metadata=dict(static=True)
    )
    extra_elements: tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )

    # ---------------------------------------------------------------- basic
    def __len__(self) -> int:
        return int(self.pos.shape[0])

    @property
    def n(self) -> int:
        return int(self.pos.shape[0])

    @property
    def has_rgb(self) -> bool:
        return self.rgb is not None

    def replace(self, **kw: Any) -> "SplatCloud":
        return dataclasses.replace(self, **kw)

    # ------------------------------------------------------------ factories
    @classmethod
    def zeros(cls, n: int, active_sh_degree: int = 3, rgb: bool = False) -> "SplatCloud":
        f32 = jnp.float32
        return cls(
            pos=jnp.zeros((n, 3), f32),
            sh_dc=jnp.zeros((n, 3), f32),
            sh_rest=jnp.zeros((n, 3, MAX_SH_DIM), f32),
            opacity=jnp.zeros((n,), f32),
            log_scale=jnp.zeros((n, 3), f32),
            quat=jnp.concatenate(
                [jnp.ones((n, 1), f32), jnp.zeros((n, 3), f32)], axis=1
            ),
            normal=jnp.zeros((n, 3), f32),
            rgb=jnp.zeros((n, 3), jnp.uint8) if rgb else None,
            active_sh_degree=active_sh_degree,
        )

    # --------------------------------------------------------- select/mask
    def select(self, idx: jax.Array) -> "SplatCloud":
        """Gather rows by index array (compaction, sorting, sharded gather).

        Residency-preserving: numpy-leaf clouds gather with numpy (host
        fancy indexing, ~memcpy speed), device clouds with jnp.take.
        """
        if isinstance(self.pos, np.ndarray):
            idx = np.asarray(idx)
            take = lambda a: np.take(np.asarray(a), idx, axis=0)
        else:
            take = lambda a: jnp.take(a, idx, axis=0)
        return self.replace(
            pos=take(self.pos),
            sh_dc=take(self.sh_dc),
            sh_rest=take(self.sh_rest),
            opacity=take(self.opacity),
            log_scale=take(self.log_scale),
            quat=take(self.quat),
            normal=take(self.normal),
            rgb=take(self.rgb) if self.rgb is not None else None,
            extras={k: take(v) for k, v in self.extras.items()},
        )

    def compact(self, mask: jax.Array) -> "SplatCloud":
        """Host-side boolean-mask compaction (changes N; not jittable).

        Under jit, filters carry validity masks instead; stage boundaries
        re-materialize via this (SURVEY.md §7.1 item 2).
        """
        idx = np.nonzero(np.asarray(mask))[0]
        return self.select(idx)

    # ----------------------------------------------------- flat SH helpers
    def sh_rest_flat(self) -> jax.Array:
        """[N,45] channel-major flat view: column c*15+j == f_rest_{c*15+j}."""
        return self.sh_rest.reshape(self.pos.shape[0], 3 * MAX_SH_DIM)

    @staticmethod
    def sh_rest_from_flat(flat: jax.Array) -> jax.Array:
        """[N,K] channel-major flat coeffs (K in {0,9,24,45}) -> [N,3,15].

        Re-strides lower-degree planar layouts into the canonical degree-3
        width.  NOTE divergence from the reference: ply_3dgs.py pads a
        9/24-coeff file verbatim into 45 slots, which silently mis-strides
        G/B channels for downstream codecs (spz.py:151-154 assumes stride
        15).  We re-stride correctly; deg-3 files (the overwhelmingly common
        case) behave identically.
        """
        n, k = flat.shape
        if isinstance(flat, np.ndarray):
            out = np.zeros((n, 3, MAX_SH_DIM), flat.dtype)
            if k:
                dim = k // 3
                out[:, :, :dim] = flat.reshape(n, 3, dim)
            return out
        if k == 0:
            return jnp.zeros((n, 3, MAX_SH_DIM), flat.dtype)
        dim = k // 3
        out = jnp.zeros((n, 3, MAX_SH_DIM), flat.dtype)
        return out.at[:, :, :dim].set(flat.reshape(n, 3, dim))

    def active_sh_coeffs(self) -> jax.Array:
        """[N, 3*dim] channel-major flat coeffs at the active degree."""
        dim = DIM_FOR_DEGREE[self.active_sh_degree]
        n = self.pos.shape[0]
        if dim == 0:
            return jnp.zeros((n, 0), self.sh_rest.dtype)
        return self.sh_rest[:, :, :dim].reshape(n, 3 * dim)

    # ------------------------------------------------------------- numpy IO
    @property
    def is_host(self) -> bool:
        """True when leaves are host numpy (the default IO-pipeline residency;
        see utils/transfer.py for why heavy leaves stay on host)."""
        return isinstance(self.pos, np.ndarray)

    def to_numpy(self) -> "SplatCloud":
        """Pull all leaves to host numpy (for codec container writes).

        Device-resident leaves use the chunked-async readback path
        (utils/transfer.to_host); host-resident leaves are free.
        """
        from .utils.transfer import to_host

        conv = lambda a: None if a is None else to_host(a)
        return self.replace(
            pos=conv(self.pos),
            sh_dc=conv(self.sh_dc),
            sh_rest=conv(self.sh_rest),
            opacity=conv(self.opacity),
            log_scale=conv(self.log_scale),
            quat=conv(self.quat),
            normal=conv(self.normal),
            rgb=conv(self.rgb),
            extras={k: conv(v) for k, v in self.extras.items()},
        )

    def device(self) -> "SplatCloud":
        """Upload all leaves to the default device (h2d is the cheap
        direction; used before sharded/multi-chip stages)."""
        conv = lambda a: None if a is None else jnp.asarray(a)
        return self.replace(
            pos=conv(self.pos),
            sh_dc=conv(self.sh_dc),
            sh_rest=conv(self.sh_rest),
            opacity=conv(self.opacity),
            log_scale=conv(self.log_scale),
            quat=conv(self.quat),
            normal=conv(self.normal),
            rgb=conv(self.rgb),
            extras={k: conv(v) for k, v in self.extras.items()},
        )

    def block_until_ready(self) -> "SplatCloud":
        jax.block_until_ready(
            [self.pos, self.sh_dc, self.sh_rest, self.opacity, self.log_scale, self.quat]
        )
        return self
