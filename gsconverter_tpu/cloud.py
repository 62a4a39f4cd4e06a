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


def covering_degree_for_dim(dim: int) -> int:
    """Smallest SH degree whose per-channel width COVERS ``dim`` coefficients.

    Rounds UP where ``degree_for_coeffs`` floors: a non-standard f_rest
    count (e.g. 30 columns -> 10 per-channel coeffs, straddling bands 2/3)
    must map to a degree whose layout holds every populated coefficient,
    or degree-sized writers silently drop the overhang.  The content scan
    (ops/sh.detect_active_degree) later refines the degree DOWN from this
    structural upper bound; it can never recover an under-estimate.
    """
    for deg in (0, 1, 2, 3):
        if DIM_FOR_DEGREE[deg] >= dim:
            return deg
    return 3


def degree_for_last_active(last_idx: int) -> int:
    """Last non-zero f_rest index -> active degree (reference converter.py:143-146)."""
    if last_idx >= 24:
        return 3
    if last_idx >= 9:
        return 2
    if last_idx >= 0:
        return 1
    return 0


def _buffer_root(a: np.ndarray):
    """Walk the .base chain to the owning buffer object + its address."""
    b = a
    while isinstance(b, np.ndarray) and b.base is not None:
        b = b.base
    if isinstance(b, np.ndarray):
        addr = b.__array_interface__["data"][0]
    else:
        try:  # memoryview / mmap / bytes-like
            addr = np.frombuffer(b, np.uint8).__array_interface__["data"][0]
        except (TypeError, ValueError, BufferError):
            return None, 0
    return b, addr


def _shared_record_gather(named: dict, idx: np.ndarray) -> dict:
    """One-pass row gather for numpy view leaves sharing a record buffer.

    PLY reads hand the cloud zero-copy strided views over one mmap'd
    record array (formats/ply_gs.py); per-leaf ``np.take`` on such views is
    a per-element strided copy loop that re-reads the record cache lines
    once PER LEAF (measured 0.2-0.55 s at 1M rows -> 233k).  Gathering the
    shared records as raw [n, span] u8 rows instead costs one contiguous
    pass (~25 ms) and the outputs are views over the gathered block.

    Returns {name: gathered} for the leaves it handled; callers fall back
    to np.take for the rest.  Leaves qualify when they share a buffer root
    and a leading stride (the record size) and their row footprint fits in
    one record span.
    """
    groups: dict = {}
    for name, a in named.items():
        if not isinstance(a, np.ndarray) or a.ndim == 0 or a.base is None:
            continue
        if a.ndim == 1 or a.strides[0] <= 0:
            continue  # 1-D leaves are cheap to take; weird strides bail
        root, root_addr = _buffer_root(a)
        if root is None:
            continue
        rec = a.strides[0]
        off = a.__array_interface__["data"][0] - root_addr
        row_bytes = sum(
            (s - 1) * st for s, st in zip(a.shape[1:], a.strides[1:])
        ) + a.itemsize
        groups.setdefault((id(root), rec), []).append(
            (name, a, root, off, row_bytes)
        )

    out: dict = {}
    m = len(idx)
    chunk = 65536
    for (_, rec), members in groups.items():
        if len(members) < 2:
            continue  # no sharing to exploit
        n = members[0][1].shape[0]
        if any(a.shape[0] != n for _, a, _, _, _ in members):
            continue
        anchor = min(off for _, _, _, off, _ in members)
        span = max(off + rb for _, _, _, off, rb in members) - anchor
        if span > rec:
            continue
        root = members[0][2]
        try:
            rows = np.ndarray((n, span), np.uint8, buffer=root,
                              offset=anchor, strides=(rec, 1))
        except (TypeError, ValueError):
            continue
        # Chunked gather + densify: pull a cache-sized block of raw record
        # rows, then peel each leaf's columns into its CONTIGUOUS output
        # while the block is hot.  Contiguous outputs matter: the encode
        # stages run several elementwise passes per leaf, and a strided
        # [m, span] view would drag the full record span through cache on
        # every one of them.
        dst = {
            name: np.empty((m,) + a.shape[1:], a.dtype)
            for name, a, _, _, _ in members
        }
        for s in range(0, m, chunk):
            sel = idx[s:s + chunk]
            g = rows[sel]  # contiguous [c, span] u8
            for name, a, _, off, _ in members:
                view = np.ndarray(
                    (len(sel),) + a.shape[1:], a.dtype, buffer=g,
                    offset=off - anchor, strides=(span,) + a.strides[1:],
                )
                dst[name][s:s + len(sel)] = view
        out.update(dst)
    return out


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
            if idx.dtype == bool:
                # accept keep-masks too: np.take would silently read rows
                # 0/1 and the record gather assumes integer indices
                idx = np.flatnonzero(idx)
            named = {
                "pos": self.pos, "sh_dc": self.sh_dc,
                "sh_rest": self.sh_rest, "opacity": self.opacity,
                "log_scale": self.log_scale, "quat": self.quat,
                "normal": self.normal,
            }
            if self.rgb is not None:
                named["rgb"] = self.rgb
            named.update({f"x:{k}": v for k, v in self.extras.items()})
            shared = _shared_record_gather(named, idx)

            def take_named(name, a):
                if name in shared:
                    return shared[name]
                a = np.asarray(a)
                if a.ndim and a.strides[0] == 0:
                    # broadcast leaf (e.g. cap_degree's all-zero sh_rest):
                    # every row is identical, so the gather is a reshape —
                    # np.take would grind through a 0-stride fancy-index
                    return np.broadcast_to(a[0], (len(idx),) + a.shape[1:])
                return np.take(a, idx, axis=0)
        else:
            take_named = lambda name, a: jnp.take(a, idx, axis=0)
        return self.replace(
            pos=take_named("pos", self.pos),
            sh_dc=take_named("sh_dc", self.sh_dc),
            sh_rest=take_named("sh_rest", self.sh_rest),
            opacity=take_named("opacity", self.opacity),
            log_scale=take_named("log_scale", self.log_scale),
            quat=take_named("quat", self.quat),
            normal=take_named("normal", self.normal),
            rgb=take_named("rgb", self.rgb) if self.rgb is not None else None,
            extras={k: take_named(f"x:{k}", v) for k, v in self.extras.items()},
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
