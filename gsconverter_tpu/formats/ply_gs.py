"""3DGS and CloudCompare PLY codecs.

Behavior parity targets:
  - ``Ply3DGSFormat`` — reference formats/ply_3dgs.py: prefix normalization
    (``scalar_``, ``scal_``, ``scalar_scal_``), zero-padding SH to 45 unless
    ``crop_sh``, extra vertex-prop and extra-element passthrough.
  - ``PlyCCFormat`` — reference formats/ply_cc.py: identical schema but writes
    a ``scalar_`` prefix on all non-spatial props (spatial x..z/n*/rgb stay
    unprefixed, ply_cc.py:86-91) and forces RGB.

Design delta (TPU-first): the structured-array container is parsed once on
host; all field math is a jnp staging step into the SoA cloud.  SH columns of
lower-degree files are re-strided into canonical [3,15] channel-major layout
(see SplatCloud.sh_rest_from_flat for the documented divergence).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..cloud import COEFFS_FOR_DEGREE, MAX_SH_DIM, SplatCloud, degree_for_coeffs
from ..utils import ply
from ..utils.log import debug_print, status_print
from .base import BaseFormat, register

# Canonical field order of a 3DGS vertex element (reference structures.py:10-17).
_SPATIAL = ("x", "y", "z", "nx", "ny", "nz")
_CORE_TAIL = ("opacity", "scale_0", "scale_1", "scale_2",
              "rot_0", "rot_1", "rot_2", "rot_3")
_RGB = ("red", "green", "blue")


def standard_names(has_rgb: bool, n_rest: int = 45) -> list[str]:
    names = list(_SPATIAL)
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(n_rest)]
    names += list(_CORE_TAIL)
    if has_rgb:
        names += list(_RGB)
    return names


def _detect_prefix(source_names: set[str]) -> str:
    """Prefix sniffing with correct nesting (reference ply_3dgs.py:23-28;
    note ply_cc.py:23-26 has an unreachable elif — we use the correct order)."""
    if "scalar_scal_f_dc_0" in source_names:
        return "scalar_scal_"
    if "scalar_f_dc_0" in source_names:
        return "scalar_"
    if "scal_f_dc_0" in source_names:
        return "scal_"
    return ""


def _get(vertices: np.ndarray, prefix: str, name: str):
    names = vertices.dtype.names
    if name in names:
        return vertices[name]
    if prefix + name in names:
        return vertices[prefix + name]
    if "scalar_" + name in names:
        return vertices["scalar_" + name]
    return None


def cloud_from_vertex_array(
    vertices: np.ndarray, extra_elements: tuple = ()
) -> SplatCloud:
    """Build the canonical SoA cloud from a PLY-style structured vertex array."""
    n = len(vertices)
    prefix = _detect_prefix(set(vertices.dtype.names))

    def col(name, default=0.0):
        v = _get(vertices, prefix, name)
        if v is None:
            return np.full(n, default, np.float32)
        return np.ascontiguousarray(v, dtype=np.float32)

    pos = np.stack([col("x"), col("y"), col("z")], axis=1)
    normal = np.stack([col("nx"), col("ny"), col("nz")], axis=1)
    sh_dc = np.stack([col("f_dc_0"), col("f_dc_1"), col("f_dc_2")], axis=1)

    # SH AC: count present columns, re-stride to [3,15].
    rest_cols = []
    for i in range(45):
        v = _get(vertices, prefix, f"f_rest_{i}")
        if v is None:
            break
        rest_cols.append(np.ascontiguousarray(v, dtype=np.float32))
    n_rest = len(rest_cols)
    # host-side re-stride (numpy, no device compile on the IO path)
    sh_rest = np.zeros((n, 3, 15), np.float32)
    if n_rest:
        dim = n_rest // 3
        flat = np.stack(rest_cols, axis=1)
        sh_rest[:, :, :dim] = flat.reshape(n, 3, dim)

    opacity = col("opacity")
    log_scale = np.stack([col("scale_0"), col("scale_1"), col("scale_2")], axis=1)
    quat = np.stack([col("rot_0", 1.0), col("rot_1"), col("rot_2"), col("rot_3")], axis=1)

    has_rgb = "red" in vertices.dtype.names
    rgb = (
        np.stack([vertices["red"], vertices["green"], vertices["blue"]], axis=1).astype(np.uint8)
        if has_rgb
        else None
    )

    # Extra vertex props: anything not mapped above (reference ply_3dgs.py:30-41).
    std = set()
    for name in standard_names(True):
        std.add(name)
        std.add(prefix + name)
        std.add("scalar_" + name)
    extras = {}
    for name in vertices.dtype.names:
        if name not in std:
            internal = name[7:] if name.startswith("scalar_") else name
            extras[internal] = np.ascontiguousarray(vertices[name])

    return SplatCloud(
        pos=jnp.asarray(pos),
        sh_dc=jnp.asarray(sh_dc),
        sh_rest=jnp.asarray(sh_rest),
        opacity=jnp.asarray(opacity),
        log_scale=jnp.asarray(log_scale),
        quat=jnp.asarray(quat),
        normal=jnp.asarray(normal),
        rgb=jnp.asarray(rgb) if rgb is not None else None,
        extras={k: jnp.asarray(v) for k, v in extras.items()},
        active_sh_degree=degree_for_coeffs(n_rest),
        extra_elements=extra_elements,
    )


def vertex_array_from_cloud(
    cloud: SplatCloud, crop_sh: bool, prefix_nonspatial: bool
) -> np.ndarray:
    """Flatten the SoA cloud back into a PLY-ordered structured array."""
    c = cloud.to_numpy()
    n = c.pos.shape[0]
    n_rest = 45
    if crop_sh:
        # Keep only columns up to the last non-zero flat index
        # (reference ply_3dgs.py:69-78).
        flat = c.sh_rest.reshape(n, 3 * MAX_SH_DIM)
        nz = np.nonzero(np.any(flat != 0, axis=0))[0]
        n_rest = int(nz[-1]) + 1 if nz.size else 0

    spatial = set(_SPATIAL) | set(_RGB)

    def out_name(name: str) -> str:
        if prefix_nonspatial and name not in spatial:
            return "scalar_" + name
        return name

    fields: list[tuple[str, str]] = []
    for name in standard_names(c.rgb is not None, n_rest):
        dt = "u1" if name in _RGB else "f4"
        fields.append((out_name(name), dt))
    for name, arr in c.extras.items():
        fields.append((out_name(name), arr.dtype.str))

    out = np.zeros(n, dtype=np.dtype(fields))
    out[out_name("x")], out[out_name("y")], out[out_name("z")] = c.pos.T
    out[out_name("nx")], out[out_name("ny")], out[out_name("nz")] = c.normal.T
    for i in range(3):
        out[out_name(f"f_dc_{i}")] = c.sh_dc[:, i]
    flat = c.sh_rest.reshape(n, 3 * MAX_SH_DIM)
    for i in range(n_rest):
        out[out_name(f"f_rest_{i}")] = flat[:, i]
    out[out_name("opacity")] = c.opacity
    for i in range(3):
        out[out_name(f"scale_{i}")] = c.log_scale[:, i]
    for i in range(4):
        out[out_name(f"rot_{i}")] = c.quat[:, i]
    if c.rgb is not None:
        for i, name in enumerate(_RGB):
            out[name] = c.rgb[:, i]
    for name, arr in c.extras.items():
        out[out_name(name)] = arr
    return out


class _PlyBase(BaseFormat):
    extension = ".ply"
    max_sh_degree = 3
    supports_extra_elements = True
    _prefix_nonspatial = False

    def read(self, path: str, **kwargs) -> SplatCloud:
        debug_print(f"[DEBUG] Reading PLY ({self.name}) from {path}")
        plyf = ply.read(path)
        if "vertex" not in plyf:
            raise ValueError("PLY file does not contain 'vertex' element")
        extra_elements = tuple(e for e in plyf.elements if e.name != "vertex")
        self.extra_elements = extra_elements
        return cloud_from_vertex_array(plyf["vertex"].data, extra_elements)

    def write(self, cloud: SplatCloud, path: str, **kwargs) -> None:
        debug_print(f"[DEBUG] Writing PLY ({self.name}) to {path}")
        arr = vertex_array_from_cloud(
            cloud, crop_sh=bool(kwargs.get("crop_sh")), prefix_nonspatial=self._prefix_nonspatial
        )
        elements = [ply.PlyElement("vertex", arr)]
        extra = kwargs.get("extra_elements") or ()
        if extra:
            elements.extend(extra)
            status_print(f"Maintained {len(extra)} extra PLY elements.")
        ply.write(path, elements)
        status_print(f"{self.name} PLY write completed. {len(arr)} points.")


@register
class Ply3DGSFormat(_PlyBase):
    name = "3dgs"


@register
class PlyCCFormat(_PlyBase):
    name = "cc"
    needs_rgb = True
    _prefix_nonspatial = True
