"""A minimal ``plyfile`` stand-in backed by gsconverter_tpu.utils.ply.

The reference implementation (/root/reference) does its PLY container IO
through the external ``plyfile`` package, which is absent here.  This shim
implements exactly the surface the reference uses — ``PlyData.read``,
``plydata['vertex'].data``, ``plydata.elements``, ``PlyElement.describe``,
``PlyData([...], byte_order='<').write`` — so the reference's ply_3dgs /
ply_cc / compressed_ply codecs run in-process for cross-implementation
tests (reference usage: compressed_ply.py:16-17,381-385, ply_cc.py:10,
118-131, ply_3dgs.py:10,111-120).
"""

from __future__ import annotations

import sys
import types

from gsconverter_tpu.utils import ply as _ply


class PlyElement:
    def __init__(self, name: str, data):
        self.name = name
        self.data = data

    @staticmethod
    def describe(data, name: str):
        return PlyElement(name, data)


class PlyData:
    def __init__(self, elements=(), text: bool = False, byte_order: str = "<"):
        self.elements = [
            e if isinstance(e, PlyElement) else PlyElement(e.name, e.data)
            for e in elements
        ]
        if text or byte_order == ">":
            raise NotImplementedError("shim writes binary_little_endian only")

    def __contains__(self, name: str) -> bool:
        return any(e.name == name for e in self.elements)

    def __getitem__(self, name: str) -> PlyElement:
        for e in self.elements:
            if e.name == name:
                return e
        raise KeyError(name)

    @staticmethod
    def read(path: str) -> "PlyData":
        pf = _ply.read(path)
        return PlyData([PlyElement(e.name, e.data) for e in pf.elements])

    def write(self, path: str) -> None:
        _ply.write(
            path, [_ply.PlyElement(e.name, e.data) for e in self.elements]
        )


def install() -> None:
    """Register this module as ``plyfile`` (replacing any earlier stub)."""
    mod = types.ModuleType("plyfile")
    mod.PlyData = PlyData
    mod.PlyElement = PlyElement
    sys.modules["plyfile"] = mod
