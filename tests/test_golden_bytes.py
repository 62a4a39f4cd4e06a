"""Byte-exact container layout tests (SURVEY.md §7.3: "Byte-exact container
emission ... so reference viewers can open our files").

These pin the raw header/record offsets of each binary format against the
published layouts (ksplat.py:34-53, spz.py:37, splat.py:24-29 in the
reference)."""

import gzip
import struct
import zipfile

import numpy as np

from gsconverter_tpu.formats import get_handler
from tests.conftest import make_cloud


def test_spz_header_bytes(tmp_path):
    c = make_cloud(123, sh_degree=1)
    path = str(tmp_path / "t.spz")
    get_handler("spz").write(c, path)
    raw = gzip.decompress(open(path, "rb").read())
    magic, version, n, sh_deg, frac, flags, reserved = struct.unpack("<IIIBBBB", raw[:16])
    assert magic == 0x5053474E
    assert version == 3
    assert n == 123
    assert sh_deg == 1
    assert frac == 12
    assert flags == 1  # FlagAntialiased
    # body size: pos 9B + alpha 1 + color 3 + scale 3 + rot 4 + sh 3*3
    assert len(raw) - 16 == 123 * (9 + 1 + 3 + 3 + 4 + 9)


def test_splat_record_size(tmp_path):
    c = make_cloud(77, sh_degree=0)
    path = str(tmp_path / "t.splat")
    get_handler("splat").write(c, path)
    data = open(path, "rb").read()
    assert len(data) == 77 * 32
    # first record: pos f32x3 then scale f32x3 (positive linear scales)
    scales = np.frombuffer(data, "<f4", 3, 12)
    assert np.all(scales > 0)


def test_ksplat_header_offsets(tmp_path):
    c = make_cloud(300, sh_degree=2)
    path = str(tmp_path / "t.ksplat")
    get_handler("ksplat").write(c, path, compression_level=1, bucket_size=128)
    raw = open(path, "rb").read()
    assert raw[0] == 0 and raw[1] == 1  # version 0.1
    assert struct.unpack_from("<I", raw, 4)[0] == 1  # maxSectionCount
    assert struct.unpack_from("<I", raw, 8)[0] == 1  # sectionCount
    assert struct.unpack_from("<I", raw, 12)[0] == 300  # maxSplatCount
    assert struct.unpack_from("<I", raw, 16)[0] == 300  # splatCount
    assert struct.unpack_from("<H", raw, 20)[0] == 1  # compressionLevel
    sec = raw[4096 : 4096 + 1024]
    assert struct.unpack_from("<I", sec, 0)[0] == 300
    assert struct.unpack_from("<I", sec, 8)[0] == 128  # bucketSize
    assert struct.unpack_from("<I", sec, 12)[0] == 3  # bucketCount = ceil(300/128)
    assert struct.unpack_from("<I", sec, 24)[0] == 32767  # compressionScaleRange
    assert struct.unpack_from("<I", sec, 32)[0] == 2  # fullBucketCount
    assert struct.unpack_from("<I", sec, 36)[0] == 1  # partiallyFilledBucketCount
    assert struct.unpack_from("<H", sec, 40)[0] == 2  # shDegree
    # payload: pfb u32 + centers 3*12 + 300 * (6+6+8+4 + 24*2)
    expected = 4096 + 1024 + 4 + 3 * 12 + 300 * (24 + 48)
    assert len(raw) == expected


def test_compressed_ply_element_layout(tmp_path):
    from gsconverter_tpu.utils import ply

    c = make_cloud(300, sh_degree=1)
    path = str(tmp_path / "t.ply")
    get_handler("compressed_ply").write(c, path)
    plyf = ply.read(path)
    assert [e.name for e in plyf.elements] == ["chunk", "vertex", "sh"]
    chunk = plyf["chunk"]
    assert len(chunk.data) == 2  # ceil(300/256)
    assert chunk.data.dtype.names[:6] == ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z")
    vert = plyf["vertex"].data
    assert vert.dtype.names == ("packed_position", "packed_rotation", "packed_scale", "packed_color")
    assert all(vert.dtype[n] == np.dtype("<u4") for n in vert.dtype.names)
    assert len(plyf["sh"].data.dtype.names) == 9  # degree-1 coeffs


def test_sog_container_layout(tmp_path):
    import json

    c = make_cloud(1500, sh_degree=1)
    path = str(tmp_path / "t.sog")
    get_handler("sog").write(c, path)
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert {"meta.json", "means_l.webp", "means_u.webp", "quats.webp",
                "scales.webp", "sh0.webp", "shN_centroids.webp",
                "shN_labels.webp"} <= names
        meta = json.load(zf.open("meta.json"))
        assert meta["version"] == 2
        assert meta["count"] == 1500
        assert len(meta["scales"]["codebook"]) == 256
        assert len(meta["sh0"]["codebook"]) == 256
        assert meta["shN"]["bands"] == 1
        # all stored (ZIP_STORED), WebP provides compression
        for info in zf.infolist():
            assert info.compress_type == zipfile.ZIP_STORED
