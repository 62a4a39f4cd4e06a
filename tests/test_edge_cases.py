"""Edge cases: empty clouds, single splat, ascii PLY, extra elements."""

import numpy as np
import jax.numpy as jnp
import pytest

from gsconverter_tpu.cloud import SplatCloud
from gsconverter_tpu.converter import convert
from gsconverter_tpu.formats import get_handler
from gsconverter_tpu.ops import filters
from gsconverter_tpu.utils import ply
from tests.conftest import make_cloud


def test_single_splat_roundtrip(tmp_path):
    c = make_cloud(1)
    for fmt in ["3dgs", "splat", "spz", "compressed_ply", "parquet"]:
        path = str(tmp_path / f"one{get_handler(fmt).extension}")
        get_handler(fmt).write(c, path)
        d = get_handler(fmt).read(path)
        assert d.n == 1, fmt


def test_empty_cloud_write_read(tmp_path):
    c = SplatCloud.zeros(0)
    path = str(tmp_path / "empty.ply")
    get_handler("3dgs").write(c, path)
    d = get_handler("3dgs").read(path)
    assert d.n == 0


def test_filters_on_tiny_clouds():
    c = make_cloud(3)
    out = filters.alpha_filter(c, 1)
    assert out.n <= 3
    out = filters.crop_by_bbox(c, (-100, -100, -100, 100, 100, 100))
    assert out.n == 3
    out = filters.remove_flyers(c, k=25, threshold_factor=10.5)
    assert out.n <= 3
    out = filters.density_filter(c, 1.0, 0.0)
    assert out.n >= 1


def test_ascii_ply_read(tmp_path):
    path = str(tmp_path / "a.ply")
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float f_dc_0\nproperty float f_dc_1\nproperty float f_dc_2\n"
            "property float opacity\n"
            "property float scale_0\nproperty float scale_1\nproperty float scale_2\n"
            "property float rot_0\nproperty float rot_1\nproperty float rot_2\nproperty float rot_3\n"
            "end_header\n"
            "1 2 3 0.1 0.2 0.3 0.5 -4 -4 -4 1 0 0 0\n"
            "4 5 6 0.4 0.5 0.6 1.5 -3 -3 -3 0 1 0 0\n"
        )
    d = get_handler("3dgs").read(path)
    assert d.n == 2
    np.testing.assert_allclose(np.asarray(d.pos)[0], [1, 2, 3])
    np.testing.assert_allclose(np.asarray(d.opacity), [0.5, 1.5])


def test_extra_elements_preserved_through_converter(tmp_path):
    c = make_cloud(50)
    src = str(tmp_path / "s.ply")
    # write with an extra camera element
    arr = np.zeros(2, dtype=[("fx", "<f4"), ("fy", "<f4")])
    arr["fx"] = [500.0, 600.0]
    from gsconverter_tpu.formats.ply_gs import vertex_array_from_cloud

    verts = vertex_array_from_cloud(c, crop_sh=False, prefix_nonspatial=False)
    ply.write(src, [ply.PlyElement("vertex", verts), ply.PlyElement("intrinsic", arr)])

    out = str(tmp_path / "o.ply")
    convert(src, out, "3dgs", maintain_extra_elements=True, min_opacity=1, force=True)
    plyf = ply.read(out)
    assert "intrinsic" in plyf
    np.testing.assert_allclose(plyf["intrinsic"].data["fx"], [500.0, 600.0])

    # without the flag the element is stripped
    out2 = str(tmp_path / "o2.ply")
    convert(src, out2, "3dgs", min_opacity=1, force=True)
    assert "intrinsic" not in ply.read(out2)


def test_ply_list_property_roundtrip(tmp_path):
    """Face-style list properties survive the generic slow path."""
    path = str(tmp_path / "f.ply")
    verts = np.zeros(3, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
    el_v = ply.PlyElement("vertex", verts)
    faces = np.zeros(1, dtype=[("_", "u1")])[["_"]]
    el_f = ply.PlyElement(
        "face",
        np.zeros(1, dtype=[("_", "u1")]),
        list_props={"vertex_indices": ("uchar", "int", [np.array([0, 1, 2])])},
    )
    ply.write(path, [el_v, el_f])
    back = ply.read(path)
    assert "face" in back
    np.testing.assert_array_equal(back["face"].list_props["vertex_indices"][2][0], [0, 1, 2])


def test_ply_double_precision_columns(tmp_path):
    """A PLY whose vertex columns are float64 (some exporters do this) must
    decode through the per-column fallback — the grouped strided fast path
    only applies to consecutive f4 runs."""
    import numpy as np

    from gsconverter_tpu.formats import get_handler
    from gsconverter_tpu.utils import ply

    n = 64
    r = np.random.default_rng(0)
    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(9)]
             + ["opacity", "scale_0", "scale_1", "scale_2",
                "rot_0", "rot_1", "rot_2", "rot_3"])
    arr = np.zeros(n, dtype=[(nm, "<f8") for nm in names])
    for nm in names:
        arr[nm] = r.normal(size=n)
    path = str(tmp_path / "dbl.ply")
    ply.write(path, [ply.PlyElement("vertex", arr)])

    cloud = get_handler("3dgs").read(path)
    assert cloud.n == n and cloud.is_host
    assert cloud.pos.dtype == np.float32
    np.testing.assert_allclose(cloud.pos[:, 0], arr["x"].astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_allclose(cloud.sh_rest[:, 0, 0],
                               arr["f_rest_0"].astype(np.float32), rtol=1e-6)
    assert cloud.active_sh_degree == 1  # 9 f_rest columns


def test_ply_mixed_width_core_fields(tmp_path):
    """Vertex records mixing f4 core fields with interleaved non-f4 extras
    break the consecutive-f4 assumption mid-run; decode must still be
    correct via fallback."""
    import numpy as np

    from gsconverter_tpu.formats import get_handler
    from gsconverter_tpu.utils import ply

    n = 32
    r = np.random.default_rng(1)
    dt = [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
          ("weird_id", "<u2"),  # interrupts the spatial run
          ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
          ("f_dc_0", "<f4"), ("f_dc_1", "<f4"), ("f_dc_2", "<f4"),
          ("opacity", "<f4"),
          ("scale_0", "<f4"), ("scale_1", "<f4"), ("scale_2", "<f4"),
          ("rot_0", "<f4"), ("rot_1", "<f4"), ("rot_2", "<f4"),
          ("rot_3", "<f4")]
    arr = np.zeros(n, dtype=dt)
    for nm, t in dt:
        arr[nm] = (r.integers(0, 100, n) if t == "<u2"
                   else r.normal(size=n).astype(np.float32))
    path = str(tmp_path / "mixed.ply")
    ply.write(path, [ply.PlyElement("vertex", arr)])

    cloud = get_handler("3dgs").read(path)
    assert cloud.n == n
    np.testing.assert_array_equal(cloud.pos[:, 2], arr["z"])
    np.testing.assert_array_equal(cloud.normal[:, 0], arr["nx"])
    # the interloper survives as an extra vertex prop
    assert "weird_id" in cloud.extras
    np.testing.assert_array_equal(cloud.extras["weird_id"], arr["weird_id"])


def test_ply_big_endian_read(tmp_path):
    """binary_big_endian PLY (rare but legal) byte-swaps on read."""
    import numpy as np

    from gsconverter_tpu.formats import get_handler

    n = 8
    r = np.random.default_rng(2)
    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + ["opacity", "scale_0", "scale_1", "scale_2",
                "rot_0", "rot_1", "rot_2", "rot_3"])
    arr = np.zeros(n, dtype=[(nm, ">f4") for nm in names])
    for nm in names:
        arr[nm] = r.normal(size=n).astype(np.float32)
    header = ("ply\nformat binary_big_endian 1.0\n"
              f"element vertex {n}\n"
              + "".join(f"property float {nm}\n" for nm in names)
              + "end_header\n")
    path = str(tmp_path / "be.ply")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(arr.tobytes())

    cloud = get_handler("3dgs").read(path)
    assert cloud.n == n
    np.testing.assert_allclose(cloud.pos[:, 0],
                               arr["x"].astype("<f4"), rtol=1e-7)
    np.testing.assert_allclose(cloud.opacity,
                               arr["opacity"].astype("<f4"), rtol=1e-7)


def test_select_accepts_boolean_mask():
    """Host select() with a keep-mask must equal index-array select
    (np.take would silently read rows 0/1 from a bool array, and the
    shared-record gather assumes integer indices)."""
    r = np.random.default_rng(3)
    n = 1000
    from gsconverter_tpu.cloud import SplatCloud

    c = SplatCloud(
        pos=r.normal(size=(n, 3)).astype(np.float32),
        sh_dc=r.normal(size=(n, 3)).astype(np.float32),
        sh_rest=r.normal(size=(n, 3, 15)).astype(np.float32),
        opacity=r.normal(size=n).astype(np.float32),
        log_scale=r.normal(size=(n, 3)).astype(np.float32),
        quat=r.normal(size=(n, 4)).astype(np.float32),
        normal=np.zeros((n, 3), np.float32),
        active_sh_degree=3,
    )
    mask = r.random(n) < 0.3
    a = c.select(mask)
    b = c.select(np.flatnonzero(mask))
    assert a.n == int(mask.sum())
    np.testing.assert_array_equal(a.pos, b.pos)
    np.testing.assert_array_equal(a.sh_rest, b.sh_rest)
    np.testing.assert_array_equal(a.opacity, b.opacity)


def test_nonstandard_f_rest_count_covering_degree(tmp_path):
    """A 30-column f_rest PLY (10 per-channel coeffs, straddling bands 2/3)
    must read with a COVERING degree so the populated band-3 coefficients
    (indices 8-9) survive degree-sized processing (ADVICE r4: the floor
    degree let detect_active_degree's structural bound skip band 3)."""
    n = 4
    names = (["x", "y", "z"] + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(30)]
             + ["opacity", "scale_0", "scale_1", "scale_2",
                "rot_0", "rot_1", "rot_2", "rot_3"])
    path = str(tmp_path / "deg30.ply")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex %d\n" % n)
        f.writelines(f"property float {nm}\n" for nm in names)
        f.write("end_header\n")
        for i in range(n):
            row = np.zeros(len(names), np.float32)
            row[0:3] = [i, i, i]
            # channel-major flat layout: R coeffs 0..9 at cols 6..15 —
            # coeffs 8,9 are band 3
            row[6 + 8] = 0.25
            row[6 + 9] = 0.5
            row[36 + 4] = 1.0  # rot_0 (w)
            f.write(" ".join(f"{v:g}" for v in row) + "\n")
    c = get_handler("3dgs").read(path)
    assert c.active_sh_degree == 3  # covering, not floor(30 cols)=2
    np.testing.assert_allclose(np.asarray(c.sh_rest)[:, 0, 8], 0.25)
    from gsconverter_tpu.ops import sh
    assert sh.detect_active_degree(c, max_degree=c.active_sh_degree) == 3
    # end-to-end: converting to full PLY keeps the band-3 content
    out = str(tmp_path / "out.ply")
    convert(path, out, "3dgs", force=True)
    d = get_handler("3dgs").read(out)
    np.testing.assert_allclose(np.asarray(d.sh_rest)[:, 0, 9], 0.5)
