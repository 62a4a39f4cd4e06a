"""Cross-validation against the ACTUAL reference implementation.

The reference package at /root/reference runs here with its CPU fallbacks
(SURVEY.md §4: "we can run /root/reference under Python with CPU fallbacks to
mint fixtures").  ``plyfile`` is absent in this environment, so a minimal
stub satisfies the import; the SPZ / splat / ksplat codecs and the filter
engine don't touch it.

These are the strongest parity tests we have: byte-streams written by one
implementation decoded by the other, and filter keep-sets compared
element-for-element.
"""

import sys
import types

import numpy as np
import pytest

from gsconverter_tpu.formats import get_handler
from tests.conftest import make_cloud


@pytest.fixture(scope="module")
def ref():
    """Import the reference gsconverter package with a plyfile stub."""
    if "plyfile" not in sys.modules:
        stub = types.ModuleType("plyfile")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("plyfile stub: not available in tests")

        stub.PlyData = _Unavailable
        stub.PlyElement = _Unavailable
        sys.modules["plyfile"] = stub
    sys.path.insert(0, "/root/reference")
    import gsconverter.formats.spz as ref_spz
    import gsconverter.formats.splat as ref_splat
    import gsconverter.formats.ksplat as ref_ksplat
    import gsconverter.processing.data_processor as ref_dp
    import gsconverter.structures as ref_structures

    return types.SimpleNamespace(
        spz=ref_spz, splat=ref_splat, ksplat=ref_ksplat,
        dp=ref_dp, structures=ref_structures,
    )


def cloud_to_ref_array(cloud, ref, sh_degree=3):
    """Build the reference's canonical structured array from our SoA cloud."""
    c = cloud.to_numpy()
    n = c.pos.shape[0]
    dtype, _ = ref.structures.GaussianStruct.define_dtype(
        has_scal=False, has_rgb=False, sh_degree=sh_degree
    )
    arr = np.zeros(n, dtype=dtype)
    arr["x"], arr["y"], arr["z"] = c.pos.T
    for i in range(3):
        arr[f"f_dc_{i}"] = c.sh_dc[:, i]
    flat = c.sh_rest.reshape(n, 45)
    n_coeffs = {0: 0, 1: 9, 2: 24, 3: 45}[sh_degree]
    # our canonical layout is degree-3 stride-15; re-pack to the written
    # degree's stride for the reference array when lower
    dim = n_coeffs // 3 if n_coeffs else 0
    packed = c.sh_rest[:, :, :dim].reshape(n, n_coeffs) if dim else np.zeros((n, 0))
    for i in range(n_coeffs):
        arr[f"f_rest_{i}"] = packed[:, i]
    arr["opacity"] = c.opacity
    for i in range(3):
        arr[f"scale_{i}"] = c.log_scale[:, i]
    for i in range(4):
        arr[f"rot_{i}"] = c.quat[:, i]
    return arr


# ------------------------------------------------------------------- SPZ


def test_spz_ours_written_reference_read(ref, tmp_path):
    c = make_cloud(300, sh_degree=2)
    path = str(tmp_path / "ours.spz")
    get_handler("spz").write(c, path)

    data = ref.spz.SpzFormat().read(path)
    np.testing.assert_allclose(data["x"], np.asarray(c.pos)[:, 0], atol=2.0 / 4096)
    np.testing.assert_allclose(
        data["scale_0"], np.asarray(c.log_scale)[:, 0], atol=1 / 16 + 1e-6
    )
    # reference reads SH with stride = written degree's dim (spz.py:247-250)
    ours = np.asarray(c.sh_rest)
    np.testing.assert_allclose(data["f_rest_0"], ours[:, 0, 0], atol=8.5 / 128)
    np.testing.assert_allclose(data["f_rest_8"], ours[:, 1, 0], atol=8.5 / 128)
    q_ref = np.stack([data[f"rot_{i}"] for i in range(4)], axis=1)
    dots = np.abs(np.sum(q_ref * np.asarray(c.quat), axis=1))
    assert np.all(dots > 0.9999)


def test_spz_reference_written_ours_read(ref, tmp_path):
    c = make_cloud(300, sh_degree=2)
    arr = cloud_to_ref_array(c, ref, sh_degree=3)
    # reference SPZ write detects degree from content; stride-15 grouped
    # (spz.py:151-154) matches our degree-3 full-width layout exactly when
    # content is degree 3 — use degree 3 for byte-level grouping parity
    c3 = make_cloud(300, sh_degree=3, seed=5)
    arr = cloud_to_ref_array(c3, ref, sh_degree=3)
    path = str(tmp_path / "ref.spz")
    ref.spz.SpzFormat().write(arr, path)

    d = get_handler("spz").read(path)
    assert d.n == 300 and d.active_sh_degree == 3
    np.testing.assert_allclose(np.asarray(d.pos)[:, 0], arr["x"], atol=2.0 / 4096)
    np.testing.assert_allclose(
        np.asarray(d.log_scale),
        np.stack([arr[f"scale_{i}"] for i in range(3)], axis=1), atol=1 / 16 + 1e-6
    )
    ours = np.asarray(d.sh_rest)
    np.testing.assert_allclose(ours[:, 0, 0], arr["f_rest_0"], atol=8.5 / 128)
    np.testing.assert_allclose(ours[:, 1, 0], arr["f_rest_15"], atol=8.5 / 128)
    q = np.asarray(d.quat)
    q_src = np.stack([arr[f"rot_{i}"] for i in range(4)], axis=1)
    dots = np.abs(np.sum(q * q_src, axis=1))
    assert np.all(dots > 0.9999)


# ----------------------------------------------------------------- .splat


def test_splat_ours_written_reference_read(ref, tmp_path):
    c = make_cloud(200, sh_degree=0)
    path = str(tmp_path / "ours.splat")
    get_handler("splat").write(c, path)
    data = ref.splat.SplatFormat().read(path)
    assert len(data) == 200
    # both sort by the same metric: compare via sorted x
    np.testing.assert_allclose(
        np.sort(data["x"]), np.sort(np.asarray(c.pos)[:, 0]), atol=1e-6
    )


def test_splat_reference_written_ours_read(ref, tmp_path):
    c = make_cloud(200, sh_degree=0)
    arr = cloud_to_ref_array(c, ref, sh_degree=0)
    path = str(tmp_path / "ref.splat")
    ref.splat.SplatFormat().write(arr, path)
    d = get_handler("splat").read(path)
    assert d.n == 200
    np.testing.assert_allclose(
        np.sort(np.asarray(d.pos)[:, 0]), np.sort(arr["x"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(d.log_scale)[:, 0]), np.sort(arr["scale_0"]), atol=1e-5
    )


# ----------------------------------------------------------------- ksplat


@pytest.mark.parametrize("level", [0, 2])
def test_ksplat_ours_written_reference_read(ref, level, tmp_path):
    c = make_cloud(300, sh_degree=2)
    path = str(tmp_path / "ours.ksplat")
    get_handler("ksplat").write(c, path, compression_level=level)
    data = ref.ksplat.KSplatFormat().read(path)
    assert len(data) == 300
    tol = 1e-5 if level == 0 else 2e-3
    np.testing.assert_allclose(
        np.sort(data["x"]), np.sort(np.asarray(c.pos)[:, 0]), atol=tol
    )
    # opacity is u8 in sigmoid space: compare there (logit tails saturate)
    sig = lambda x: 1 / (1 + np.exp(-np.asarray(x, np.float64)))
    np.testing.assert_allclose(
        np.sort(sig(data["opacity"])), np.sort(sig(c.opacity)), atol=1.5 / 255
    )


def test_ksplat_reference_written_ours_read(ref, tmp_path):
    c = make_cloud(300, sh_degree=2)
    arr = cloud_to_ref_array(c, ref, sh_degree=3)
    path = str(tmp_path / "ref.ksplat")
    ref.ksplat.KSplatFormat().write(arr, path, compression_level=0)
    d = get_handler("ksplat").read(path)
    assert d.n == 300
    np.testing.assert_allclose(np.asarray(d.pos)[:, 0], arr["x"], atol=1e-5)


# ---------------------------------------------------------------- filters


def test_density_filter_parity_with_reference_bfs(ref):
    """Our label-propagation connected components vs the reference's serial
    BFS — identical keep-sets on the same input."""
    r = np.random.default_rng(3)
    blob_a = r.uniform(0, 5, (2500, 3)).astype(np.float32)
    blob_b = r.uniform(0, 3, (800, 3)).astype(np.float32) + 30.0
    noise = r.uniform(-20, 60, (100, 3)).astype(np.float32)
    pos = np.concatenate([blob_a, blob_b, noise])
    n = len(pos)

    arr = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")])
    arr["x"], arr["y"], arr["z"] = pos.T
    dp = ref.dp.DataProcessor(arr.copy())
    kept_ref = dp.apply_density_filter(voxel_size=1.0, threshold_percentage=0.3)
    ref_set = set(map(tuple, np.round(
        np.stack([kept_ref["x"], kept_ref["y"], kept_ref["z"]], 1), 4)))

    import jax.numpy as jnp
    from gsconverter_tpu.ops.density import density_mask

    mask = np.asarray(density_mask(jnp.asarray(pos), 1.0, 0.3))
    our_set = set(map(tuple, np.round(pos[mask], 4)))
    assert our_set == ref_set


def test_density_multicluster_parity(ref):
    r = np.random.default_rng(4)
    a = r.uniform(0, 5, (2000, 3)).astype(np.float32)
    b = r.uniform(0, 4, (1200, 3)).astype(np.float32) + 40.0
    pos = np.concatenate([a, b])
    arr = np.zeros(len(pos), dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")])
    arr["x"], arr["y"], arr["z"] = pos.T
    dp = ref.dp.DataProcessor(arr.copy())
    kept_ref = dp.apply_density_filter(1.0, 0.3, keep_multicluster=True)

    import jax.numpy as jnp
    from gsconverter_tpu.ops.density import density_mask

    mask = np.asarray(density_mask(jnp.asarray(pos), 1.0, 0.3, keep_multicluster=True))
    assert mask.sum() == len(kept_ref)
    ref_set = set(map(tuple, np.round(
        np.stack([kept_ref["x"], kept_ref["y"], kept_ref["z"]], 1), 4)))
    assert set(map(tuple, np.round(pos[mask], 4))) == ref_set
