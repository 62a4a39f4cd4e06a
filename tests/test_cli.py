"""End-to-end CLI + Converter pipeline tests (SURVEY.md §3.1 call stack)."""

import os

import numpy as np
import pytest

from gsconverter_tpu.converter import Converter, convert, detect_format
from gsconverter_tpu.formats import get_handler
from gsconverter_tpu.main import main
from tests.conftest import make_cloud


@pytest.fixture
def ply_file(tmp_path):
    c = make_cloud(800, sh_degree=2)
    path = str(tmp_path / "scene.ply")
    get_handler("3dgs").write(c, path)
    return path


def test_detect_format(tmp_path, ply_file):
    assert detect_format(ply_file) == "3dgs"
    c = make_cloud(100, rgb=True)
    cc = str(tmp_path / "cc.ply")
    get_handler("cc").write(c, cc)
    assert detect_format(cc) == "cc"
    cp = str(tmp_path / "comp.ply")
    get_handler("compressed_ply").write(c, cp)
    assert detect_format(cp) == "compressed_ply"
    for fmt, ext in [("splat", ".splat"), ("spz", ".spz"), ("parquet", ".parquet")]:
        p = str(tmp_path / ("x" + ext))
        get_handler(fmt).write(make_cloud(50, sh_degree=0, rgb=True), p)
        assert detect_format(p) == fmt


def test_converter_pipeline_with_filters(tmp_path, ply_file):
    out = str(tmp_path / "out.splat")
    cloud = convert(
        ply_file, out, "splat",
        bbox=(-3, -3, -3, 3, 3, 3), min_opacity=20, sor_intensity=3.0,
    )
    assert os.path.exists(out)
    assert 0 < cloud.n <= 800
    pos = np.asarray(cloud.pos)
    assert np.all(np.abs(pos) <= 3.0)


def test_converter_sh_capping(tmp_path, ply_file):
    out = str(tmp_path / "out2.ply")
    cloud = convert(ply_file, out, "3dgs", sh_level=1, force=True)
    from gsconverter_tpu.ops.sh import detect_active_degree

    assert detect_active_degree(cloud) <= 1


def test_converter_rgb_auto(tmp_path, ply_file):
    out = str(tmp_path / "out.ksplat")
    cloud = convert(ply_file, out, "ksplat")
    assert cloud.has_rgb  # ksplat forces RGB synthesis


def test_cli_info(ply_file, capsys):
    assert main(["-i", ply_file, "--info"]) == 0
    out = capsys.readouterr().out
    assert "Points: 800" in out
    assert "Format Detected: 3DGS" in out
    assert "SH Headers" in out


def test_cli_full_conversion(tmp_path, ply_file, capsys):
    out = str(tmp_path / "converted.spz")
    rc = main(["-i", ply_file, "-o", out, "-f", "spz", "--min_opacity", "10", "--force"])
    assert rc == 0
    assert os.path.exists(out)
    d = get_handler("spz").read(out)
    assert d.n > 0


def test_cli_auto_output_and_noop_guard(tmp_path, capsys):
    c = make_cloud(100)
    src = str(tmp_path / "scene.ply")
    get_handler("3dgs").write(c, src)
    # no-op guard: ply -> 3dgs ply without filters aborts
    rc = main(["-i", src, "-f", "3dgs"])
    out = capsys.readouterr().out
    assert "aborted" in out
    # with a filter it proceeds and derives the suffixed output path
    rc = main(["-i", src, "-f", "3dgs", "--min_opacity", "5", "--force"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "scene_3dgs.ply"))


def test_cli_validation_errors(ply_file, capsys):
    assert main(["-i", ply_file, "-f", "splat", "--sor_intensity", "99"]) == 1
    assert main(["-i", ply_file, "-f", "splat", "--min_opacity", "300"]) == 1
    assert main(["-i", ply_file, "-f", "nope"]) == 1


def test_format_matrix_n_to_n(tmp_path, ply_file):
    """Every format readable after writing from every source (config 5 matrix,
    small N)."""
    formats = ["3dgs", "cc", "splat", "spz", "compressed_ply", "ksplat", "parquet"]
    src = ply_file
    for fmt in formats:
        out = str(tmp_path / f"m{get_handler(fmt).extension}")
        convert(src, out, fmt, force=True)
        d = get_handler(fmt).read(out)
        assert d.n == 800, fmt


def test_convert_batch_matches_standalone(tmp_path):
    """The batch fast path (one read+filter, N writes via write_processed)
    must be byte-identical to standalone convert() per format — including
    formats with tighter SH caps than the first one written."""
    from gsconverter_tpu.batch import convert_batch
    from gsconverter_tpu.converter import convert

    get_handler("3dgs").write(make_cloud(400, sh_degree=2, seed=9),
                              str(tmp_path / "s0.ply"))
    fmts = ["splat", "spz", "ksplat"]  # caps 0 / 3 / 2
    kw = dict(min_opacity=20, sor_intensity=4.0, force=True)
    convert_batch(str(tmp_path / "s0.ply"), str(tmp_path / "b"), fmts, **kw)
    for fmt in fmts:
        solo = str(tmp_path / f"solo_{fmt}{get_handler(fmt).extension}")
        convert(str(tmp_path / "s0.ply"), solo, fmt, **kw)
        batched = str(tmp_path / "b" /
                      f"s0_{fmt}{get_handler(fmt).extension}")
        assert open(solo, "rb").read() == open(batched, "rb").read(), fmt


@pytest.mark.parametrize("deg", [0, 3])
def test_convert_batch_byte_identity_matrix(tmp_path, deg):
    """Degree matrix hardening of the batch byte-identity claim
    (batch.py loosest-cap-first ordering): deg-0 and deg-3 sources x
    {splat, spz, sog, 3dgs} — every write_processed output byte-identical
    to a standalone run()."""
    from gsconverter_tpu.batch import convert_batch
    from gsconverter_tpu.converter import convert

    get_handler("3dgs").write(make_cloud(600, sh_degree=deg, seed=3 + deg),
                              str(tmp_path / "s0.ply"))
    fmts = ["splat", "spz", "sog", "3dgs"]  # caps 0 / 3 / 3 / 3
    kw = dict(min_opacity=10, force=True)
    convert_batch(str(tmp_path / "s0.ply"), str(tmp_path / "b"), fmts, **kw)
    for fmt in fmts:
        solo = str(tmp_path / f"solo_{fmt}{get_handler(fmt).extension}")
        convert(str(tmp_path / "s0.ply"), solo, fmt, **kw)
        batched = str(tmp_path / "b" /
                      f"s0_{fmt}{get_handler(fmt).extension}")
        assert open(solo, "rb").read() == open(batched, "rb").read(), (fmt, deg)


def test_convert_batch_job_fallback_when_few_scenes(tmp_path):
    """With fewer scenes than processes the distribution unit falls back to
    per-(scene, format) jobs so every process contributes (ADVICE r3)."""
    from gsconverter_tpu.batch import convert_batch

    get_handler("3dgs").write(make_cloud(200, sh_degree=1, seed=1),
                              str(tmp_path / "s0.ply"))
    a = convert_batch(str(tmp_path / "s*.ply"), str(tmp_path / "o"),
                      ["splat", "spz", "ksplat"], process_index=0,
                      process_count=2, force=True)
    b = convert_batch(str(tmp_path / "s*.ply"), str(tmp_path / "o"),
                      ["splat", "spz", "ksplat"], process_index=1,
                      process_count=2, force=True)
    assert len(a) > 0 and len(b) > 0  # both processes busy
    assert len(a) + len(b) == 3
    assert not (set(x[2] for x in a) & set(x[2] for x in b))


def test_convert_batch_matrix(tmp_path):
    """batch.py N-to-N matrix (BASELINE config 5 single-process slice)."""
    import jax.numpy as jnp

    from gsconverter_tpu.batch import convert_batch
    from gsconverter_tpu.formats import get_handler
    from tests.conftest import make_cloud

    for i in range(3):
        get_handler("3dgs").write(
            make_cloud(500, sh_degree=1, seed=i), str(tmp_path / f"s{i}.ply")
        )
    done = convert_batch(
        str(tmp_path / "s*.ply"), str(tmp_path / "out"), ["splat", "spz"],
        force=True,
    )
    assert len(done) == 6
    for src, fmt, out in done:
        d = get_handler(fmt).read(out)
        assert d.n == 500


def test_convert_batch_round_robin(tmp_path):
    """Multi-process round-robin partitions the job list disjointly."""
    from gsconverter_tpu.batch import convert_batch
    from gsconverter_tpu.formats import get_handler
    from tests.conftest import make_cloud

    for i in range(2):
        get_handler("3dgs").write(
            make_cloud(300, sh_degree=0, seed=i), str(tmp_path / f"s{i}.ply")
        )
    a = convert_batch(str(tmp_path / "s*.ply"), str(tmp_path / "out"),
                      ["splat", "spz"], process_index=0, process_count=2,
                      force=True)
    b = convert_batch(str(tmp_path / "s*.ply"), str(tmp_path / "out"),
                      ["splat", "spz"], process_index=1, process_count=2,
                      force=True)
    assert len(a) == 2 and len(b) == 2
    assert not (set(x[2] for x in a) & set(x[2] for x in b))
