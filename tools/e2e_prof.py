"""End-to-end pipeline stage profile at scale — runs on the real TPU.

Mints the bench e2e scene (BASELINE config 2) at the requested N and runs
the full convert twice (warm, timed) with --timing so the per-stage table
lands on stderr.  Source of the 10M stage table in PERFORMANCE.md
(VERDICT r4 item 3).

Usage: python tools/e2e_prof.py [n] [fmt ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from gsconverter_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from gsconverter_tpu import config
from gsconverter_tpu.cloud import SplatCloud
from gsconverter_tpu.converter import convert
from gsconverter_tpu.formats import get_handler


def mint_scene(path, n, seed=0, flyers=0.002):
    rr = np.random.default_rng(seed)
    nf = int(n * flyers)
    pos = np.concatenate([
        rr.normal(0, 2.0, (n - nf, 3)), rr.normal(0, 2.0, (nf, 3)) + 80.0,
    ]).astype(np.float32)
    quat = rr.normal(0, 1, (n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    rest = np.zeros((n, 3, 15), np.float32)
    rest[:, :, :8] = rr.normal(0, 0.1, (n, 3, 8))
    c = SplatCloud(
        pos=pos,
        sh_dc=rr.normal(0, 0.5, (n, 3)).astype(np.float32),
        sh_rest=rest,
        opacity=rr.normal(1, 2, (n,)).astype(np.float32),
        log_scale=rr.normal(-4, 0.5, (n, 3)).astype(np.float32),
        quat=quat,
        normal=np.zeros((n, 3), np.float32),
        active_sh_degree=2,
    )
    get_handler("3dgs").write(c, path)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    fmts = sys.argv[2:] or ["splat", "ksplat"]
    config.TIMING = True
    d = tempfile.mkdtemp()
    src = os.path.join(d, "scene.ply")
    t0 = time.perf_counter()
    mint_scene(src, n)
    # drain the scene writeback: this box throttles writers to ~30 MB/s
    # once ~1 GB of dirty pages accumulate (bench.py dirty-cliff note)
    os.sync()
    print(f"mint+sync {n}: {time.perf_counter() - t0:.1f}s", flush=True)
    kw = dict(bbox=(-60, -60, -60, 60, 60, 60), min_opacity=5,
              sor_intensity=4, density_sensitivity=0.5, force=True)
    for rnd in ("warm", "timed1", "timed2"):
        if rnd != "warm":
            os.sync()
            time.sleep(12)  # refill the disk's burst bucket (bench.py note)
        tot = 0.0
        for fmt in fmts:
            t0 = time.perf_counter()
            convert(src, os.path.join(d, f"{rnd}.{fmt}"), fmt, **kw)
            dt = time.perf_counter() - t0
            tot += dt
            # unlink before writeback competes with the next run
            os.unlink(os.path.join(d, f"{rnd}.{fmt}"))
            print(f"[{rnd}] {fmt}: {dt:.2f}s", flush=True)
        print(f"[{rnd}] total {tot:.2f}s -> "
              f"{len(fmts) * n / tot / 1e6:.2f} Msplats/s", flush=True)
    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
