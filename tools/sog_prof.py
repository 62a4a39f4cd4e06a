"""SOG write stage profile at scale — real TPU.

Mints the bench SOG scene (BASELINE config 3) and times the full convert
at levels 1 and 10 with --timing so the per-stage sog marks land on
stderr.  Verifies the round-5 overlap restructure (device palette fit
dispatched before the host texture/codebook stages).

Usage: python tools/sog_prof.py [n]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from gsconverter_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from gsconverter_tpu import config
from gsconverter_tpu.converter import convert
from tools.e2e_prof import mint_scene


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    config.TIMING = True
    d = tempfile.mkdtemp()
    src = os.path.join(d, "scene.ply")
    mint_scene(src, n, flyers=0.0)
    for level in (1, 10):
        for rnd in ("warm", "timed1", "timed2"):
            t0 = time.perf_counter()
            convert(src, os.path.join(d, f"{rnd}.sog"), "sog",
                    compression_level=level, force=True)
            dt = time.perf_counter() - t0
            print(f"[level {level} {rnd}] {dt:.2f}s -> {n / dt / 1e6:.2f} "
                  "Msplats/s", flush=True)
    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
