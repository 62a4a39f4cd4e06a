"""Profile the 3DGS PLY read path at 1M splats (VERDICT r3 item 1a).

Host-only (no device dispatch): stage timings for file IO, header parse,
frombuffer, and each group extraction inside cloud_from_vertex_array.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gsconverter_tpu.cloud import SplatCloud
from gsconverter_tpu.formats import get_handler
from gsconverter_tpu.formats.ply_gs import cloud_from_vertex_array
from gsconverter_tpu.utils import ply as uply


def mint(path, n, seed=0):
    rr = np.random.default_rng(seed)
    quat = rr.normal(0, 1, (n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    rest = np.zeros((n, 3, 15), np.float32)
    rest[:, :, :8] = rr.normal(0, 0.1, (n, 3, 8))
    c = SplatCloud(
        pos=rr.normal(0, 2.0, (n, 3)).astype(np.float32),
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = tempfile.mkdtemp()
    src = os.path.join(d, "scene.ply")
    mint(src, n)
    size = os.path.getsize(src)
    print(f"file: {size/1e6:.0f} MB, n={n}")

    for it in range(3):
        marks = [("start", time.perf_counter())]

        with open(src, "rb") as f:
            specs, fmt, comments = uply.read_header(f)
            marks.append(("header", time.perf_counter()))
            body = f.read()
            marks.append(("read_body", time.perf_counter()))

        name, count, props = specs[0]
        dt = np.dtype([(p, "<" + uply._PLY_TO_NP[k[1]]) for p, k in props])
        arr = np.frombuffer(body, dtype=dt, count=count)
        marks.append(("frombuffer", time.perf_counter()))
        arr = np.ascontiguousarray(arr)
        marks.append(("ascontig", time.perf_counter()))

        cloud = cloud_from_vertex_array(arr)
        marks.append(("to_cloud", time.perf_counter()))

        # whole-path comparison
        t0 = time.perf_counter()
        c2 = get_handler("3dgs").read(src)
        full = time.perf_counter() - t0

        out = " ".join(
            f"{nm}={1e3*(t1-t0):.0f}ms"
            for (nm, t0), (_, t1) in zip(marks, marks[1:])
            for nm in [marks[marks.index((nm, t0)) + 1][0]]
        ) if False else " ".join(
            f"{b[0]}={1e3*(b[1]-a[1]):.0f}ms" for a, b in zip(marks, marks[1:])
        )
        print(f"iter{it}: {out}  | handler.read total={full*1e3:.0f}ms "
              f"({size/full/1e9:.2f} GB/s)")


if __name__ == "__main__":
    main()
