"""Performance sweep on the real TPU -> PERF.md.

Runs each workload in an isolated subprocess (device faults can't kill the
sweep) and records steady-state throughput.  Run when the device is healthy:
    python tools/perf_report.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time, json
from gsconverter_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp

spec = json.loads(sys.argv[1])
kind = spec["kind"]
r = np.random.default_rng(0)

if kind == "sor":
    from gsconverter_tpu.ops.sor import sor_mask
    n = spec["n"]
    pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
    f = lambda: jax.block_until_ready(
        sor_mask(pos, k=spec.get("k", 25), sigma=10.5, approx=spec.get("approx", False)))
    items = n
elif kind == "kmeans":
    from gsconverter_tpu.ops import kmeans as km
    n, d, k = spec["n"], spec["d"], spec["k"]
    x = jnp.asarray(r.normal(0, 1.0, (n, d)).astype(np.float32))
    impl = spec.get("impl", "auto")
    f = lambda: jax.block_until_ready(km.kmeans(x, k, max_iter=10, impl=impl)[1])
    items = n * 10
elif kind == "density":
    from gsconverter_tpu.ops.density import density_mask
    n = spec["n"]
    pos = jnp.asarray((r.normal(0, 3.0, (n, 3))).astype(np.float32))
    f = lambda: jax.block_until_ready(density_mask(pos, 1.0, 0.32))
    items = n
elif kind == "render":
    from gsconverter_tpu.render import Camera, render
    from tests.conftest import make_cloud  # synthetic scene helper
    n = spec["n"]
    c = make_cloud(n, sh_degree=2)
    c = c.replace(pos=c.pos * 0.5,
                  log_scale=jnp.clip(c.log_scale, -5.0, -2.5),
                  opacity=jnp.clip(c.opacity, -3.0, 3.0))
    cam = Camera.look_at(eye=(0, 0, -6), target=(0, 0, 0),
                         width=spec.get("w", 512), height=spec.get("h", 512))
    f = lambda: jax.block_until_ready(
        render(c, cam, max_per_tile=spec.get("m", 256),
               binning=spec.get("binning", "windowed")))
    items = spec.get("w", 512) * spec.get("h", 512)  # pixels
elif kind == "quant_spz":
    from gsconverter_tpu.formats.spz import _encode_core
    n = spec["n"]
    pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
    op = jnp.asarray(r.normal(0, 2.0, (n,)).astype(np.float32))
    dc = jnp.asarray(r.normal(0, 0.5, (n, 3)).astype(np.float32))
    ls = jnp.asarray(r.normal(-4, 0.5, (n, 3)).astype(np.float32))
    q = jnp.asarray(r.normal(0, 1, (n, 4)).astype(np.float32))
    f = lambda: jax.block_until_ready(_encode_core(pos, op, dc, ls, q))
    items = n
else:
    raise SystemExit("unknown kind")

f()
t0 = time.perf_counter(); iters = 3
for _ in range(iters):
    f()
dt = (time.perf_counter() - t0) / iters
print(json.dumps({"ms": dt * 1e3, "mitems_s": items / dt / 1e6}))
"""

SWEEP = [
    ("SOR exact, 256k", dict(kind="sor", n=262_144)),
    ("SOR approx_max_k, 256k", dict(kind="sor", n=262_144, approx=True)),
    ("SOR exact, 1M", dict(kind="sor", n=1_048_576)),
    ("K-Means MXU/Pallas D=24 K=1024, 256k", dict(kind="kmeans", n=262_144, d=24, k=1024, impl="pallas")),
    ("K-Means XLA D=24 K=1024, 256k", dict(kind="kmeans", n=262_144, d=24, k=1024, impl="xla")),
    ("K-Means scalar D=1 K=256, 1M", dict(kind="kmeans", n=1_048_576, d=1, k=256)),
    ("Density filter, 1M", dict(kind="density", n=1_048_576)),
    ("Render 512x512, 100k splats (windowed)", dict(kind="render", n=100_000)),
    ("Render 512x512, 100k splats (exact)", dict(kind="render", n=100_000, binning="exact")),
    ("SPZ quantize core, 1M", dict(kind="quant_spz", n=1_048_576)),
]


def main():
    rows = []
    for name, spec in SWEEP:
        try:
            out = subprocess.run(
                [sys.executable, "-c", CHILD, json.dumps(spec)],
                capture_output=True, text=True, timeout=1800, cwd=ROOT,
            )
            res = None
            for line in out.stdout.strip().splitlines()[::-1]:
                if line.startswith("{"):
                    res = json.loads(line)
                    break
            if res:
                rows.append((name, res["ms"], res["mitems_s"]))
                print(f"{name}: {res['ms']:.1f} ms, {res['mitems_s']:.1f} M/s", flush=True)
            else:
                rows.append((name, None, None))
                print(f"{name}: FAILED\n{out.stderr.strip()[-300:]}", flush=True)
        except subprocess.TimeoutExpired:
            rows.append((name, None, None))
            print(f"{name}: TIMEOUT", flush=True)

    with open(os.path.join(ROOT, "PERF.md"), "w") as f:
        f.write("# Performance (steady-state, single TPU v5e chip)\n\n")
        f.write(f"Generated {time.strftime('%Y-%m-%d %H:%M')} by tools/perf_report.py.\n\n")
        f.write("| workload | ms/call | M items/s |\n|---|---|---|\n")
        for name, ms, rate in rows:
            if ms is None:
                f.write(f"| {name} | fault/timeout | — |\n")
            else:
                f.write(f"| {name} | {ms:.1f} | {rate:.1f} |\n")
    print("wrote PERF.md")


if __name__ == "__main__":
    main()
