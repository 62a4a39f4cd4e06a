import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from gsconverter_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp
from gsconverter_tpu.ops import sor
from gsconverter_tpu.ops.padding import PAD_POS, pad_rows, next_pow2

def sync(x): return float(jnp.sum(jnp.asarray(x, jnp.float32)[:8]))

n = 4_194_304
r = np.random.default_rng(0)
pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
p = next_pow2(n)
posp = pad_rows(pos, p, PAD_POS)
valid = jnp.arange(p) < n
print("setup done", flush=True)

t0 = time.perf_counter()
order, spos, svalid = sor._sor_window_bin(posp, valid)
sync(spos)
print(f"bin compile+run {time.perf_counter()-t0:.1f}s", flush=True)

def t(f, label):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r0 = f(); sync(r0); ts.append(time.perf_counter()-t0)
    print(f"{label}: {min(ts)*1e3:.0f} ms", flush=True)

t(lambda: sor._sor_window_bin(posp, valid)[1], "bin (morton argsort+gather)")
t0 = time.perf_counter()
md = sor._sor_window_loop_pallas(spos, 25, 512, 512); sync(md)
print(f"pallas loop compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t(lambda: sor._sor_window_loop_pallas(spos, 25, 512, 512), "pallas loop (w512 b512 i10)")
sc = jax.jit(lambda o, m: jnp.zeros(p, jnp.float32).at[o].set(m))
t0 = time.perf_counter(); sync(sc(order, md))
print(f"scatter compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t(lambda: sc(order, md), "scatter back")
