import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from gsconverter_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp

def sync(x):
    x = x[0] if isinstance(x, tuple) else x
    return float(jnp.sum(jnp.asarray(x[:8], jnp.float32)))

n = 4_194_304
r = np.random.default_rng(0)
key = jnp.asarray(r.integers(0, 2**31, n, dtype=np.int32))
ku = jnp.asarray(r.integers(0, 2**32, n, dtype=np.uint32))
pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
idx = jnp.arange(n, dtype=jnp.int32)
md = jnp.asarray(r.normal(1, 0.1, n).astype(np.float32))
print("setup done", flush=True)

def t(f, label, *a):
    sync(f(*a))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r0 = f(*a); sync(r0); ts.append(time.perf_counter()-t0)
    print(f"{label}: {min(ts)*1e3:.0f} ms", flush=True)

s2 = jax.jit(lambda k, i: jax.lax.sort((k, i), num_keys=1))
t(s2, "sort2 (key,iota)", key, idx)
s5 = jax.jit(lambda k, x, i: jax.lax.sort((k, x[:,0], x[:,1], x[:,2], i), num_keys=1))
t(s5, "sort5 (key,x,y,z,idx)", key, pos, idx)
g = jax.jit(lambda p, o: p[o])
order = s2(key, idx)[1]
t(g, "gather pos[order]", pos, order)
sc = jax.jit(lambda o, m: jnp.zeros(n, jnp.float32).at[o].set(m))
t(sc, "scatter md.at[order]", order, md)
us = jax.jit(lambda i, m: jax.lax.sort((i, m), num_keys=1)[1])
t(us, "unsort via sort2(idx,md)", order, md)
au = jax.jit(lambda k: jnp.argsort(k))
t(au, "argsort u32", ku)
