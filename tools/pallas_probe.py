import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
from gsconverter_tpu.ops.sor import _sor_window_loop_pallas, _sor_window_bin
from gsconverter_tpu.ops.padding import PAD_POS, pad_rows

n = 65536
r = np.random.default_rng(0)
pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
valid = jnp.ones(n, bool)
_, spos, _ = _sor_window_bin(pos, valid)
t0 = time.perf_counter()
md = _sor_window_loop_pallas(spos, 25, 512, 512)
print("ok", float(jnp.sum(md)), f"{time.perf_counter()-t0:.1f}s", flush=True)
