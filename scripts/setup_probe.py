"""Isolate bench-setup costs: pure put vs first compiled op vs D2H pull."""
import os, time, sys
import numpy as np
os.environ.setdefault("JAX_LOCAL_CACHE", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
t0 = time.time()
dev = jax.devices()[0]
print(f"backend init: {time.time()-t0:.3f}s {dev}", file=sys.stderr)

# 1. pure transfers, no compiled ops
for mb, n in [(4, 1<<20), (16, 1<<22)]:
    a = np.arange(n, dtype=np.int32)
    t0 = time.time()
    x = jax.device_put(a, dev); x.block_until_ready()
    print(f"pure put {mb}MB: {time.time()-t0:.3f}s", file=sys.stderr)

# 2. D2H pull
t0 = time.time(); b = np.asarray(x); print(f"pull 16MB: {time.time()-t0:.3f}s", file=sys.stderr)

# 3. first compiled op (tiny)
t0 = time.time(); y = (x[:2] + 1); np.asarray(y)
print(f"first tiny compiled op: {time.time()-t0:.3f}s", file=sys.stderr)
t0 = time.time(); y = (x[:4] + 1); np.asarray(y)
print(f"second tiny compiled op (new shape): {time.time()-t0:.3f}s", file=sys.stderr)
