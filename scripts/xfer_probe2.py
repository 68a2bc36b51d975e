"""Measure host->device put throughput/latency on the live backend."""
import os, time, sys
import numpy as np
os.environ.setdefault("JAX_LOCAL_CACHE", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
dev = jax.devices()[0]
print("device:", dev, file=sys.stderr)
for size in [1 << 16, 1 << 20, 1 << 22, 1 << 24]:
    a = np.arange(size, dtype=np.int32)
    t0 = time.time()
    x = jnp.asarray(a)
    np.asarray(x[:1])
    dt = time.time() - t0
    print(f"put {size*4/1e6:.1f} MB: {dt:.3f}s = {size*4/dt/1e6:.1f} MB/s",
          file=sys.stderr)
# device_put with donate / direct
from jax import device_put
a = np.arange(1 << 24, dtype=np.int32)
t0 = time.time(); x = device_put(a, dev); x.block_until_ready()
np.asarray(x[:1])
print(f"device_put 67MB: {time.time()-t0:.3f}s", file=sys.stderr)
