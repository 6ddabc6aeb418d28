"""Quick tunnel healthcheck: devices + tiny chained matmul, prints timings."""
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
import numpy as np
print(f"[{time.time()-t0:.1f}s] jax imported", flush=True)
d = jax.devices()
print(f"[{time.time()-t0:.1f}s] devices: {d}", flush=True)
x = jnp.ones((256, 256), jnp.float32)
f = jax.jit(lambda a: a @ a + 1.0)
y = f(x)
print(f"[{time.time()-t0:.1f}s] dispatched", flush=True)
y = f(y)
v = np.asarray(y)[0, 0]
print(f"[{time.time()-t0:.1f}s] materialized v={v}", flush=True)
