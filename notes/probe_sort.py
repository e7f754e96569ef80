"""Cost of live-first compaction at wave scale (4.2M lanes) on the TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

N = 2 * 2073600

rng = np.random.default_rng(0)
live = jnp.asarray(rng.random(N) < 0.03)
o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))


@jax.jit
def compact_roundtrip(live, o, d):
    order = jnp.argsort(jnp.where(live, 0, 1), stable=True)
    inv = jnp.argsort(order)
    oc = jnp.take(o, order, axis=0)
    dc = jnp.take(d, order, axis=0)
    # pretend 6 output columns scattered back
    outs = [jnp.take(oc[:, k % 3] + dc[:, k % 3], inv, axis=0)
            for k in range(6)]
    return sum(outs)


out = compact_roundtrip(live, o, d)
float(np.asarray(out)[0])
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = compact_roundtrip(live, o, d)
    float(np.asarray(out)[0])
    best = min(best, time.perf_counter() - t0)
print(f"compact roundtrip {N} lanes: {best*1e3:.1f} ms")
