"""Diagnose the pallas_brick aux-bench drift (VERDICT r4 item 4).

pallas/brick.py changed only in round 1 (git: 58f8e3c, 5d026ab), yet the
aux number went 24.1 (r1) -> 21.0 (r2) -> 14.9 (r4).  Hypothesis: the
kernel is ~100 ms per 2M-ray call, and the bench's per-call host sync
(`int(np.asarray(hit).sum())`) adds tunnel round-trip jitter of the same
order — the "regression" is measurement, not kernel drift.

Measures, on today's hardware:
  A. the bench's exact methodology (per-call sync, min of 3);
  B. pipelined: K back-to-back calls, one sync, min of 3 groups —
     amortizes the tunnel round trip to ~1/K per call.

Run: PYTHONPATH=/root/repo:/root/.axon_site python notes/probe_brick_regress.py
"""

import time

import numpy as np


def main():
    import jax.numpy as jnp

    from brickmap_tpu import bits
    from brickmap_tpu.pallas.brick import trace_single_brick

    rng = np.random.default_rng(0)
    dense = rng.random((8, 8, 8)) < 0.12
    words = jnp.asarray(np.asarray(
        bits.brick_words_from_dense(dense[None])[0], np.uint32))
    n = 1 << 21
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    start = np.array([4.0, 4.0, 4.0]) - dirs * 20
    with np.errstate(divide="ignore"):
        tenter = np.minimum((0.0 - start) / dirs,
                            (8.0 - start) / dirs).max(1) + 1e-3
    origins = (start + dirs * tenter[:, None]).astype(np.float32)
    o, d = jnp.asarray(origins), jnp.asarray(dirs)

    r = trace_single_brick(o, d, words)
    int(np.asarray(r["hit"]).sum())          # warm compile + pipeline

    # A: bench methodology (per-call sync).
    best_a = 1e9
    times_a = []
    for rep in range(6):
        o2 = o + rep * 1e-5
        t0 = time.perf_counter()
        r = trace_single_brick(o2, d, words)
        int(np.asarray(r["hit"]).sum())
        dt = time.perf_counter() - t0
        times_a.append(dt)
        best_a = min(best_a, dt)
    print(f"A per-call sync: times {[f'{t*1e3:.0f}' for t in times_a]} ms"
          f" -> best {n / best_a / 1e6:.1f} Mrays/s")

    # B: pipelined K calls, one sync.
    K = 8
    best_b = 1e9
    times_b = []
    for rep in range(3):
        t0 = time.perf_counter()
        acc = None
        for k in range(K):
            r = trace_single_brick(o + (rep * K + k) * 1e-6, d, words)
            a = r["hit"].astype(jnp.int32).sum()
            acc = a if acc is None else acc + a
        int(np.asarray(acc))
        dt = time.perf_counter() - t0
        times_b.append(dt / K)
        best_b = min(best_b, dt / K)
    print(f"B pipelined x{K}: per-call {[f'{t*1e3:.0f}' for t in times_b]} ms"
          f" -> best {n / best_b / 1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
