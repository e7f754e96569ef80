"""Mosaic gather-capability probes for the hierarchical traversal kernel.

Measures, on the real TPU, the per-iteration cost of the candidate per-lane
gather strategies inside a Pallas fori_loop (loop count is a runtime scalar so
each probe is a single compile):

  g1  axis-1 take_along_axis on (8,128)            [lane gather]
  g0  axis-0 take_along_axis on (8,128)            [sublane gather]
  arb 1024-entry arbitrary gather: 8 row-broadcasts + axis-1 gather + select
  arb4k 4096-entry arbitrary gather: 4x 'arb' + 4-way select
  vref  dynamic row read from a large VMEM ref per sublane (scalar loop)
  onehot  one-hot MXU gather of 16 words from a [4096,16] pool for 1024 lanes

Timing: host-pull round trip (block_until_ready does not block through the
axon tunnel; see notes/PERF.md).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.device_get(out))  # sync
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.device_get(out))
    return time.perf_counter() - t0


def rate(fn, args_lo, args_hi, n_lo, n_hi):
    tlo = timed(fn, *args_lo)
    thi = timed(fn, *args_hi)
    return (thi - tlo) / (n_hi - n_lo), tlo, thi


I32 = jnp.int32


def probe(name, body_fn, extra_inputs=()):
    """body_fn(carry_idx (8,128) i32, extras) -> (8,128) i32 contribution."""

    def kernel(n_ref, *refs):
        extras = [r[:] for r in refs[:-1]]
        out_ref = refs[-1]
        n = n_ref[0]

        def body(i, c):
            idx, acc = c
            v = body_fn(idx, extras)
            idx = (idx * 1103515245 + 12345 + v) & 1023
            return idx, acc + v

        idx0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 7 & 1023
        _, acc = jax.lax.fori_loop(0, n, body, (idx0, jnp.zeros((8, 128), I32)))
        out_ref[:] = acc

    @jax.jit
    def run(n, *extras):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extras),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        )(n, *extras)

    try:
        lo, hi = 32, 2048
        per, tlo, thi = rate(run, (jnp.asarray([lo], I32),) + extra_inputs,
                             (jnp.asarray([hi], I32),) + extra_inputs, lo, hi)
        print(f"{name:10s}  {per*1e9:9.1f} ns/iter   (lo {tlo*1e3:.2f} ms, hi {thi*1e3:.2f} ms)")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:10s}  FAILED: {msg}")


def main():
    print("devices:", jax.devices())
    tab = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)

    # g1: lane gather within each row
    probe("g1_axis1", lambda idx, ex: jnp.take_along_axis(ex[0], idx & 127, axis=1),
          (tab,))

    # g0: sublane gather within each lane
    probe("g0_axis0", lambda idx, ex: jnp.take_along_axis(ex[0], idx & 7, axis=0),
          (tab,))

    # arb: arbitrary 1024-entry gather from one (8,128) register
    def arb(idx, ex):
        t = ex[0]
        row, col = idx >> 7, idx & 127
        out = jnp.zeros_like(idx)
        for r in range(8):
            rowvals = jax.lax.broadcast_in_dim(t[r], (8, 128), (1,))
            g = jnp.take_along_axis(rowvals, col, axis=1)
            out = jnp.where(row == r, g, out)
        return out

    probe("arb1024", arb, (tab,))

    # arb4k: 4096-entry gather via 4 registers
    tab4 = jnp.arange(4 * 8 * 128, dtype=I32).reshape(4, 8, 128)

    def arb4k(idx, ex):
        idx4 = idx * 3 & 4095
        reg, rem = idx4 >> 10, idx4 & 1023
        outs = [arb(rem, (ex[0][k],)) for k in range(4)]
        return jnp.where(reg == 0, outs[0],
                         jnp.where(reg == 1, outs[1],
                                   jnp.where(reg == 2, outs[2], outs[3])))

    probe("arb4k", arb4k, (tab4,))

    # two-step: axis0 then axis1 composition check (correctness irrelevant,
    # cost = one g0 + one g1)
    probe("g0_plus_g1", lambda idx, ex: jnp.take_along_axis(
        jnp.take_along_axis(ex[0], idx & 7, axis=0), idx & 127, axis=1), (tab,))

    # onehot MXU gather: 1024 lanes fetch 16 words each from [4096,16] pool
    pool = jnp.arange(4096 * 16, dtype=jnp.float32).reshape(4096, 16)

    def onehot(idx, ex):
        slot = (idx.reshape(1024) * 5) & 4095
        oh = (slot[:, None] == jax.lax.broadcasted_iota(I32, (1024, 4096), 1))
        got = jnp.dot(oh.astype(jnp.float32), ex[0],
                      preferred_element_type=jnp.float32)  # [1024,16]
        return got.astype(I32).sum(axis=1).reshape(8, 128)

    probe("onehot4k", onehot, (pool,))

    # big-table take: does Mosaic lower a flat 16384-entry take?
    big = jnp.arange(16384, dtype=I32)
    probe("take16k", lambda idx, ex: jnp.take(ex[0], (idx * 11) & 16383).reshape(8, 128),
          (big,))

    # big-table 2D: table (128,128), arbitrary gather via take_along on axis0
    # with full-width index then axis1
    big2 = jnp.arange(128 * 128, dtype=I32).reshape(128, 128)

    def arb16k(idx, ex):
        i = (idx * 11) & 16383
        row, col = i >> 7, i & 127
        a = jnp.take_along_axis(ex[0], row, axis=0)  # (8,128) idx on (128,128)?
        return jnp.take_along_axis(a, col, axis=1)

    probe("arb16k_2d", arb16k, (big2,))


if __name__ == "__main__":
    main()
