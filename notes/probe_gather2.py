"""Probe round 2: precise per-op costs for the paged hierarchical kernel.

Methodology: runtime loop count in SMEM (one compile per probe), rate from
(t(64k iters) - t(1k iters)) / 63k, min of 3 timings each, host-pull sync.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32


def timed_min(fn, args, reps=3):
    out = fn(*args)
    np.asarray(jax.device_get(out))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(out))
        best = min(best, time.perf_counter() - t0)
    return best


def probe(name, make_kernel, extra_inputs=(), out_sd=None, lo=1024, hi=65536):
    """make_kernel returns kernel(n_ref, *extra_refs, out_ref)."""
    out_sd = out_sd or jax.ShapeDtypeStruct((8, 128), I32)
    kernel = make_kernel()

    @jax.jit
    def run(n, *extras):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extras),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_sd,
        )(n, *extras)

    try:
        tlo = timed_min(run, (jnp.asarray([lo], I32),) + extra_inputs)
        thi = timed_min(run, (jnp.asarray([hi], I32),) + extra_inputs)
        per = (thi - tlo) / (hi - lo)
        print(f"{name:22s} {per*1e9:9.1f} ns/iter  (lo {tlo*1e3:8.2f} ms, hi {thi*1e3:8.2f} ms)")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name:22s} FAILED: {msg}")


def loop_kernel(body_fn, n_extras):
    """Standard: carry idx (8,128), accumulate contributions."""
    def kernel(n_ref, *refs):
        extras = refs[:n_extras]
        out_ref = refs[-1]

        def body(i, c):
            idx, acc = c
            v = body_fn(idx, extras, i)
            idx = (idx * 1103515245 + 12345 + v) & 0x7FFFFFFF
            return idx, acc + v

        idx0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 7
        _, acc = jax.lax.fori_loop(
            0, n_ref[0], body, (idx0, jnp.zeros((8, 128), I32)))
        out_ref[:] = acc
    return kernel


def main():
    print("devices:", jax.devices())
    tab = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)

    def vmem_extra(shape, dtype=I32):
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    # -- baseline: ~16 elementwise VPU ops, no gather
    probe("ew16", lambda: loop_kernel(
        lambda idx, ex, i: ((idx * 3 + 7) ^ (idx >> 2)) + ((idx * 5) & 63)
        - ((idx << 1) & 255) + (idx % 31), 0))

    # -- g1: lane gather (8,128) same-shape
    probe("g1_axis1", lambda: loop_kernel(
        lambda idx, ex, i: jnp.take_along_axis(ex[0][:], idx & 127, axis=1), 1),
        (tab,))

    # -- g0: sublane gather (8,128) same-shape
    probe("g0_axis0", lambda: loop_kernel(
        lambda idx, ex, i: jnp.take_along_axis(ex[0][:], idx & 7, axis=0), 1),
        (tab,))

    # -- arb1024: 8 row-broadcasts + g1 + select
    def arb(idx, t):
        row, col = (idx >> 7) & 7, idx & 127
        out = jnp.zeros_like(idx)
        for r in range(8):
            rowvals = jax.lax.broadcast_in_dim(t[r], (8, 128), (1,))
            g = jnp.take_along_axis(rowvals, col, axis=1)
            out = jnp.where(row == r, g, out)
        return out

    probe("arb1024", lambda: loop_kernel(
        lambda idx, ex, i: arb(idx, ex[0][:]), 1), (tab,))

    # -- bitrow: broadcast 1 row (128 words) + g1 + bit extract
    # (the in-page occupancy test)
    def bitrow_test(idx, t):
        cell = idx & 4095
        row = jax.lax.broadcast_in_dim(t[0], (8, 128), (1,))
        w = jnp.take_along_axis(row, (cell >> 5) & 127, axis=1)
        return (w >> (cell & 31)) & 1

    probe("bitrow", lambda: loop_kernel(
        lambda idx, ex, i: bitrow_test(idx, ex[0][:]), 1), (tab,))

    # -- ew at (128,128): is the bigger shape fine?
    def kernel128(n_ref, out_ref):
        def body(i, c):
            idx, acc = c
            v = ((idx * 3 + 7) ^ (idx >> 2)) + ((idx * 5) & 63)
            idx = (idx * 1103515245 + 12345 + v) & 0x7FFFFFFF
            return idx, acc + v
        idx0 = jax.lax.broadcasted_iota(I32, (128, 128), 1) * 7
        _, acc = jax.lax.fori_loop(0, n_ref[0], body,
                                   (idx0, jnp.zeros((128, 128), I32)))
        out_ref[:] = acc

    @jax.jit
    def run128(n):
        return pl.pallas_call(
            kernel128,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), I32),
        )(n)

    try:
        tlo = timed_min(run128, (jnp.asarray([1024], I32),))
        thi = timed_min(run128, (jnp.asarray([65536], I32),))
        print(f"{'ew16_128x128':22s} {(thi-tlo)/64512*1e9:9.1f} ns/iter  (x16 rays)")
    except Exception as e:
        print(f"{'ew16_128x128':22s} FAILED: {str(e)[:120]}")

    # -- g1 at (128,128) same-shape
    tab128 = jnp.arange(128 * 128, dtype=I32).reshape(128, 128)

    def kernel_g1_128(n_ref, t_ref, out_ref):
        def body(i, c):
            idx, acc = c
            v = jnp.take_along_axis(t_ref[:], idx & 127, axis=1)
            idx = (idx * 1103515245 + 12345 + v) & 0x7FFFFFFF
            return idx, acc + v
        idx0 = jax.lax.broadcasted_iota(I32, (128, 128), 1) * 7
        _, acc = jax.lax.fori_loop(0, n_ref[0], body,
                                   (idx0, jnp.zeros((128, 128), I32)))
        out_ref[:] = acc

    @jax.jit
    def run_g1_128(n, t):
        return pl.pallas_call(
            kernel_g1_128,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), I32),
        )(n, t)

    try:
        tlo = timed_min(run_g1_128, (jnp.asarray([1024], I32), tab128))
        thi = timed_min(run_g1_128, (jnp.asarray([65536], I32), tab128))
        print(f"{'g1_axis1_128x128':22s} {(thi-tlo)/64512*1e9:9.1f} ns/iter  (x16 rays)")
    except Exception as e:
        print(f"{'g1_axis1_128x128':22s} FAILED: {str(e)[:120]}")

    # -- dynamic VMEM row read: page row from a [128,128] table by scalar idx
    def rowread(idx, ex, i):
        pg = jnp.min(idx) & 127
        row = ex[0][pl.ds(pg, 1), :]  # (1,128)
        return jax.lax.broadcast_in_dim(row[0], (8, 128), (1,)).astype(I32)

    probe("vmem_rowread", lambda: loop_kernel(rowread, 1), (tab128,))

    # -- onehot matmul: [128,4096]@[4096,32] chunked over 8 ray groups
    pool = jnp.ones((4096, 32), F32)

    def onehot_chunk(idx, ex, i):
        slot = idx & 4095
        total = jnp.zeros((8, 128), F32)
        for g in range(1):  # ONE [8x128 -> reshaped 128-col] chunk at a time
            s = slot.reshape(1024)[:128].reshape(128, 1)
            oh = (s == jax.lax.broadcasted_iota(I32, (128, 4096), 1)).astype(F32)
            got = jnp.dot(oh, ex[0][:], preferred_element_type=F32)  # [128,32]
            total += got.sum(axis=1).reshape(1, 128)
        return total.astype(I32)

    probe("onehot128x4096", lambda: loop_kernel(onehot_chunk, 1), (pool,),
          lo=256, hi=8192)

    # -- factored onehot: A[128,64] (x) B[128,64] two-stage
    pool3 = jnp.ones((64, 64 * 32), F32)

    def factored(idx, ex, i):
        slot = idx & 4095
        s = slot.reshape(1024)[:128]
        hi_, lo_ = (s >> 6).reshape(128, 1), (s & 63).reshape(128, 1)
        A = (hi_ == jax.lax.broadcasted_iota(I32, (128, 64), 1)).astype(F32)
        B = (lo_ == jax.lax.broadcasted_iota(I32, (128, 64), 1)).astype(F32)
        D = jnp.dot(B, ex[0][:], preferred_element_type=F32)  # [128, 2048]
        D3 = D.reshape(128, 64, 32)
        out = jnp.einsum("rh,rhw->rw", A, D3)  # [128, 32]
        return out.sum(axis=1).reshape(1, 128).astype(I32) + jnp.zeros((8, 128), I32)

    probe("factored_onehot", lambda: loop_kernel(factored, 1), (pool3,),
          lo=256, hi=8192)

    # -- lax.cond on a scalar reduction (skip-when-none pattern)
    def cond_skip(idx, ex, i):
        any_desc = jnp.sum(idx & 1) > 100000  # usually false
        return jax.lax.cond(
            any_desc,
            lambda: jnp.take_along_axis(ex[0][:], idx & 127, axis=1) * 2,
            lambda: jnp.zeros((8, 128), I32))

    probe("cond_skip", lambda: loop_kernel(cond_skip, 1), (tab,))

    # -- HBM->VMEM DMA of a dynamic 512KB row slice inside the loop
    big = jnp.ones((64, 4096, 32), F32)  # 64 pages x 512KB

    def dma_kernel(n_ref, hbm_ref, out_ref):
        def run(scratch, sem):
            def body(i, c):
                idx, acc = c
                pg = jnp.min(idx) & 63
                cp = pltpu.make_async_copy(hbm_ref.at[pg], scratch, sem)
                cp.start()
                cp.wait()
                acc = acc + scratch[0, 0].astype(I32)
                idx = (idx * 1103515245 + 12345) & 0x7FFFFFFF
                return idx, acc
            idx0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 7
            _, acc = jax.lax.fori_loop(0, n_ref[0], body,
                                       (idx0, jnp.zeros((8, 128), I32)))
            out_ref[:] = acc
        pl.run_scoped(run, scratch=pltpu.VMEM((4096, 32), F32),
                      sem=pltpu.SemaphoreType.DMA(()))

    @jax.jit
    def run_dma(n, b):
        return pl.pallas_call(
            dma_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        )(n, b)

    try:
        tlo = timed_min(run_dma, (jnp.asarray([64], I32), big))
        thi = timed_min(run_dma, (jnp.asarray([2048], I32), big))
        print(f"{'dma512k_dynrow':22s} {(thi-tlo)/1984*1e9:9.1f} ns/iter  (lo {tlo*1e3:.2f} hi {thi*1e3:.2f} ms)")
    except Exception as e:
        print(f"{'dma512k_dynrow':22s} FAILED: {str(e)[:160]}")


if __name__ == "__main__":
    main()
