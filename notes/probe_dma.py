"""Probe round 3: HBM DMA variants + remaining kernel building blocks."""
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


def report(name, fn, args_lo, args_hi, n_lo, n_hi):
    try:
        tlo = timed_min(fn, args_lo)
        thi = timed_min(fn, args_hi)
        per = (thi - tlo) / (n_hi - n_lo)
        print(f"{name:22s} {per*1e9:9.1f} ns/iter  (lo {tlo*1e3:8.2f} ms, hi {thi*1e3:8.2f} ms)")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name:22s} FAILED: {msg}")


def main():
    print("devices:", jax.devices())

    # ---- DMA variant A: scratch_shapes + explicit sem, full-row copy -------
    big = jnp.ones((64, 4096, 32), F32)

    def dmaA_kernel(n_ref, hbm_ref, out_ref, scratch, sem):
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

    @jax.jit
    def runA(n, b):
        return pl.pallas_call(
            dmaA_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((4096, 32), F32),
                            pltpu.SemaphoreType.DMA],
        )(n, b)

    report("dmaA_512k", runA, (jnp.asarray([64], I32), big),
           (jnp.asarray([1024], I32), big), 64, 1024)

    # ---- DMA variant B: pl.ds slice of rows on a 2D HBM array --------------
    big2 = jnp.ones((64 * 4096, 32), F32)

    def dmaB_kernel(n_ref, hbm_ref, out_ref, scratch, sem):
        def body(i, c):
            idx, acc = c
            pg = jnp.min(idx) & 63
            cp = pltpu.make_async_copy(
                hbm_ref.at[pl.ds(pg * 4096, 4096), :], scratch, sem)
            cp.start()
            cp.wait()
            acc = acc + scratch[0, 0].astype(I32)
            idx = (idx * 1103515245 + 12345) & 0x7FFFFFFF
            return idx, acc

        idx0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 7
        _, acc = jax.lax.fori_loop(0, n_ref[0], body,
                                   (idx0, jnp.zeros((8, 128), I32)))
        out_ref[:] = acc

    @jax.jit
    def runB(n, b):
        return pl.pallas_call(
            dmaB_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((4096, 32), F32),
                            pltpu.SemaphoreType.DMA],
        )(n, b)

    report("dmaB_512k_ds", runB, (jnp.asarray([64], I32), big2),
           (jnp.asarray([1024], I32), big2), 64, 1024)

    # ---- DMA variant C: small row (4KB lod words) ---------------------------
    lod = jnp.ones((64, 1024), jnp.uint32)

    def dmaC_kernel(n_ref, hbm_ref, out_ref, scratch, sem):
        def body(i, c):
            idx, acc = c
            pg = jnp.min(idx) & 63
            cp = pltpu.make_async_copy(hbm_ref.at[pg], scratch, sem)
            cp.start()
            cp.wait()
            acc = acc + scratch[0].astype(I32)
            idx = (idx * 1103515245 + 12345) & 0x7FFFFFFF
            return idx, acc

        idx0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 7
        _, acc = jax.lax.fori_loop(0, n_ref[0], body,
                                   (idx0, jnp.zeros((8, 128), I32)))
        out_ref[:] = acc

    @jax.jit
    def runC(n, b):
        return pl.pallas_call(
            dmaC_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((1024,), jnp.uint32),
                            pltpu.SemaphoreType.DMA],
        )(n, b)

    report("dmaC_4k", runC, (jnp.asarray([64], I32), lod),
           (jnp.asarray([1024], I32), lod), 64, 1024)

    # ---- arb4k: 4096-entry gather via 4 registers ---------------------------
    tab4 = jnp.arange(4 * 8 * 128, dtype=I32).reshape(4, 8, 128)

    def arb(idx, t):
        row, col = (idx >> 7) & 7, idx & 127
        out = jnp.zeros_like(idx)
        for r in range(8):
            rowvals = jax.lax.broadcast_in_dim(t[r], (8, 128), (1,))
            g = jnp.take_along_axis(rowvals, col, axis=1)
            out = jnp.where(row == r, g, out)
        return out

    def arb4k_kernel(n_ref, t_ref, out_ref):
        t = t_ref[:]

        def body(i, c):
            idx, acc = c
            i4 = idx & 4095
            reg = i4 >> 10
            outs = [arb(i4 & 1023, t[k]) for k in range(4)]
            v = jnp.where(reg == 0, outs[0],
                          jnp.where(reg == 1, outs[1],
                                    jnp.where(reg == 2, outs[2], outs[3])))
            idx = (idx * 1103515245 + 12345 + v) & 0x7FFFFFFF
            return idx, acc + v

        idx0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 7
        _, acc = jax.lax.fori_loop(0, n_ref[0], body,
                                   (idx0, jnp.zeros((8, 128), I32)))
        out_ref[:] = acc

    @jax.jit
    def run4k(n, t):
        return pl.pallas_call(
            arb4k_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        )(n, t)

    report("arb4k", run4k, (jnp.asarray([1024], I32), tab4),
           (jnp.asarray([65536], I32), tab4), 1024, 65536)

    # ---- full-tile onehot: 1024 lanes fetch 32 halves, 8 chunks of 128 ------
    pool = jnp.ones((4096, 32), F32)

    def onehot_kernel(n_ref, pool_ref, out_ref):
        def body(i, c):
            idx, acc = c
            slot = idx & 4095
            tot = jnp.zeros((8, 128), F32)
            sflat = slot.reshape(8, 128)
            for g in range(8):
                s = sflat[g].reshape(128, 1)
                oh = (s == jax.lax.broadcasted_iota(I32, (128, 4096), 1)
                      ).astype(F32)
                got = jnp.dot(oh, pool_ref[:], preferred_element_type=F32)
                tot = tot.at[g].set(got.sum(axis=1))
            idx = (idx * 1103515245 + 12345 + tot.astype(I32)) & 0x7FFFFFFF
            return idx, acc + tot.astype(I32)

        idx0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 7
        _, acc = jax.lax.fori_loop(0, n_ref[0], body,
                                   (idx0, jnp.zeros((8, 128), I32)))
        out_ref[:] = acc

    @jax.jit
    def run_oh(n, p):
        return pl.pallas_call(
            onehot_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        )(n, p)

    report("onehot_fulltile", run_oh, (jnp.asarray([64], I32), pool),
           (jnp.asarray([2048], I32), pool), 64, 2048)

    # ---- while_loop in kernel (termination on mask) --------------------------
    def while_kernel(n_ref, out_ref):
        def cond(c):
            i, idx, acc = c
            return jnp.logical_and(i < n_ref[0], jnp.sum(idx & 1) > -1)

        def body(c):
            i, idx, acc = c
            v = (idx * 3) & 63
            idx = (idx * 1103515245 + 12345 + v) & 0x7FFFFFFF
            return i + 1, idx, acc + v

        idx0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 7
        _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), idx0, jnp.zeros((8, 128), I32)))
        out_ref[:] = acc

    @jax.jit
    def run_wh(n):
        return pl.pallas_call(
            while_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        )(n)

    report("while_masked", run_wh, (jnp.asarray([1024], I32),),
           (jnp.asarray([65536], I32),), 1024, 65536)


if __name__ == "__main__":
    main()
