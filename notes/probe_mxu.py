"""Probe round 4: brick-payload one-hot matmul shapes + word assembly."""
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


def report_rate(name, fn, args_lo, args_hi, n_lo, n_hi):
    try:
        tlo = timed_min(fn, args_lo)
        thi = timed_min(fn, args_hi)
        per = (thi - tlo) / (n_hi - n_lo)
        print(f"{name:26s} {per*1e9:9.1f} ns/iter  (lo {tlo*1e3:8.2f} ms, hi {thi*1e3:8.2f} ms)")
    except Exception as e:
        print(f"{name:26s} FAILED: {str(e).splitlines()[0][:180]}")


def tryrun(name, fn, *args):
    try:
        out = fn(*args)
        v = np.asarray(jax.device_get(out))
        print(f"{name:26s} OK   sum={float(np.sum(v)):.1f}")
    except Exception as e:
        print(f"{name:26s} FAILED: {str(e).splitlines()[0][:180]}")


def main():
    print("devices:", jax.devices())

    # --- A: narrow VMEM scratch (4096, 32) + DMA: does it compile? ----------
    big = jnp.ones((4, 4096, 32), F32)

    def kA(hbm_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(hbm_ref.at[1], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scratch[0:8, 0:128]  # shape slice mismatch? 32 cols only

    def kA2(hbm_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(hbm_ref.at[1], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = jnp.broadcast_to(scratch[0:8, 0:1], (8, 128))

    @jax.jit
    def runA(b):
        return pl.pallas_call(
            kA2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), F32),
            scratch_shapes=[pltpu.VMEM((4096, 32), F32),
                            pltpu.SemaphoreType.DMA(())],
        )(b)

    tryrun("A_narrow_scratch_dma", runA, big)

    # --- B: full descend fetch, transposed pool layout ----------------------
    # poolT [32, 4096] in VMEM; slots (8,128); out: 16 u32 words per lane.
    poolT = jnp.arange(32 * 4096, dtype=F32) % 7.0
    poolT = poolT.reshape(32, 4096)

    def fetch_bricks(poolT_v, slot):
        # per sublane s: onehot_T (4096, 128), matmul (32,4096)@(4096,128)
        chunks = []
        cell_iota = jax.lax.broadcasted_iota(I32, (4096, 128), 0)
        for s in range(8):
            srow = jax.lax.broadcast_in_dim(slot[s], (4096, 128), (1,))
            ohT = (srow == cell_iota).astype(F32)
            chunks.append(jnp.dot(poolT_v, ohT,
                                  preferred_element_type=F32))  # (32,128)
        # assemble 16 u32 words as i32 (halves < 2^16)
        words = []
        for k in range(16):
            lo = jnp.concatenate([c[2 * k:2 * k + 1] for c in chunks], 0)
            hi = jnp.concatenate([c[2 * k + 1:2 * k + 2] for c in chunks], 0)
            words.append(lo.astype(I32) | (hi.astype(I32) << 16))
        return words

    def kB(n_ref, poolT_ref, out_ref):
        pv = poolT_ref[:]

        def body(i, c):
            slot, acc = c
            words = fetch_bricks(pv, slot & 4095)
            v = words[0] ^ words[7] ^ words[15]
            slot = (slot * 1103515245 + 12345 + v) & 0x7FFFFFFF
            return slot, acc + v

        s0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 31
        _, acc = jax.lax.fori_loop(0, n_ref[0], body,
                                   (s0, jnp.zeros((8, 128), I32)))
        out_ref[:] = acc

    @jax.jit
    def runB(n, p):
        return pl.pallas_call(
            kB,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        )(n, p)

    report_rate("B_fetch_transposed", runB,
                (jnp.asarray([16], I32), poolT),
                (jnp.asarray([512], I32), poolT), 16, 512)

    # --- C: straightforward orientation (onehot [128,4096] @ [4096,32]) -----
    pool = jnp.arange(4096 * 32, dtype=F32).reshape(4096, 32) % 7.0

    def kC(n_ref, pool_ref, out_ref):
        pv = pool_ref[:]

        def body(i, c):
            slot, acc = c
            cell_iota = jax.lax.broadcasted_iota(I32, (128, 4096), 1)
            outs = []
            for s in range(8):
                scol = jax.lax.broadcast_in_dim(slot[s] & 4095, (128, 4096),
                                                (0,))
                oh = (scol == cell_iota).astype(F32)
                got = jnp.dot(oh, pv, preferred_element_type=F32)  # (128,32)
                outs.append(got)
            v = sum(o.astype(I32).sum(axis=1) for o in outs)
            v = jnp.broadcast_to(v.reshape(1, 128), (8, 128))
            slot = (slot * 1103515245 + 12345 + v) & 0x7FFFFFFF
            return slot, acc + v

        s0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 31
        _, acc = jax.lax.fori_loop(0, n_ref[0], body,
                                   (s0, jnp.zeros((8, 128), I32)))
        out_ref[:] = acc

    @jax.jit
    def runC(n, p):
        return pl.pallas_call(
            kC,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        )(n, p)

    report_rate("C_fetch_narrow_rhs", runC,
                (jnp.asarray([16], I32), pool),
                (jnp.asarray([512], I32), pool), 16, 512)

    # --- D: correctness of B's fetch in one shot ------------------------------
    def kD(poolT_ref, slot_ref, out_ref):
        words = fetch_bricks(poolT_ref[:], slot_ref[:])
        out_ref[:] = words[3]

    @jax.jit
    def runD(p, s):
        return pl.pallas_call(
            kD,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        )(p, s)

    slots = (jnp.arange(1024, dtype=I32) * 37 % 4096).reshape(8, 128)
    try:
        got = np.asarray(runD(poolT, slots))
        pt = np.asarray(poolT)
        sl = np.asarray(slots)
        want = (pt[6, sl].astype(np.int64)
                | (pt[7, sl].astype(np.int64).astype(np.int64) << 16))
        ok = np.array_equal(got.astype(np.int64) & 0xFFFFFFFF, want)
        print(f"{'D_fetch_correct':26s} {'OK' if ok else 'MISMATCH'}")
    except Exception as e:
        print(f"{'D_fetch_correct':26s} FAILED: {str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
