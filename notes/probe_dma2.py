"""Bisect the DMA compile crash: minimal variants."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32


def tryrun(name, fn, *args):
    try:
        out = fn(*args)
        v = np.asarray(jax.device_get(out))
        print(f"{name:28s} OK   sum={v.sum():.1f}")
    except Exception as e:
        msg = str(e).split("\n")[0][:180]
        print(f"{name:28s} FAILED: {msg}")


def make(kernel, in_spaces, scratch, out_shape=None):
    out_shape = out_shape or jax.ShapeDtypeStruct((8, 128), F32)

    @jax.jit
    def run(*args):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=sp) for sp in in_spaces],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
            scratch_shapes=scratch,
        )(*args)

    return run


def main():
    print("devices:", jax.devices())
    big = jnp.ones((16, 128, 128), F32)

    # A: static-index DMA, ANY space, outside any loop
    def kA(hbm_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(hbm_ref.at[3], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scratch[0:8, :]

    tryrun("A_static_ANY", make(kA, [pltpu.ANY],
                                [pltpu.VMEM((128, 128), F32),
                                 pltpu.SemaphoreType.DMA(())]), big)

    # B: dynamic scalar from SMEM input
    def kB(i_ref, hbm_ref, out_ref, scratch, sem):
        pg = i_ref[0]
        cp = pltpu.make_async_copy(hbm_ref.at[pg], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scratch[0:8, :]

    tryrun("B_dyn_smem_ANY", make(kB, [pltpu.SMEM, pltpu.ANY],
                                  [pltpu.VMEM((128, 128), F32),
                                   pltpu.SemaphoreType.DMA(())]),
           jnp.asarray([3], I32), big)

    # C: dynamic scalar from a vector reduction
    def kC(v_ref, hbm_ref, out_ref, scratch, sem):
        pg = jnp.min(v_ref[:]).astype(I32) & 15
        cp = pltpu.make_async_copy(hbm_ref.at[pg], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scratch[0:8, :]

    tryrun("C_dyn_reduce_ANY", make(kC, [pltpu.VMEM, pltpu.ANY],
                                    [pltpu.VMEM((128, 128), F32),
                                     pltpu.SemaphoreType.DMA(())]),
           jnp.full((8, 128), 3, I32), big)

    # D: dynamic inside fori_loop
    def kD(v_ref, hbm_ref, out_ref, scratch, sem):
        def body(i, acc):
            pg = (jnp.min(v_ref[:]).astype(I32) + i) & 15
            cp = pltpu.make_async_copy(hbm_ref.at[pg], scratch, sem)
            cp.start()
            cp.wait()
            return acc + scratch[0:8, :]

        out_ref[:] = jax.lax.fori_loop(
            0, 4, body, jnp.zeros((8, 128), F32))

    tryrun("D_dyn_fori_ANY", make(kD, [pltpu.VMEM, pltpu.ANY],
                                  [pltpu.VMEM((128, 128), F32),
                                   pltpu.SemaphoreType.DMA(())]),
           jnp.full((8, 128), 3, I32), big)

    # E: run_scoped variant of D
    def kE(v_ref, hbm_ref, out_ref):
        def inner(scratch, sem):
            def body(i, acc):
                pg = (jnp.min(v_ref[:]).astype(I32) + i) & 15
                cp = pltpu.make_async_copy(hbm_ref.at[pg], scratch, sem)
                cp.start()
                cp.wait()
                return acc + scratch[0:8, :]

            out_ref[:] = jax.lax.fori_loop(0, 4, body,
                                           jnp.zeros((8, 128), F32))

        pl.run_scoped(inner, scratch=pltpu.VMEM((128, 128), F32),
                      sem=pltpu.SemaphoreType.DMA(()))

    tryrun("E_dyn_scoped_ANY", make(kE, [pltpu.VMEM, pltpu.ANY], []),
           jnp.full((8, 128), 3, I32), big)

    # F: like D but uint32 source
    bigu = jnp.ones((16, 8, 128), jnp.uint32)

    def kF(v_ref, hbm_ref, out_ref, scratch, sem):
        def body(i, acc):
            pg = (jnp.min(v_ref[:]).astype(I32) + i) & 15
            cp = pltpu.make_async_copy(hbm_ref.at[pg], scratch, sem)
            cp.start()
            cp.wait()
            return acc + scratch[:].astype(F32)

        out_ref[:] = jax.lax.fori_loop(0, 4, body, jnp.zeros((8, 128), F32))

    tryrun("F_dyn_fori_u32", make(kF, [pltpu.VMEM, pltpu.ANY],
                                  [pltpu.VMEM((8, 128), jnp.uint32),
                                   pltpu.SemaphoreType.DMA(())]),
           jnp.full((8, 128), 3, I32), bigu)


if __name__ == "__main__":
    main()
