"""Visited-voxel extraction kernel for the brick-row sparse replay.

The row replay (:mod:`brickmap_tpu.diff.sparse`) gathers one flat
``[4*512]`` field row per (ray, segment) and needs the ``nvox`` visited
voxel values per segment — a per-lane gather from a private 2048-wide row,
which XLA can only express as ``nvox`` separate compare-select reductions,
each re-streaming the whole row buffer from HBM (measured ~17 ms fwd /
~30 ms bwd per 8192-ray slice — 22 passes over 537 MB).  This kernel does
all ``nvox`` extractions in ONE pass: each grid step holds a
``[block, 4*512]`` row tile in VMEM and the compare-select reductions run
at VPU speed over resident data.

``extract_rows_pallas`` wires forward + transpose kernels into a
``custom_vjp`` (the transpose scatters ``d_vals`` back along the same
compare masks; ``lin`` is integral, no tangent).  Outputs/cotangents use
flat ``[Cs, nvox*4]`` layouts — every array stays 2-D with a wide minor
dim, because TPU tiling pads trailing dims up to (8, 128) (a trailing dim
of 4 costs a measured 32x memory expansion).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["extract_rows_pallas"]

_BLOCK = 512


def _fwd_kernel(rows_ref, lin_ref, out_ref, *, nvox: int, nv: int):
    # j-outer so each compare mask is transient: keeping all nvox [B, nv]
    # masks live overflowed the scoped-VMEM stack (59.8 MB at B=1024), and
    # so do nvox*4 live [B, 1] columns (each lane-pads to [B, 128]) — the
    # per-step value lands in a [B, nvox] accumulator via a column-iota
    # select instead.
    rows = rows_ref[...]                       # [B, 4*nv]
    b = rows.shape[0]
    vox = jax.lax.broadcasted_iota(jnp.int32, (b, nv), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, nvox), 1)
    outs = [jnp.zeros((b, nvox), jnp.float32) for _ in range(4)]
    for j in range(nvox):
        sel = vox == lin_ref[:, j:j + 1]       # [B, nv]
        for f in range(4):
            sl = rows[:, f * nv:(f + 1) * nv]
            v = jnp.sum(jnp.where(sel, sl, 0.0), axis=1, keepdims=True)
            outs[f] = jnp.where(col == j, v, outs[f])
    out_ref[...] = jnp.concatenate(outs, axis=1)   # [B, 4*nvox]


def _bwd_kernel(lin_ref, dvals_ref, drows_ref, *, nvox: int, nv: int):
    dvals = dvals_ref[...]                     # [B, 4*nvox]
    b = dvals.shape[0]
    vox = jax.lax.broadcasted_iota(jnp.int32, (b, nv), 1)
    acc = [jnp.zeros((b, nv), jnp.float32) for _ in range(4)]
    for j in range(nvox):
        sel = vox == lin_ref[:, j:j + 1]
        for f in range(4):
            dv = dvals[:, f * nvox + j:f * nvox + j + 1]
            acc[f] = acc[f] + jnp.where(sel, dv, 0.0)
    drows_ref[...] = jnp.concatenate(acc, axis=1)  # [B, 4*nv]


def _pad_rows(a, n):
    pad = (-a.shape[0]) % _BLOCK
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)
             if a.dtype != jnp.int32
             else jnp.full((pad, *a.shape[1:]), -1, a.dtype)])
    return a


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def extract_rows_pallas(rows2, lin2, interpret: bool = False):
    """vals [Cs, 4*nvox] (column f*nvox + j) from rows2 [Cs, 4*nv] (column
    f*nv + v) at lin2 [Cs, nvox] (int32; any out-of-range index yields 0).

    Differentiable in ``rows2`` (exact transpose, one kernel pass)."""
    return _extract_fwd_impl(rows2, lin2, interpret)


def _extract_fwd_impl(rows2, lin2, interpret):
    cs = rows2.shape[0]
    nv = rows2.shape[1] // 4
    nvox = lin2.shape[1]
    rows_p = _pad_rows(rows2, cs)
    lin_p = _pad_rows(lin2, cs)
    t = rows_p.shape[0] // _BLOCK
    out = pl.pallas_call(
        partial(_fwd_kernel, nvox=nvox, nv=nv),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((_BLOCK, 4 * nv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, nvox), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, nvox * 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p.shape[0], nvox * 4),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(rows_p, lin_p)
    return out[:cs]


def _extract_vjp_fwd(rows2, lin2, interpret):
    return _extract_fwd_impl(rows2, lin2, interpret), (lin2, rows2.shape[1])


def _extract_vjp_bwd(interpret, res, dvals):
    lin2, width = res
    cs = lin2.shape[0]
    nv = width // 4
    nvox = lin2.shape[1]
    lin_p = _pad_rows(lin2, cs)
    dvals_p = _pad_rows(dvals, cs)
    t = lin_p.shape[0] // _BLOCK
    drows = pl.pallas_call(
        partial(_bwd_kernel, nvox=nvox, nv=nv),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((_BLOCK, nvox), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, nvox * 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, 4 * nv), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lin_p.shape[0], 4 * nv),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(lin_p, dvals_p)
    return drows[:cs], None


extract_rows_pallas.defvjp(_extract_vjp_fwd, _extract_vjp_bwd)
