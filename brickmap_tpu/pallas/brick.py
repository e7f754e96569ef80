"""Pallas TPU kernel: 8x8x8 brick DDA (BASELINE config 1).

The innermost traversal level (``intersect_brick``, voxel.cuh:79-133) as a
fused Pallas kernel.  Design rules measured on v5e (notes/PERF.md):

* every array op stays at the native (8, 128) tile shape — larger 2-D shapes
  fall off Mosaic's fast path by ~100x;
* the brick's 16 occupancy words live in vector registers, broadcast to all
  lanes; per-step word selection is a 16-way where-tree (~32 ns per tile-step,
  i.e. ~0.03 ns/ray/step) — no memory access in the loop at all;
* the DDA loop is a fixed-trip ``fori_loop`` of 22 steps (the 8^3 worst case)
  with lane masking — cheaper than a divergence-aware while.

Rays are processed in a 1-D grid of [8, 128] tiles; inputs are componentized
[T*8, 128] arrays (SoA), the same layout convention the XLA traversal uses.

This is the correctness+performance anchor for the round-2 hierarchical
VMEM-resident kernel: the outer levels add register block-caches and
per-descend word fetches around this exact inner loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["intersect_brick_tiles", "trace_single_brick"]

MAX_STEPS = 22  # 3*8 - 2: worst-case voxel visits crossing an 8^3 brick
BIG = 1_000_000.0


def _sel16(idx, vals):
    """16-way select by idx in [0,16) from 16 same-shape arrays."""
    def sel4(i2, a, b, c, d):
        return jnp.where(i2 == 0, a,
                         jnp.where(i2 == 1, b, jnp.where(i2 == 2, c, d)))

    lo = idx & 3
    g = [sel4(lo, *vals[k * 4:(k + 1) * 4]) for k in range(4)]
    return sel4(idx >> 2, *g)


def _brick_kernel(words_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  act_ref, hit_ref, t_ref, axis_ref):
    """One [8,128] ray tile against one brick (words broadcast to all lanes).

    Outputs: hit (int32 0/1), t (f32, local voxel units; 0 for an entry-cell
    hit), axis (int32: step axis of the hit face, -1 = hit at entry cell).
    """
    f32, i32 = jnp.float32, jnp.int32

    # Broadcast the 16 occupancy words into registers.
    w = [words_ref[0, k] for k in range(16)]
    words = [jnp.full((8, 128), wi, jnp.uint32) for wi in w]

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    act0 = act_ref[0] != 0

    def setup(o, d):
        p = jnp.trunc(o).astype(i32)  # C trunc, matching dda_ref (origins may
        # sit epsilon outside [0,8) after the entry nudge)
        stepf = jnp.sign(d)
        rd = jnp.where(d == 0.0, 0.0, 1.0 / d).astype(f32)
        cb = jnp.where(d > 0, p.astype(f32) + 1.0, p.astype(f32))
        t = jnp.where(d != 0.0, (cb - o) * rd, jnp.float32(BIG))
        td = stepf * rd
        pl_ = jnp.where(p >= 0, p - (p // 8) * 8,
                        -((-p) - ((-p) // 8) * 8))  # C trunc-mod
        out = jnp.where(d > 0, 8, -1).astype(i32)
        return pl_, stepf.astype(i32), t, td, out

    px, sx, tx, tdx, outx = setup(ox, dx)
    py, sy, ty, tdy, outy = setup(oy, dy)
    pz, sz, tz, tdz, outz = setup(oz, dz)

    def body(_, c):
        # Lane masks travel as int32 0/1: boolean fori-carries crash the
        # Mosaic compiler on this backend (see notes/PERF.md).
        px, py, pz, tx, ty, tz, axis, active_i, hit_i, thit, haxis = c
        active = active_i != 0
        lin = px + py * 8 + pz * 64
        lin = jnp.where((lin >= 0) & (lin < 512), lin, 0)
        word = _sel16((lin >> 5) & 15, words)
        occ = ((word >> (lin & 31).astype(jnp.uint32)) & 1) != 0

        new_hit = active & occ
        # Hit t/axis (voxel.cuh:114-119): tmax[axis]-tdelta[axis], or 0 at
        # the entry cell (axis == -1).
        entered = axis >= 0
        t_ax = jnp.where(axis == 0, tx, jnp.where(axis == 1, ty, tz))
        td_ax = jnp.where(axis == 0, tdx, jnp.where(axis == 1, tdy, tdz))
        t_val = jnp.where(entered, t_ax - td_ax, 0.0)
        thit = jnp.where(new_hit, t_val, thit)
        haxis = jnp.where(new_hit, axis, haxis)
        hit_i = hit_i | new_hit.astype(i32)
        active = active & ~occ

        # Step (voxel.cuh:122-130): x iff strictly smallest, y iff <=x and <z.
        ax = jnp.where(tx < ty, jnp.where(tx < tz, 0, 2),
                       jnp.where(ty < tz, 1, 2)).astype(i32)
        pxn = px + jnp.where(ax == 0, sx, 0)
        pyn = py + jnp.where(ax == 1, sy, 0)
        pzn = pz + jnp.where(ax == 2, sz, 0)
        exited = (jnp.where(ax == 0, pxn, jnp.where(ax == 1, pyn, pzn))
                  == jnp.where(ax == 0, outx, jnp.where(ax == 1, outy, outz)))
        txn = tx + jnp.where(ax == 0, tdx, 0.0)
        tyn = ty + jnp.where(ax == 1, tdy, 0.0)
        tzn = tz + jnp.where(ax == 2, tdz, 0.0)

        px = jnp.where(active, pxn, px)
        py = jnp.where(active, pyn, py)
        pz = jnp.where(active, pzn, pz)
        tx = jnp.where(active, txn, tx)
        ty = jnp.where(active, tyn, ty)
        tz = jnp.where(active, tzn, tz)
        axis = jnp.where(active, ax, axis)
        active = active & ~exited
        return (px, py, pz, tx, ty, tz, axis, active.astype(i32), hit_i,
                thit, haxis)

    init = (px, py, pz, tx, ty, tz,
            jnp.full((8, 128), -1, i32), act0.astype(i32),
            jnp.zeros((8, 128), i32), jnp.zeros((8, 128), f32),
            jnp.full((8, 128), -1, i32))
    out = jax.lax.fori_loop(0, MAX_STEPS, body, init)
    hit_ref[0] = out[8]
    t_ref[0] = out[9]
    axis_ref[0] = out[10]


@partial(jax.jit, static_argnames=("interpret",))
def intersect_brick_tiles(words, ox, oy, oz, dx, dy, dz, active,
                          interpret: bool = False):
    """DDA every ray against one brick.

    Args:
      words: uint32 [16] occupancy words (one brick).
      ox..dz: float32 [T, 8, 128] ray origins (brick-local voxel coords, may
        be outside [0,8) only by the epsilon nudge) and directions.
      active: int32 [T, 8, 128] lane mask.

    Returns (hit int32, t float32, axis int32) with shape [T, 8, 128];
    semantics identical to dda_ref.intersect_brick (normal = -step[axis],
    reconstructable from axis + direction sign).
    """
    t_tiles = ox.shape[0]
    spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, 16), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((t_tiles, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((t_tiles, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((t_tiles, 8, 128), jnp.int32),
    ]

    return pl.pallas_call(
        _brick_kernel,
        grid=(t_tiles,),
        in_specs=[wspec] + [spec] * 7,
        out_specs=[spec] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(words.reshape(1, 16), ox, oy, oz, dx, dy, dz, active)


def trace_single_brick(origins, directions, words, interpret: bool = False):
    """Convenience wrapper for [N, 3] rays (pads N to tiles of 1024).

    Returns dict(hit bool [N], t f32 [N], axis i32 [N]).
    """
    n = origins.shape[0]
    lanes = 8 * 128
    pad = (-n) % lanes
    o = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
    d = jnp.concatenate([directions, jnp.ones((pad, 3), directions.dtype)])
    t_tiles = o.shape[0] // lanes

    def comp(a, k):
        return a[:, k].reshape(t_tiles, 8, 128)

    act = jnp.concatenate([jnp.ones((n,), jnp.int32),
                           jnp.zeros((pad,), jnp.int32)]).reshape(t_tiles, 8,
                                                                  128)
    hit, t, axis = intersect_brick_tiles(
        words, comp(o, 0), comp(o, 1), comp(o, 2),
        comp(d, 0), comp(d, 1), comp(d, 2), act, interpret=interpret)
    return {
        "hit": hit.reshape(-1)[:n] != 0,
        "t": t.reshape(-1)[:n],
        "axis": axis.reshape(-1)[:n],
    }
