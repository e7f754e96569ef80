"""Differentiable rendering over the sparse brick pool (BASELINE config 5).

Two-phase design ("store hit segment list per ray, bounded K", SURVEY.md §7
milestone 4):

1. **Record** (non-differentiable, Pallas): the hierarchical kernel's march
   lists each ray's first K occupied cells front-to-back
   (:func:`brickmap_tpu.pallas.record.record_segments`).
2. **Composite** (differentiable, XLA): per segment, the brick's soft
   occupancy/albedo rows are gathered from the pool fields and the <=22-voxel
   in-brick DDA alpha-composites them:

       w_i = T * occ_i,   T <- T * (1 - occ_i),   rgb += w_i * albedo_i

   Rays are chunked and each segment's replay is rematerialized
   (``jax.checkpoint``), so backward memory is one chunk x one brick row —
   no while-loop residuals.  Gradients reach exactly the voxels of resident
   bricks (the sparse model's parameter support); with binary occupancy the
   result reduces to the hard-surface renderer (parity-tested vs the dense
   compositor and the scalar oracle).

The reference has no backward pass of any kind; the geometry/order of voxel
visits matches its traversal (voxel.cuh:79-133).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GridConfig
from ..pallas.record import record_segments

__all__ = ["cell_pool_map", "pool_fields_from_bitmask", "composite_sparse",
           "l2_loss_and_grads_sparse"]


def cell_pool_map(scene, grid: GridConfig) -> np.ndarray:
    """int32 [CZ, CY, CX]: brick cell -> global pool row (-1 where empty)."""
    iv = np.asarray(scene.index_volume)
    base = np.asarray(scene.pool_base)
    cz, cy, cx = iv.shape
    s = grid.supergrid_cell_size
    zz, yy, xx = np.meshgrid(np.arange(cz), np.arange(cy), np.arange(cx),
                             indexing="ij")
    sc = (xx // s) + (yy // s) * grid.supergrid_xy \
        + (zz // s) * grid.supergrid_xy ** 2
    loaded = (iv & np.uint32(0x8000_0000)) != 0
    slot = base[sc] + (iv & np.uint32(0xFFF)).astype(np.int64)
    return np.where(loaded, slot, -1).astype(np.int32)


def pool_fields_from_bitmask(scene) -> tuple[np.ndarray, np.ndarray]:
    """Initial (occupancy [P,512], albedo [P,512,3]) from the hard bitmask —
    the binarized starting point whose render equals the hard renderer."""
    from .. import bits

    words = np.asarray(scene.pool_words)
    dense = np.asarray(bits.dense_from_brick_words(words))  # [P, 8,8,8] z,y,x
    # Brick-voxel linear index is x + 8y + 64z (voxel_bit_position), which is
    # exactly the raveled (z, y, x) order.
    occ = dense.reshape(words.shape[0], 512).astype(np.float32)
    alb = np.ones((words.shape[0], 512, 3), np.float32)
    return occ, alb


@partial(jax.jit, static_argnames=("grid", "k_segments", "rays_per_chunk"))
def composite_sparse(o_cells, direction, segs, cellmap, occupancy, albedo,
                     background, grid: GridConfig, k_segments: int = 16,
                     rays_per_chunk: int = 32768):
    """Alpha-composite recorded segments. Returns (rgb [N,3], trans [N]).

    Differentiable in (occupancy [P,512], albedo [P,512,3]).
    """
    eps = jnp.float32(grid.epsilon)
    bsz = grid.brick_size
    cellmap_flat = cellmap.reshape(-1)
    cy, cx = cellmap.shape[1], cellmap.shape[2]
    n = o_cells.shape[0]

    def run_chunk(args):
        oc, dc, cells, nds, ncodes, enorm, bg = args

        def seg_step(k, carry):
            trans, rgb = carry
            cell = cells[:, k]
            nd = nds[:, k]
            ncode = ncodes[:, k]
            valid = cell >= 0
            cxp = cell & 0x3FF
            cyp = (cell >> 10) & 0x3FF
            czp = (cell >> 20) & 0x3FF
            flat = (czp * cy + cyp) * cx + cxp
            slot = jnp.take(cellmap_flat, jnp.clip(flat, 0,
                                                   cellmap_flat.shape[0] - 1))
            valid = valid & (slot >= 0)
            slot = jnp.where(valid, slot, 0)
            occ_row = jnp.take(occupancy, slot, axis=0)      # [C, 512]
            alb_row = jnp.take(albedo, slot, axis=0)         # [C, 512, 3]

            # In-brick DDA from the nudged entry point (voxel.cuh:224).
            nrm = jnp.stack(
                [jnp.where(ncode == a, -jnp.sign(dc[:, a]), 0.0)
                 for a in range(3)], 1)
            nrm = jnp.where((ncode >= 0)[:, None], nrm, enorm)
            so = (oc + dc * nd[:, None]) * bsz - nrm * eps
            pg = jnp.trunc(so).astype(jnp.int32)
            stepv = jnp.sign(dc).astype(jnp.int32)
            rd = jnp.where(dc == 0.0, 0.0, 1.0 / dc)
            # Crossing times in the global frame of `so`; only the position is
            # reduced to brick-local coordinates (C trunc-mod, voxel.cuh:93).
            cb = jnp.where(dc > 0, pg + 1.0, pg.astype(jnp.float32))
            tmax = jnp.where(dc != 0.0, (cb - so) * rd, 1e6)
            p = jnp.where(pg >= 0, pg % bsz, -((-pg) % bsz))
            tdelta = jnp.abs(rd)
            out = jnp.where(dc > 0, bsz, -1)

            def vox_step(_, c):
                p, tmax, act, trans, rgb = c
                inb = jnp.all((p >= 0) & (p < bsz), axis=1)
                lin = jnp.clip(p[:, 0] + p[:, 1] * bsz + p[:, 2] * bsz * bsz,
                               0, bsz ** 3 - 1)
                ov = jnp.clip(jnp.take_along_axis(
                    occ_row, lin[:, None], 1)[:, 0], 0.0, 1.0)
                av = jnp.take_along_axis(alb_row, lin[:, None, None], 1)[:, 0]
                ov = jnp.where(act & inb, ov, 0.0)
                w = trans * ov
                rgb = rgb + w[:, None] * av
                trans = trans * (1.0 - ov)

                tx, ty, tz = tmax[:, 0], tmax[:, 1], tmax[:, 2]
                ax = jnp.where(tx < ty, jnp.where(tx < tz, 0, 2),
                               jnp.where(ty < tz, 1, 2))
                onehot = (jnp.arange(3)[None, :] == ax[:, None])
                pn = p + jnp.where(onehot, stepv, 0)
                exited = jnp.take_along_axis(pn, ax[:, None], 1)[:, 0] \
                    == jnp.take_along_axis(out, ax[:, None], 1)[:, 0]
                p = jnp.where(act[:, None], pn, p)
                tmax = tmax + jnp.where(onehot & act[:, None], tdelta, 0.0)
                act = act & ~exited
                return (p, tmax, act, trans, rgb)

            init = (p, tmax, valid, trans, rgb)
            _, _, _, trans, rgb = jax.lax.fori_loop(0, 3 * bsz - 2, vox_step,
                                                    init)
            return trans, rgb

        trans = jnp.ones((oc.shape[0],), jnp.float32)
        rgb = jnp.zeros((oc.shape[0], 3), jnp.float32)
        for k in range(k_segments):
            trans, rgb = jax.checkpoint(
                lambda tr, rg, kk=k: seg_step(kk, (tr, rg)))(trans, rgb)
        rgb = rgb + trans[:, None] * bg
        return rgb, trans

    if n <= rays_per_chunk:
        return run_chunk((o_cells, direction, segs["cells"], segs["nd"],
                          segs["ncode"], segs["entry_normal"], background))

    pad = (-n) % rays_per_chunk
    def padded(a, fill=0.0):
        if not pad:
            return a
        return jnp.concatenate(
            [a, jnp.full((pad, *a.shape[1:]), fill, a.dtype)])

    parts = (padded(o_cells), padded(direction, 1.0),
             padded(segs["cells"], -1), padded(segs["nd"]),
             padded(segs["ncode"], -1), padded(segs["entry_normal"]),
             padded(background))
    c = parts[0].shape[0] // rays_per_chunk
    rgb, trans = jax.lax.map(
        run_chunk, tuple(a.reshape(c, rays_per_chunk, *a.shape[1:])
                         for a in parts))
    return rgb.reshape(-1, 3)[:n], trans.reshape(-1)[:n]


def l2_loss_and_grads_sparse(origin, direction, pscene, cellmap, occupancy,
                             albedo, background, target, grid: GridConfig,
                             k_segments: int = 16,
                             rays_per_chunk: int = 32768,
                             interpret: bool = False):
    """L2 image loss + gradients w.r.t. the sparse pool fields.

    The record phase runs the Pallas kernel once (non-differentiable); the
    loss/grad phase replays the bounded-K segments.
    """
    segs = record_segments(origin, direction, pscene, grid,
                           k_segments=k_segments, interpret=interpret)

    @partial(jax.jit, static_argnames=())
    def loss_fn(occ, alb):
        rgb, _ = composite_sparse(
            segs["o_cells"], direction, segs, cellmap, occ, alb, background,
            grid, k_segments=k_segments, rays_per_chunk=rays_per_chunk)
        return jnp.mean((rgb - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        occupancy, albedo)
    return loss, grads
