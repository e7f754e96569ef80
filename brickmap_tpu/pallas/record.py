"""Segment recorder: per-ray lists of occupied cells for the diff renderer.

The differentiable transmittance compositor (BASELINE.json north star) needs
each ray's front-to-back sequence of resident bricks.  Recording it once with
a Pallas kernel and replaying bounded-K segments keeps the backward pass free
of while-loop residuals — the "store hit segment list per ray, bounded K"
design (SURVEY.md section 7, milestone 4).

The kernel is the cell-level march of :mod:`.traverse3` (page voting +
occupancy bit-rows + empty-page Chebyshev transit; identical Amanatides-Woo
arithmetic) with descends replaced by an append: every occupied cell crossed
emits (packed cell, entry distance nd, entry-face axis code) into K carried
registers, and the ray continues instead of stopping.  LoD does not apply —
the compositor integrates every resident brick the ray touches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GridConfig
from ..ops.traverse import aabb_clip
from .traverse3 import (
    BIG,
    DEAD_SC,
    LANES,
    NEG,
    _arb1024,
    _bcast_row,
    _gather_scdist,
    _sel_axis,
)

__all__ = ["record_segments"]


def _make_kernel(grid: GridConfig, *, k_segments: int, max_page_rounds: int,
                 march_steps: int, transit_iters: int, nr4: int,
                 with_slots: bool):
    i32, f32 = jnp.int32, jnp.float32
    s = grid.supergrid_cell_size
    sx_pages = grid.supergrid_xy
    cx_max = cy_max = grid.cells
    cz_max = grid.cells_height
    K = k_segments

    def kernel(*refs):
        if with_slots:
            (scd_ref, base_ref, meta_hbm, slotmeta_hbm,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, act_ref,
             cell_ref, nd_ref, ncode_ref, slot_ref, count_ref, exh_ref,
             meta_s, slotm_s, sem_meta, sem_slot) = refs
        else:
            (scd_ref, meta_hbm,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, act_ref,
             cell_ref, nd_ref, ncode_ref, count_ref, exh_ref,
             meta_s, sem_meta) = refs
        scd = scd_ref[:]
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

        def setup(d):
            si = jnp.sign(d).astype(i32)
            rd = jnp.where(d == 0.0, 0.0, 1.0 / d).astype(f32)
            return si, rd, si.astype(f32) * rd

        six, rdx, tdx = setup(dx)
        siy, rdy, tdy = setup(dy)
        siz, rdz, tdz = setup(dz)

        def dda_init(o, d, rd):
            p = jnp.trunc(o).astype(i32)
            cb = jnp.where(d > 0, p.astype(f32) + 1.0, p.astype(f32))
            t = jnp.where(d != 0.0, (cb - o) * rd, f32(BIG))
            return p, t

        px, tx = dda_init(ox, dx, rdx)
        py, ty = dda_init(oy, dy, rdy)
        pz, tz = dda_init(oz, dz, rdz)
        inside = ((px >= 0) & (px < cx_max) & (py >= 0) & (py < cy_max)
                  & (pz >= 0) & (pz < cz_max))
        alive = ((act_ref[0] != 0) & inside).astype(i32)

        zero_i = jnp.zeros((8, 128), i32)

        st = dict(
            rnd=jnp.int32(0), alive=alive,
            px=px, py=py, pz=pz, tx=tx, ty=ty, tz=tz,
            axis0=jnp.full((8, 128), -1, i32),
            count=zero_i,
            # (cell, nd, ncode[, pool slot]) — the slot register is carried
            # only when the caller wants it (ADVICE r3: K dead (8,128) state
            # arrays otherwise, against the keep-loop-state-small rule).
            segs=tuple((jnp.full((8, 128), -1, i32),
                        jnp.zeros((8, 128), f32),
                        jnp.full((8, 128), -1, i32))
                       + ((jnp.full((8, 128), -1, i32),) if with_slots
                          else ())
                       for _ in range(K)),
        )

        def page_of(px, py, pz):
            return (px >> 4) + (py >> 4) * sx_pages \
                + (pz >> 4) * sx_pages * sx_pages

        def step_arrays(px, py, pz, tx, ty, tz, kx, ky, kz):
            pxn = px + six * kx
            pyn = py + siy * ky
            pzn = pz + siz * kz
            txn = tx + kx.astype(f32) * tdx
            tyn = ty + ky.astype(f32) * tdy
            tzn = tz + kz.astype(f32) * tdz
            tlx = jnp.where(kx > 0, txn - tdx, NEG)
            tly = jnp.where(ky > 0, tyn - tdy, NEG)
            tlz = jnp.where(kz > 0, tzn - tdz, NEG)
            t_axis = jnp.where(
                tlx > tly,
                jnp.where(tlx > tlz, 0, 2),
                jnp.where(tly > tlz, 1, 2)).astype(i32)
            exited = (((dx > 0) & (pxn >= cx_max)) | ((dx < 0) & (pxn < 0))
                      | ((dy > 0) & (pyn >= cy_max)) | ((dy < 0) & (pyn < 0))
                      | ((dz > 0) & (pzn >= cz_max)) | ((dz < 0) & (pzn < 0)))
            return pxn, pyn, pzn, txn, tyn, tzn, t_axis, exited

        def cond(st):
            return jnp.logical_and(st["rnd"] < max_page_rounds,
                                   jnp.max(st["alive"]) > 0)

        def round_body(st):
            alive = st["alive"] != 0
            sc = page_of(st["px"], st["py"], st["pz"])
            sc_c = jnp.where(alive, sc, DEAD_SC)
            dpage = _gather_scdist(scd, jnp.clip(sc_c, 0, nr4 * 1024 - 1))
            vote = jnp.where(alive & (dpage == 0), sc_c, DEAD_SC)
            page_needed = jnp.min(vote)
            page = jnp.where(page_needed < DEAD_SC, page_needed,
                             jnp.min(sc_c))
            page = jnp.clip(page, 0, meta_hbm.shape[0] - 1)

            cp_meta = pltpu.make_async_copy(meta_hbm.at[page], meta_s,
                                            sem_meta)
            cp_meta.start()
            if with_slots:
                cp_slot = pltpu.make_async_copy(slotmeta_hbm.at[page],
                                                slotm_s, sem_slot)
                cp_slot.start()
                base_page = _gather_scdist(
                    base_ref[:], jnp.full((8, 128), page, i32))

            def transit(_, st):
                alive = st["alive"] != 0
                px, py, pz = st["px"], st["py"], st["pz"]
                tx, ty, tz = st["tx"], st["ty"], st["tz"]
                sc = page_of(px, py, pz)
                dp = _gather_scdist(
                    scd, jnp.clip(jnp.where(alive, sc, 0), 0,
                                  nr4 * 1024 - 1))
                moving = alive & (sc != page) & (dp >= 1)

                qx, qy, qz = px >> 4, py >> 4, pz >> 4
                dm1 = dp - 1
                rx = jnp.minimum(px - (qx - dm1) * s,
                                 (qx + dm1) * s + (s - 1) - px)
                ry = jnp.minimum(py - (qy - dm1) * s,
                                 (qy + dm1) * s + (s - 1) - py)
                rz = jnp.minimum(pz - (qz - dm1) * s,
                                 (qz + dm1) * s + (s - 1) - pz)
                skip_r = jnp.clip(jnp.minimum(rx, jnp.minimum(ry, rz)),
                                  0, None)
                use_skip = moving & (skip_r >= 1)

                rf = skip_r.astype(f32)
                t_exit = jnp.minimum(
                    jnp.minimum(jnp.where(dx != 0, tx + rf * tdx, BIG),
                                jnp.where(dy != 0, ty + rf * tdy, BIG)),
                    jnp.where(dz != 0, tz + rf * tdz, BIG))

                def k_axis(d, t, td):
                    k = jnp.where(
                        d != 0.0,
                        jnp.floor((t_exit - t)
                                  / jnp.where(td == 0, 1.0, td))
                        .astype(i32) + 1, 0)
                    return jnp.clip(k, 0, skip_r + 1)

                t_axis1 = _sel_axis(tx, ty, tz)
                kx1 = jnp.where(t_axis1 == 0, 1, 0)
                ky1 = jnp.where(t_axis1 == 1, 1, 0)
                kz1 = jnp.where(t_axis1 == 2, 1, 0)
                kx = jnp.where(use_skip, k_axis(dx, tx, tdx), kx1)
                ky = jnp.where(use_skip, k_axis(dy, ty, tdy), ky1)
                kz = jnp.where(use_skip, k_axis(dz, tz, tdz), kz1)
                stuck = use_skip & (kx + ky + kz == 0)
                kx = jnp.where(stuck, kx1, kx)
                ky = jnp.where(stuck, ky1, ky)
                kz = jnp.where(stuck, kz1, kz)

                pxn, pyn, pzn, txn, tyn, tzn, t_axis, exited = step_arrays(
                    px, py, pz, tx, ty, tz, kx, ky, kz)
                miss = moving & exited
                return dict(
                    st,
                    alive=(alive & ~miss).astype(i32),
                    px=jnp.where(moving, pxn, px),
                    py=jnp.where(moving, pyn, py),
                    pz=jnp.where(moving, pzn, pz),
                    tx=jnp.where(moving, txn, tx),
                    ty=jnp.where(moving, tyn, ty),
                    tz=jnp.where(moving, tzn, tz),
                    axis0=jnp.where(moving, t_axis, st["axis0"]),
                )

            st = jax.lax.fori_loop(0, transit_iters, transit, st)

            cp_meta.wait()
            if with_slots:
                cp_slot.wait()
            occ_row = _bcast_row(meta_s[0])
            # Cell-ESS nibbles (paged.py rows 10-13): d>=2 lets empty-cell
            # steps jump the L-inf (d-1) box instead of one cell.
            dist_tab = jnp.concatenate(
                [meta_s[10:14], jnp.zeros((4, 128), i32)], axis=0)

            def march_cond(c):
                it, cont, st = c
                return jnp.logical_and(it < march_steps, cont > 0)

            def march(c):
                it, _, st = c
                alive = st["alive"] != 0
                px, py, pz = st["px"], st["py"], st["pz"]
                tx, ty, tz = st["tx"], st["ty"], st["tz"]
                axis0 = st["axis0"]
                in_voted = page_of(px, py, pz) == page
                marching = alive & in_voted & (st["count"] < K)

                lin = ((pz & 15) * s + (py & 15)) * s + (px & 15)
                w = jnp.take_along_axis(occ_row, (lin >> 5) & 127, axis=1)
                occ0 = marching & ((((w >> (lin & 31)) & 1)) != 0)

                entered = axis0 >= 0
                t_ax = jnp.where(axis0 == 0, tx,
                                 jnp.where(axis0 == 1, ty, tz))
                td_ax = jnp.where(axis0 == 0, tdx,
                                  jnp.where(axis0 == 1, tdy, tdz))
                nd_new = jnp.where(entered, t_ax - td_ax, 0.0)

                # Append (cell, nd, ncode[, pool slot]) into seg `count`.
                pack = px | (py << 10) | (pz << 20)
                if with_slots:
                    # Global pool row: page base + the cell's 12-bit slot
                    # (16-bit halves in slotm_s; 0xFFFF = not loaded).
                    hw = lin >> 1
                    s16 = jnp.where(
                        hw < 1024, _arb1024(slotm_s[0:8], hw & 1023),
                        _arb1024(slotm_s[8:16], hw & 1023))
                    s16 = (s16 >> ((lin & 1) * 16)) & 0xFFFF
                    gslot = jnp.where(s16 == 0xFFFF, -1, base_page + s16)
                segs = []
                for kk in range(K):
                    c_k, n_k, a_k = st["segs"][kk][:3]
                    write = occ0 & (st["count"] == kk)
                    seg = (
                        jnp.where(write, pack, c_k),
                        jnp.where(write, nd_new, n_k),
                        jnp.where(write, jnp.where(entered, axis0, -1),
                                  a_k))
                    if with_slots:
                        seg += (jnp.where(write, gslot, st["segs"][kk][3]),)
                    segs.append(seg)
                count = st["count"] + occ0.astype(i32)

                # Step every marching lane (recording does not stop the ray).
                stepping = marching & (count < K)
                ax = _sel_axis(tx, ty, tz)
                kx1 = jnp.where(ax == 0, 1, 0)
                ky1 = jnp.where(ax == 1, 1, 0)
                kz1 = jnp.where(ax == 2, 1, 0)

                dsel = _arb1024(dist_tab, (lin >> 3) & 511)
                dnib = (dsel >> ((lin & 7) * 4)) & 15
                use_jump = stepping & (dnib >= 2)
                dm1 = dnib - 1
                rf = dm1.astype(f32)
                t_exit = jnp.minimum(
                    jnp.minimum(jnp.where(dx != 0, tx + rf * tdx, BIG),
                                jnp.where(dy != 0, ty + rf * tdy, BIG)),
                    jnp.where(dz != 0, tz + rf * tdz, BIG))

                def k_axis(d, t, td):
                    k = jnp.where(
                        d != 0.0,
                        jnp.floor((t_exit - t)
                                  / jnp.where(td == 0, 1.0, td))
                        .astype(i32) + 1, 0)
                    return jnp.clip(k, 0, dm1 + 1)

                kx = jnp.where(use_jump, k_axis(dx, tx, tdx), kx1)
                ky = jnp.where(use_jump, k_axis(dy, ty, tdy), ky1)
                kz = jnp.where(use_jump, k_axis(dz, tz, tdz), kz1)
                stuck = use_jump & (kx + ky + kz == 0)
                kx = jnp.where(stuck, kx1, kx)
                ky = jnp.where(stuck, ky1, ky)
                kz = jnp.where(stuck, kz1, kz)
                pxn, pyn, pzn, txn, tyn, tzn, t_axis, exited = step_arrays(
                    px, py, pz, tx, ty, tz, kx, ky, kz)
                done = (stepping & exited) | (marching & (count >= K))
                alive2 = alive & ~done

                cont = stepping & ~exited & (page_of(pxn, pyn, pzn) == page)
                st = dict(
                    st,
                    alive=alive2.astype(i32),
                    px=jnp.where(stepping, pxn, px),
                    py=jnp.where(stepping, pyn, py),
                    pz=jnp.where(stepping, pzn, pz),
                    tx=jnp.where(stepping, txn, tx),
                    ty=jnp.where(stepping, tyn, ty),
                    tz=jnp.where(stepping, tzn, tz),
                    axis0=jnp.where(stepping, t_axis, axis0),
                    count=count, segs=tuple(segs),
                )
                return it + 1, jnp.max(cont.astype(i32)), st

            _, _, st = jax.lax.while_loop(
                march_cond, march, (jnp.int32(0), jnp.int32(1), st))
            return dict(st, rnd=st["rnd"] + 1)

        st = jax.lax.while_loop(cond, round_body, st)

        for kk in range(K):
            c_k, n_k, a_k = st["segs"][kk][:3]
            cell_ref[0, kk] = c_k
            nd_ref[0, kk] = n_k
            ncode_ref[0, kk] = a_k
            if with_slots:
                slot_ref[0, kk] = st["segs"][kk][3]
        count_ref[0] = st["count"]
        exh_ref[0] = st["alive"]

    return kernel


@partial(jax.jit,
         static_argnames=("grid", "k_segments", "max_page_rounds",
                          "march_steps", "transit_iters", "interpret",
                          "tiled"))
def record_segments(origin, direction, pscene, grid: GridConfig,
                    k_segments: int = 16, max_page_rounds: int = 96,
                    march_steps: int = 48, transit_iters: int = 2,
                    interpret: bool = False, slot_tables=None,
                    tiled: bool = False):
    """Record each ray's first ``k_segments`` occupied cells, front-to-back.

    Returns dict(cells [N,K] i32 packed x|y<<10|z<<20 (-1 = unused),
    nd [N,K] f32 entry distance in cell units (pre-clip), ncode [N,K] i32
    entry-face axis (-1 = ray origin inside the cell / entry face),
    count [N] i32, tminn [N] f32, entry_normal [N,3], exhausted [N] bool).

    With ``slot_tables`` (the ``(slotmeta, base_pack)`` pair from
    :func:`brickmap_tpu.pallas.paged.build_slot_tables`) the dict also
    carries ``slot`` [N,K] i32: each segment's GLOBAL pool row (-1 for
    unused segments or non-loaded cells), letting a replay consumer address
    pool-field rows directly instead of re-deriving them through a
    per-voxel cellmap gather.
    ``tiled=True`` returns per-segment arrays in the kernel's native
    [T, K, 8, 128] layout (and count/exhausted as [T, 8, 128]) so a
    downstream Pallas consumer avoids the unpad/repad round trip.
    """
    n = origin.shape[0]
    ok, tminn, clipped, entry_normal = aabb_clip(origin, direction, grid)

    pad = (-n) % LANES
    t_tiles = (n + pad) // LANES

    def comp(a, k, fill=0.0):
        v = a[:, k].astype(jnp.float32)
        if pad:
            v = jnp.concatenate([v, jnp.full((pad,), fill, jnp.float32)])
        return v.reshape(t_tiles, 8, 128)

    o_cells = clipped / float(grid.brick_size)
    comps = [comp(o_cells, 0), comp(o_cells, 1), comp(o_cells, 2),
             comp(direction, 0, 1.0), comp(direction, 1, 1.0),
             comp(direction, 2, 1.0)]
    act = ok.astype(jnp.int32)
    if pad:
        act = jnp.concatenate([act, jnp.zeros((pad,), jnp.int32)])
    comps.append(act.reshape(t_tiles, 8, 128))

    with_slots = slot_tables is not None
    kernel = _make_kernel(grid, k_segments=k_segments,
                          max_page_rounds=max_page_rounds,
                          march_steps=march_steps,
                          transit_iters=transit_iters,
                          nr4=pscene.sc_dist.shape[0],
                          with_slots=with_slots)
    tile = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    ktile = pl.BlockSpec((1, k_segments, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    K = k_segments
    kt_i32 = jax.ShapeDtypeStruct((t_tiles, K, 8, 128), jnp.int32)
    kt_f32 = jax.ShapeDtypeStruct((t_tiles, K, 8, 128), jnp.float32)
    t_i32 = jax.ShapeDtypeStruct((t_tiles, 8, 128), jnp.int32)
    out_sd = [kt_i32, kt_f32, kt_i32] \
        + ([kt_i32] if with_slots else []) + [t_i32, t_i32]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]      # sc_dist
    inputs = [pscene.sc_dist]
    if with_slots:
        slotmeta, base_pack = slot_tables
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # base_pack
        inputs.append(base_pack)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # meta (HBM)
    inputs.append(pscene.meta)
    if with_slots:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # slotmeta (HBM)
        inputs.append(slotmeta)
    scratch = [pltpu.VMEM((16, 128), jnp.int32)]
    if with_slots:
        scratch.append(pltpu.VMEM((16, 128), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA(()))
    if with_slots:
        scratch.append(pltpu.SemaphoreType.DMA(()))
    outs = pl.pallas_call(
        kernel,
        grid=(t_tiles,),
        in_specs=in_specs + [tile] * 7,
        out_specs=[ktile, ktile, ktile]
        + ([ktile] if with_slots else []) + [tile, tile],
        out_shape=out_sd,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs, *comps)
    if with_slots:
        cells, nd, ncode, slot, count, exh = outs
    else:
        cells, nd, ncode, count, exh = outs
        slot = None

    if tiled:
        out = dict(cells=cells, nd=nd, ncode=ncode, count=count,
                   tminn=tminn, entry_normal=entry_normal, o_cells=o_cells,
                   exhausted=exh)
        if with_slots:
            out["slot"] = slot
        return out

    def unpad_k(a):
        return a.transpose(0, 2, 3, 1).reshape(-1, K)[:n]

    def unpad(a):
        return a.reshape(-1)[:n]

    out = dict(
        cells=unpad_k(cells),
        nd=unpad_k(nd),
        ncode=unpad_k(ncode),
        count=unpad(count),
        tminn=tminn,
        entry_normal=entry_normal,
        o_cells=o_cells,
        exhausted=unpad(exh) != 0,
    )
    if with_slots:
        out["slot"] = unpad_k(slot)
    return out
