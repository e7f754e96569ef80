"""Vectorized hierarchical DDA traversal for ray batches.

TPU-native redesign of the reference's per-thread nested traversal
(``voxel.cuh:135-261``).  Instead of SIMT threads with divergent nested loops,
all rays advance in lockstep through ONE ``lax.while_loop``; each ray carries a
``level`` state:

* level 0 — top DDA over the brick grid (voxel.cuh:192-259)
* level 1 — 2x2x2 DDA over the index word's LoD byte (voxel.cuh:26-77)
* level 2 — 8x8x8 DDA over brick occupancy bits (voxel.cuh:79-133)

The reference's commented-out "restartless" experiment (voxel.cuh:272-479) had
the same motivation; here it is the natural formulation, because a vectorized
nested loop would run every inner iteration for every lane.  Each iteration does
exactly one cell test + one step per ray, at whatever level the ray is in, with
two O(N) gathers (index word, brick word) that XLA lowers to efficient dynamic
gathers on TPU.

Numerics, tie-breaking, LoD selection, epsilon offsets, and the streaming
request path match the scalar oracle (:mod:`brickmap_tpu.ops.dda_ref`) —
property-tested against it ray-for-ray.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import (
    BRICK_INDEX_BITS,
    BRICK_LOADED_BIT,
    BRICK_LOD_SHIFT,
    BRICK_UNLOADED_BIT,
    GridConfig,
)

BIG = 1_000_000.0

__all__ = ["trace_rays", "aabb_clip"]


def _sel_axis(tmax):
    """Reference step-axis priority (voxel.cuh:249): x iff strictly smallest,
    else y iff y<=x and y<z, else z.  tmax: [N, 3] -> [N] int32."""
    tx, ty, tz = tmax[:, 0], tmax[:, 1], tmax[:, 2]
    return jnp.where(
        tx < ty,
        jnp.where(tx < tz, 0, 2),
        jnp.where(ty < tz, 1, 2),
    ).astype(jnp.int32)


def _onehot3(axis):
    return (jnp.arange(3, dtype=jnp.int32)[None, :] == axis[:, None])


def _take_axis(v, axis):
    """v: [N, 3], axis: [N] -> v[n, axis[n]]."""
    return jnp.take_along_axis(v, axis[:, None], axis=1)[:, 0]


def aabb_clip(origin, direction, grid: GridConfig):
    """Slab clip + analytic entry-face normal (voxel.cuh:13-24, 142-155).

    Returns (inside_hit, tminn, clipped_origin, entry_normal); origins advanced
    to the entry point and nudged inside by epsilon when starting outside.
    """
    box_max = jnp.asarray(grid.world_max, jnp.float32)
    with jax.numpy_dtype_promotion("standard"):
        t1 = (0.0 - origin) / direction
        t2 = (box_max[None, :] - origin) / direction
    tmin3 = jnp.minimum(t1, t2)
    tmax3 = jnp.maximum(t1, t2)
    tminn = jnp.maximum(
        jnp.maximum(tmin3[:, 0], 0.0), jnp.maximum(tmin3[:, 1], tmin3[:, 2])
    ).astype(jnp.float32)
    hit = jnp.min(tmax3, axis=1) > tminn

    outside = tminn > 0
    adv = origin + direction * tminn[:, None]
    gs, gh = float(grid.grid_size), float(grid.grid_height)
    scale = jnp.asarray([gh / gs, gh / gs, 1.0], jnp.float32)
    center = jnp.asarray([gs / 2, gs / 2, gh / 2], jnp.float32)
    to_center = jnp.abs(center - adv) * scale
    signs = jnp.sign(adv - center)
    to_center = to_center / jnp.max(to_center, axis=1, keepdims=True)
    entry_normal = signs * jnp.trunc(to_center + 1e-6)
    entry_normal = jnp.where(outside[:, None], entry_normal, 0.0)

    clipped = jnp.where(
        outside[:, None], adv - entry_normal * grid.epsilon, origin
    )
    return hit, tminn, clipped, entry_normal


def _dda_init(origin, direction, rdinv):
    """pos, tmax for a DDA whose cells have unit size in ``origin``'s coords."""
    pos = jnp.trunc(origin).astype(jnp.int32)
    cb = jnp.where(direction > 0, pos.astype(jnp.float32) + 1.0,
                   pos.astype(jnp.float32))
    tmax = jnp.where(direction != 0.0, (cb - origin) * rdinv,
                     jnp.float32(BIG))
    return pos, tmax


@partial(jax.jit, static_argnames=("grid", "max_iters", "use_lod"))
def trace_rays(origin, direction, index_volume, pool_words, pool_base,
               camera_brick_pos, grid: GridConfig, max_iters: int = 4096,
               use_lod: bool = True):
    """Trace a batch of rays through the two-level sparse grid.

    Args:
      origin, direction: float32 [N, 3] world-space rays (direction need not be
        normalized — same contract as the reference).
      index_volume: uint32 [CZ, CY, CX] packed index words.
      pool_words: uint32 [P, cell_members] linear brick pool.
      pool_base: int32 [num_superchunks] segment base offsets.
      camera_brick_pos: int32 [3] camera position // brick_size (LoD origin).
      max_iters: static bound on total per-ray iterations.
      use_lod: if False, distance-based LoD is disabled (always finest).

    Returns a dict: hit [N] bool, t [N] f32 (world units), normal [N, 3] f32,
    request [N] bool + request_pos [N, 3] i32 (bricks needing residency),
    iters [] i32 (loop iterations executed).
    """
    n = origin.shape[0]
    f32, i32 = jnp.float32, jnp.int32
    eps = jnp.float32(grid.epsilon)
    cells = jnp.asarray([grid.cells, grid.cells, grid.cells_height], i32)
    s = grid.supergrid_cell_size

    ok, tminn, clipped, entry_normal = aabb_clip(origin, direction, grid)

    # Brick-grid space (voxel.cuh:157).
    o_brick = clipped / float(grid.brick_size)
    d = direction.astype(f32)
    step_f = jnp.sign(d)
    step_i = step_f.astype(i32)
    rdinv = jnp.where(d == 0.0, 0.0, 1.0 / d).astype(f32)
    tdelta = step_f * rdinv

    pos0, tmax0 = _dda_init(o_brick, d, rdinv)
    out0 = jnp.where(d > 0, cells[None, :], -1).astype(i32)

    inside = jnp.all((pos0 >= 0) & (pos0 < cells[None, :]), axis=1)
    active = ok & inside

    cam = jnp.asarray(camera_brick_pos, i32)

    iv_flat = index_volume.reshape(-1)
    pw_flat = pool_words.reshape(-1)
    cx, cy = grid.cells, grid.cells

    state = dict(
        it=jnp.int32(0),
        active=active,
        level=jnp.zeros(n, i32),
        pos0=pos0, tmax0=tmax0,
        axis0=jnp.full(n, -1, i32),
        norm=entry_normal.astype(f32),       # current normal candidate
        nd=jnp.zeros(n, f32),                # top-level crossing t at descend
        poss=jnp.zeros((n, 3), i32),
        tmaxs=jnp.full((n, 3), BIG, f32),
        axs=jnp.full(n, -1, i32),
        gslot=jnp.zeros(n, i32),
        lodbyte=jnp.zeros(n, i32),
        hit=jnp.zeros(n, bool),
        t=jnp.zeros(n, f32),
        out_normal=jnp.zeros((n, 3), f32),
        request=jnp.zeros(n, bool),
        request_pos=jnp.zeros((n, 3), i32),
    )

    def cond(st):
        return jnp.logical_and(st["it"] < max_iters, jnp.any(st["active"]))

    def body(st):
        active = st["active"]
        level = st["level"]
        pos0, tmax0, axis0 = st["pos0"], st["tmax0"], st["axis0"]

        # ---- top-level cell fetch -------------------------------------
        pc = jnp.clip(pos0, 0, cells[None, :] - 1)
        flat0 = (pc[:, 2] * cy + pc[:, 1]) * cx + pc[:, 0]
        word = jnp.take(iv_flat, flat0, axis=0)
        is_top = (level == 0) & active
        occ0 = is_top & (word != 0)

        # Crossing t + face normal of the current top cell (voxel.cuh:200-206).
        entered = axis0 >= 0
        ax_safe = jnp.maximum(axis0, 0)
        nd_new = jnp.where(
            entered, _take_axis(tmax0, ax_safe) - _take_axis(tdelta, ax_safe),
            0.0)
        norm_step = -_onehot3(ax_safe).astype(f32) * _take_axis(step_f, ax_safe)[:, None]
        norm_top = jnp.where(entered[:, None], norm_step, st["norm"])

        # LoD by squared camera distance in brick units (voxel.cuh:208-215).
        diff = cam[None, :] - pos0
        d2 = jnp.sum(diff * diff, axis=1)
        if use_lod:
            far = d2 > grid.lod_distance_8
            mid = (~far) & (d2 > grid.lod_distance_2)
        else:
            far = jnp.zeros_like(occ0)
            mid = jnp.zeros_like(occ0)
        near = ~far & ~mid
        loaded = (word & jnp.uint32(BRICK_LOADED_BIT)) != 0
        unloaded = (word & jnp.uint32(BRICK_UNLOADED_BIT)) != 0

        hit_far = occ0 & far
        descend_byte = occ0 & mid
        descend_brick = occ0 & near & loaded
        hit_unloaded = occ0 & near & ~loaded & unloaded
        # occupied but neither loaded nor unloaded at near LoD: falls through
        # and steps onward (cannot happen for well-formed scenes).
        top_advance = is_top & ~(hit_far | descend_byte | descend_brick
                                 | hit_unloaded)

        # ---- sub-level occupancy test ---------------------------------
        is_sub = (level > 0) & active
        poss, tmaxs, axs = st["poss"], st["tmaxs"], st["axs"]
        lin_byte = poss[:, 0] + poss[:, 1] * 2 + poss[:, 2] * 4
        occ_byte = (st["lodbyte"] >> jnp.clip(lin_byte, 0, 7)) & 1
        lin_brick = (poss[:, 0] + poss[:, 1] * grid.brick_size
                     + poss[:, 2] * grid.brick_size ** 2)
        lin_brick = jnp.clip(lin_brick, 0, grid.brick_size ** 3 - 1)
        bword = jnp.take(
            pw_flat,
            st["gslot"] * grid.cell_members + lin_brick // 32,
            axis=0)
        occ_brick = (bword >> (lin_brick % 32).astype(jnp.uint32)) & 1
        occ_sub = jnp.where(level == 1, occ_byte != 0, occ_brick != 0) & is_sub

        sub_hit = occ_sub
        sub_advance = is_sub & ~occ_sub

        # ---- sub hit: distance/normal (voxel.cuh:58-63, 114-119) ------
        s_entered = axs >= 0
        s_ax = jnp.maximum(axs, 0)
        sub_t = jnp.where(
            s_entered, _take_axis(tmaxs, s_ax) - _take_axis(tdelta, s_ax), 0.0)
        s_norm_step = -_onehot3(s_ax).astype(f32) * _take_axis(step_f, s_ax)[:, None]
        sub_normal = jnp.where(s_entered[:, None], s_norm_step, st["norm"])
        sub_scale = jnp.where(level == 1, 4.0, 1.0).astype(f32)
        sub_hit_t = st["nd"] * grid.brick_size + sub_t * sub_scale + tminn

        # ---- sub step -------------------------------------------------
        s_axis = _sel_axis(tmaxs)
        s_onehot = _onehot3(s_axis)
        poss_n = poss + jnp.where(s_onehot, step_i, 0)
        sub_extent = jnp.where(level == 1, 2, grid.brick_size)
        s_out = jnp.where(d > 0, sub_extent[:, None], -1).astype(i32)
        s_exited = _take_axis(poss_n, s_axis) == _take_axis(s_out, s_axis)
        tmaxs_n = tmaxs + jnp.where(s_onehot, tdelta, 0.0)

        ascend = sub_advance & s_exited

        # ---- top step (empty cell, or sub-DDA exited) -----------------
        do_top_step = top_advance | ascend
        t_axis = _sel_axis(tmax0)
        t_onehot = _onehot3(t_axis)
        pos0_n = pos0 + jnp.where(t_onehot, step_i, 0)
        t_exited = _take_axis(pos0_n, t_axis) == _take_axis(out0, t_axis)
        tmax0_n = tmax0 + jnp.where(t_onehot, tdelta, 0.0)
        miss = do_top_step & t_exited

        # ---- descend setup --------------------------------------------
        # Byte level: origin*(2) - normal*0.2*eps (voxel.cuh:217);
        # brick level: origin*(8) - normal*eps (voxel.cuh:224).
        hitpoint = o_brick + d * nd_new[:, None]
        sub_o_byte = hitpoint * 2.0 - norm_top * (0.2 * eps)
        sub_o_brick = hitpoint * float(grid.brick_size) - norm_top * eps
        descend = descend_byte | descend_brick
        sub_o = jnp.where(descend_byte[:, None], sub_o_byte, sub_o_brick)
        poss_d, tmaxs_d = _dda_init(sub_o, d, rdinv)
        # C trunc-mod of the (possibly negative) local position.
        dext = jnp.where(descend_byte, 2, grid.brick_size)[:, None]
        poss_d = poss_d - (poss_d // dext) * dext  # floor-mod
        # floor-mod == trunc-mod for non-negative pos; negative pos only occurs
        # epsilon-outside the grid where the cell test fails either way.

        sc_id = (pos0[:, 0] // s + (pos0[:, 1] // s) * grid.supergrid_xy
                 + (pos0[:, 2] // s) * grid.supergrid_xy ** 2)
        sc_id = jnp.clip(sc_id, 0, grid.num_superchunks - 1)
        gslot_d = (jnp.take(pool_base, sc_id, axis=0)
                   + (word & jnp.uint32(BRICK_INDEX_BITS)).astype(i32))

        # ---- merge state ----------------------------------------------
        terminal = hit_far | hit_unloaded | sub_hit
        new_hit = st["hit"] | terminal
        new_t = jnp.where(hit_far | hit_unloaded,
                          nd_new * grid.brick_size + tminn, st["t"])
        new_t = jnp.where(sub_hit, sub_hit_t, new_t)
        new_out_normal = jnp.where((hit_far | hit_unloaded)[:, None],
                                   norm_top, st["out_normal"])
        new_out_normal = jnp.where(sub_hit[:, None], sub_normal,
                                   new_out_normal)

        new_request = st["request"] | hit_unloaded
        new_request_pos = jnp.where(hit_unloaded[:, None], pos0,
                                    st["request_pos"])

        new_active = active & ~terminal & ~miss
        new_level = jnp.where(descend_byte, 1,
                              jnp.where(descend_brick, 2,
                                        jnp.where(ascend, 0, level)))

        new_pos0 = jnp.where(do_top_step[:, None], pos0_n, pos0)
        new_tmax0 = jnp.where(do_top_step[:, None], tmax0_n, tmax0)
        new_axis0 = jnp.where(do_top_step, t_axis, axis0)

        new_poss = jnp.where(descend[:, None], poss_d,
                             jnp.where(sub_advance[:, None], poss_n, poss))
        new_tmaxs = jnp.where(descend[:, None], tmaxs_d,
                              jnp.where(sub_advance[:, None], tmaxs_n, tmaxs))
        new_axs = jnp.where(descend, -1,
                            jnp.where(sub_advance, s_axis, axs))
        new_norm = jnp.where(descend[:, None], norm_top, st["norm"])
        new_nd = jnp.where(descend, nd_new, st["nd"])
        new_gslot = jnp.where(descend_brick, gslot_d, st["gslot"])
        new_lodbyte = jnp.where(
            descend_byte,
            ((word >> BRICK_LOD_SHIFT) & 0xFF).astype(i32), st["lodbyte"])

        return dict(
            it=st["it"] + 1,
            active=new_active, level=new_level,
            pos0=new_pos0, tmax0=new_tmax0, axis0=new_axis0,
            norm=new_norm, nd=new_nd,
            poss=new_poss, tmaxs=new_tmaxs, axs=new_axs,
            gslot=new_gslot, lodbyte=new_lodbyte,
            hit=new_hit, t=new_t, out_normal=new_out_normal,
            request=new_request, request_pos=new_request_pos,
        )

    final = jax.lax.while_loop(cond, body, state)
    return dict(
        hit=final["hit"],
        t=final["t"],
        normal=final["out_normal"],
        request=final["request"],
        request_pos=final["request_pos"],
        iters=final["it"],
    )
