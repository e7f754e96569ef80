"""Scalar reference DDA — the correctness oracle.

A deliberately slow, straight-line NumPy/python transcription of the reference
traversal semantics (``/root/reference/src/voxel.cuh``):

* ``intersect_aabb``  — branchless slab clip + analytic entry normal
  (voxel.cuh:13-24, applied at voxel.cuh:137-155).
* ``intersect_byte``  — 2x2x2 DDA over the 8-bit LoD mask (voxel.cuh:26-77).
* ``intersect_brick`` — 8x8x8 DDA over the 512-bit brick mask (voxel.cuh:79-133).
* ``intersect_voxel`` — top-level DDA over the brick grid with LoD-by-distance
  and streaming-request emission (voxel.cuh:135-261).

Everything is float32 to match device numerics.  This module is used only by
tests and tiny renders; the production path is :mod:`brickmap_tpu.ops.traverse`
(vectorized XLA) and :mod:`brickmap_tpu.pallas` (fused kernels).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import (
    BRICK_FLAG_BITS,
    BRICK_INDEX_BITS,
    BRICK_LOADED_BIT,
    BRICK_LOD_SHIFT,
    BRICK_UNLOADED_BIT,
    GridConfig,
)

F = np.float32
BIG = F(1_000_000.0)


@dataclass
class HitResult:
    hit: bool
    distance: float
    normal: np.ndarray          # float32 [3]
    request: tuple | None = None  # brick-grid (x, y, z) needing residency


def _trunc3(v):
    return np.trunc(v).astype(np.int64)


def _sign3(v):
    return np.sign(v).astype(F)


def _dda_setup(origin, direction, extent):
    """Common Amanatides–Woo setup: pos, cb, out, step, rdinv, tmax, tdelta."""
    pos = _trunc3(origin)
    cb = np.where(direction > 0, pos + 1, pos).astype(F)
    out = np.where(direction > 0, np.asarray(extent, np.int64), -1)
    step = _sign3(direction)
    with np.errstate(divide="ignore"):
        rdinv = np.where(direction == 0, F(0), F(1) / direction).astype(F)
    tmax = np.where(direction != 0, (cb - origin) * rdinv, BIG).astype(F)
    tdelta = (step * rdinv).astype(F)
    return pos, out, step, rdinv, tmax, tdelta


def _axis_select(tmax):
    """Reference step-axis priority (voxel.cuh:249-253): x if strictly smallest,
    else y if <= x and < z, else z."""
    if tmax[0] < tmax[1]:
        return 0 if tmax[0] < tmax[2] else 2
    return 1 if tmax[1] < tmax[2] else 2


def intersect_aabb(origin, direction, box_max):
    """Slab test; returns (hit, tmin). Mirrors voxel.cuh:13-24."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (F(0) - origin) / direction
        t2 = (np.asarray(box_max, F) - origin) / direction
    tmin3 = np.fmin(t1, t2)
    tmax3 = np.fmax(t1, t2)
    tmin = max(max(tmin3[0], F(0)), max(tmin3[1], tmin3[2]))
    return bool(np.min(tmax3) > tmin), F(tmin)


def _sub_dda(origin, direction, occupancy_fn, extent, normal_in):
    """Shared inner DDA (intersect_byte / intersect_brick bodies).

    ``occupancy_fn(pos)`` tests the (modded) local cell.  Returns
    (hit, normal, local_distance); on a step_axis==-1 hit the caller's entry
    normal survives and distance is 0 (voxel.cuh:58-63, 114-119).
    """
    pos, out, step, _, tmax, tdelta = _dda_setup(origin, direction, extent)
    # C++ trunc-mod (operands non-negative in practice).
    pos = np.fmod(pos, extent).astype(np.int64)

    normal = normal_in.copy()
    distance = F(0)
    axis = -1
    for _ in range(3 * extent + 1):
        if occupancy_fn(pos):
            if axis > -1:
                normal = np.zeros(3, F)
                normal[axis] = -step[axis]
                distance = tmax[axis] - tdelta[axis]
            return True, normal, distance
        axis = _axis_select(tmax)
        mask = np.zeros(3, F)
        mask[axis] = 1
        pos = pos + (mask * step).astype(np.int64)
        if pos[axis] == out[axis]:
            break
        tmax = tmax + mask * tdelta
    return False, normal_in, F(0)


def intersect_byte(origin, direction, byte, normal_in):
    """2x2x2 DDA over an 8-bit mask; bit = x + 2y + 4z (voxel.cuh:26-77)."""

    def occ(pos):
        return bool((byte >> int(pos[0] + pos[1] * 2 + pos[2] * 4)) & 1)

    return _sub_dda(origin, direction, occ, 2, normal_in)


def intersect_brick(origin, direction, words, normal_in, brick_size=8):
    """8x8x8 DDA over 512 occupancy bits (voxel.cuh:79-133)."""

    def occ(pos):
        linear = int(pos[0] + pos[1] * brick_size + pos[2] * brick_size ** 2)
        return bool((int(words[linear // 32]) >> (linear % 32)) & 1)

    return _sub_dda(origin, direction, occ, brick_size, normal_in)


def intersect_voxel(origin, direction, scene, grid: GridConfig,
                    camera_brick_pos, emit_requests: bool = True) -> HitResult:
    """Hierarchical traversal with LoD + residency (voxel.cuh:135-261).

    ``scene``: host-side arrays (index_volume [CZ,CY,CX] uint32, pool_words
    [P,16] uint32, pool_base [S] int32).  ``camera_brick_pos``: int [3] camera
    position // 8 (kernel.cu:418 passes camera.position / 8 as ivec3).
    """
    origin = np.asarray(origin, F).copy()
    direction = np.asarray(direction, F)
    cam = np.asarray(camera_brick_pos, np.int64)
    eps = F(grid.epsilon)
    normal = np.zeros(3, F)

    ok, tminn = intersect_aabb(origin, direction, grid.world_max)
    if not ok:
        return HitResult(False, 0.0, normal)

    if tminn > 0:
        # Analytic entry-face normal + nudge inside (voxel.cuh:142-155).
        origin = origin + direction * tminn
        gs, gh = F(grid.grid_size), F(grid.grid_height)
        scale = np.array([gh / gs, gh / gs, F(1)], F)
        center = np.array([gs / 2, gs / 2, gh / 2], F)
        to_center = np.abs(center - origin) * scale
        signs = _sign3(origin - center)
        to_center = to_center / np.max(to_center)
        normal = signs * np.trunc(to_center + F(1e-6))
        origin = origin - normal * eps

    origin = origin / F(grid.brick_size)
    pos, out, step, _, tmax, tdelta = _dda_setup(
        origin, direction,
        np.array([grid.cells, grid.cells, grid.cells_height]))

    # AABB false-positives on touching faces (voxel.cuh:160-163).
    if (pos[0] < 0 or pos[0] >= grid.cells or pos[1] < 0
            or pos[1] >= grid.cells or pos[2] < 0
            or pos[2] >= grid.cells_height):
        return HitResult(False, 0.0, normal)

    iv = scene.index_volume
    s = grid.supergrid_cell_size
    axis = -1
    for _ in range(4 * (grid.cells + grid.cells + grid.cells_height)):
        word = int(iv[pos[2], pos[1], pos[0]])
        # Occupied iff a residency flag is set (the reference tests `if(index)`,
        # voxel.cuh:200; empty cells here carry skip-distance bits instead).
        if word & BRICK_FLAG_BITS:
            if axis != -1:
                normal = np.zeros(3, F)
                normal[axis] = -step[axis]
                nd = tmax[axis] - tdelta[axis]
            else:
                nd = F(0)

            diff = cam - pos
            d2 = int(diff[0] ** 2 + diff[1] ** 2 + diff[2] ** 2)

            if d2 > grid.lod_distance_8:
                return HitResult(True, float(nd * 8 + tminn), normal)
            if d2 > grid.lod_distance_2:
                byte = (word >> BRICK_LOD_SHIFT) & 0xFF
                hit, normal2, sub = intersect_byte(
                    (origin + direction * nd) * F(2) - normal * F(0.2) * eps,
                    direction, byte, normal)
                if hit:
                    return HitResult(True, float(nd * 8 + sub * 4 + tminn),
                                     normal2)
            elif word & BRICK_LOADED_BIT:
                sc_id = (pos[0] // s + (pos[1] // s) * grid.supergrid_xy
                         + (pos[2] // s) * grid.supergrid_xy ** 2)
                gslot = int(scene.pool_base[sc_id]) + (word & BRICK_INDEX_BITS)
                hit, normal2, sub = intersect_brick(
                    (origin + direction * nd) * F(8) - normal * eps,
                    direction, scene.pool_words[gslot], normal)
                if hit:
                    return HitResult(True, float(nd * 8 + sub + tminn), normal2)
            elif word & BRICK_UNLOADED_BIT:
                req = (int(pos[0]), int(pos[1]), int(pos[2])) \
                    if emit_requests else None
                return HitResult(True, float(nd * 8 + tminn), normal,
                                 request=req)

        axis = _axis_select(tmax)
        mask = np.zeros(3, F)
        mask[axis] = 1
        pos = pos + (mask * step).astype(np.int64)
        if pos[axis] == out[axis]:
            break
        tmax = tmax + mask * tdelta
    return HitResult(False, 0.0, normal)
