"""Brick occupancy bit format and index-word packing.

Vectorized (NumPy + jnp polymorphic) implementations of the bit layouts shared by
every component:

* **Brick** = 512 occupancy bits packed into 16 uint32 words; bit index of voxel
  ``(x, y, z)`` inside its brick is ``x + 8*y + 64*z`` (reference
  ``Scene.cpp:91-93``, ``voxel.cuh:110-113``).
* **Index word** = ``[31 loaded | 30 unloaded | 29 requested | 19:12 lod | 11:0 slot]``
  (reference ``variables.h:29-33``; packed at ``Scene.cpp:104``, unpacked at
  ``voxel.cuh:217-224``).
* **LoD byte** = 8-bit 2x2x2 coarse occupancy; bit for half ``(hx, hy, hz)`` is
  ``hx + 2*hy + 4*hz`` (reference ``Scene.cpp:95``, ``voxel.cuh:57``).

All functions work on arrays of any shape and on both NumPy and JAX arrays.
"""

from __future__ import annotations

import numpy as np

from .config import (
    BRICK_INDEX_BITS,
    BRICK_LOADED_BIT,
    BRICK_LOD_BITS,
    BRICK_LOD_SHIFT,
    BRICK_REQUESTED_BIT,
    BRICK_UNLOADED_BIT,
)

__all__ = [
    "pack_index_word",
    "index_slot",
    "index_lod_byte",
    "index_is_loaded",
    "index_is_unloaded",
    "index_is_requested",
    "voxel_bit_position",
    "brick_words_from_dense",
    "dense_from_brick_words",
    "lod_byte_from_dense",
    "test_voxel_bit",
]


def _xp(a):
    """Return the array namespace (numpy or jax.numpy) of *a*."""
    if type(a).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


# ---------------------------------------------------------------------------
# Index words
# ---------------------------------------------------------------------------

def pack_index_word(slot, lod_byte, loaded=True, unloaded=False, requested=False):
    """Pack a 32-bit index word. Mirrors Scene.cpp:104 / Scene.cpp:160."""
    xp = _xp(slot)
    word = (
        (xp.asarray(slot).astype(xp.uint32) & xp.uint32(BRICK_INDEX_BITS))
        | ((xp.asarray(lod_byte).astype(xp.uint32) << BRICK_LOD_SHIFT)
           & xp.uint32(BRICK_LOD_BITS))
    )
    if isinstance(loaded, (bool, int)):
        flags = (
            (BRICK_LOADED_BIT if loaded else 0)
            | (BRICK_UNLOADED_BIT if unloaded else 0)
            | (BRICK_REQUESTED_BIT if requested else 0)
        )
        return word | xp.uint32(flags)
    flags = (
        xp.where(loaded, xp.uint32(BRICK_LOADED_BIT), xp.uint32(0))
        | xp.where(unloaded, xp.uint32(BRICK_UNLOADED_BIT), xp.uint32(0))
        | xp.where(requested, xp.uint32(BRICK_REQUESTED_BIT), xp.uint32(0))
    )
    return word | flags


def index_slot(word):
    """12-bit pool slot within the superchunk segment (voxel.cuh:224)."""
    xp = _xp(word)
    return (xp.asarray(word) & xp.uint32(BRICK_INDEX_BITS)).astype(xp.int32)


def index_lod_byte(word):
    """8-bit 2x2x2 LoD mask (voxel.cuh:217)."""
    xp = _xp(word)
    return ((xp.asarray(word) & xp.uint32(BRICK_LOD_BITS)) >> BRICK_LOD_SHIFT).astype(
        xp.int32
    )


def index_is_loaded(word):
    xp = _xp(word)
    return (xp.asarray(word) & xp.uint32(BRICK_LOADED_BIT)) != 0


def index_is_unloaded(word):
    xp = _xp(word)
    return (xp.asarray(word) & xp.uint32(BRICK_UNLOADED_BIT)) != 0


def index_is_requested(word):
    xp = _xp(word)
    return (xp.asarray(word) & xp.uint32(BRICK_REQUESTED_BIT)) != 0


# ---------------------------------------------------------------------------
# Brick occupancy bitmask
# ---------------------------------------------------------------------------

def voxel_bit_position(x, y, z, brick_size: int = 8):
    """(word, bit) of local voxel (x, y, z) within its brick (Scene.cpp:91-92)."""
    xp = _xp(x)
    linear = x + y * brick_size + z * brick_size * brick_size
    return linear // 32, linear % 32


def test_voxel_bit(words, x, y, z, brick_size: int = 8):
    """Occupancy test of local voxel (x,y,z) given the brick's [16] uint32 words.

    ``words`` has shape [..., cell_members]; x/y/z broadcast over the leading dims.
    Mirrors voxel.cuh:110-113.
    """
    xp = _xp(words)
    word_i, bit_i = voxel_bit_position(x, y, z, brick_size)
    w = xp.take_along_axis(
        words, xp.asarray(word_i)[..., None].astype(xp.int32), axis=-1
    )[..., 0]
    return (w >> bit_i.astype(xp.uint32)) & xp.uint32(1) != 0


def brick_words_from_dense(dense):
    """Pack dense bool occupancy [..., bz, by, bx] (z-major, like the reference's
    ``z*64 + y*8 + x`` linearization) into [..., cell_members] uint32 words."""
    xp = _xp(dense)
    b = dense.shape[-1]
    flat = dense.reshape(*dense.shape[:-3], b * b * b).astype(xp.uint32)
    words = flat.reshape(*flat.shape[:-1], b * b * b // 32, 32)
    shifts = (
        np.arange(32, dtype=np.uint32)
        if xp is np
        else xp.arange(32, dtype=xp.uint32)
    )
    return (words << shifts).sum(axis=-1).astype(xp.uint32)


def dense_from_brick_words(words, brick_size: int = 8):
    """Inverse of :func:`brick_words_from_dense`: [..., 16] -> [..., 8, 8, 8] bool
    (z, y, x order)."""
    xp = _xp(words)
    shifts = (
        np.arange(32, dtype=np.uint32)
        if xp is np
        else xp.arange(32, dtype=xp.uint32)
    )
    bits = (words[..., None] >> shifts) & xp.uint32(1)
    flat = bits.reshape(*words.shape[:-1], brick_size ** 3)
    return (flat != 0).reshape(
        *words.shape[:-1], brick_size, brick_size, brick_size
    )


def lod_byte_from_dense(dense):
    """8-bit 2x2x2 coarse mask from dense [..., 8, 8, 8] (z, y, x) occupancy.

    Bit for half-cell (hx, hy, hz) is ``hx + 2*hy + 4*hz`` (Scene.cpp:95).
    """
    xp = _xp(dense)
    b = dense.shape[-1]
    h = b // 2
    # [..., 2, h(z), 2, h(y), 2, h(x)] — split each axis into (half, within).
    r = dense.reshape(*dense.shape[:-3], 2, h, 2, h, 2, h)
    occ = r.any(axis=(-5, -3, -1))  # [..., hz, hy, hx]
    hz = occ.shape[-3]
    out = xp.zeros(dense.shape[:-3], dtype=xp.uint32)
    for z in range(2):
        for y in range(2):
            for x in range(2):
                bit = x + 2 * y + 4 * z
                out = out | (
                    occ[..., z, y, x].astype(xp.uint32) << xp.uint32(bit)
                )
    del hz
    return out
