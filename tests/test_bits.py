"""Bit-format unit tests (index words, brick bitmasks, LoD bytes)."""

import jax.numpy as jnp
import numpy as np

from brickmap_tpu import bits
from brickmap_tpu.config import (
    BRICK_LOADED_BIT,
    BRICK_REQUESTED_BIT,
    BRICK_UNLOADED_BIT,
)


def test_pack_unpack_roundtrip(rng):
    slots = rng.integers(0, 4096, size=100).astype(np.uint32)
    lods = rng.integers(0, 256, size=100).astype(np.uint32)
    w = bits.pack_index_word(slots, lods, loaded=True)
    assert w.dtype == np.uint32
    np.testing.assert_array_equal(bits.index_slot(w), slots.astype(np.int32))
    np.testing.assert_array_equal(bits.index_lod_byte(w), lods.astype(np.int32))
    assert bits.index_is_loaded(w).all()
    assert not bits.index_is_unloaded(w).any()
    assert not bits.index_is_requested(w).any()


def test_flag_bits_match_reference_values():
    # variables.h:31-33
    assert BRICK_LOADED_BIT == 0x80000000
    assert BRICK_UNLOADED_BIT == 0x40000000
    assert BRICK_REQUESTED_BIT == 0x20000000
    w = bits.pack_index_word(
        np.uint32(5), np.uint32(0xAB), loaded=False, unloaded=True
    )
    assert int(w) == (0x40000000 | (0xAB << 12) | 5)


def test_pack_vector_flags():
    loaded = np.array([True, False])
    unloaded = np.array([False, True])
    w = bits.pack_index_word(
        np.zeros(2, np.uint32), np.zeros(2, np.uint32),
        loaded=loaded, unloaded=unloaded, requested=np.array([False, False]),
    )
    np.testing.assert_array_equal(bits.index_is_loaded(w), loaded)
    np.testing.assert_array_equal(bits.index_is_unloaded(w), unloaded)


def test_brick_words_roundtrip(rng):
    dense = rng.random((3, 8, 8, 8)) < 0.3
    words = bits.brick_words_from_dense(dense)
    assert words.shape == (3, 16)
    back = bits.dense_from_brick_words(words)
    np.testing.assert_array_equal(back, dense)


def test_voxel_bit_matches_reference_linearization(rng):
    """Bit index must be x + 8y + 64z (Scene.cpp:91-93)."""
    dense = np.zeros((8, 8, 8), bool)  # [z, y, x]
    dense[3, 2, 5] = True  # z=3, y=2, x=5
    words = bits.brick_words_from_dense(dense[None])[0]
    linear = 5 + 2 * 8 + 3 * 64
    assert (int(words[linear // 32]) >> (linear % 32)) & 1 == 1
    assert bool(
        bits.test_voxel_bit(words[None], np.array([5]), np.array([2]), np.array([3]))[0]
    )
    assert not bool(
        bits.test_voxel_bit(words[None], np.array([5]), np.array([2]), np.array([4]))[0]
    )


def test_lod_byte(rng):
    dense = np.zeros((8, 8, 8), bool)  # [z, y, x]
    # Occupy only the (hx=1, hy=0, hz=1) octant -> bit 1 + 4 = 5.
    dense[4:, :4, 4:] = rng.random((4, 4, 4)) < 0.5
    dense[5, 1, 6] = True  # ensure non-empty
    byte = bits.lod_byte_from_dense(dense[None])[0]
    assert int(byte) == 1 << 5


def test_lod_byte_full():
    dense = np.ones((2, 8, 8, 8), bool)
    np.testing.assert_array_equal(bits.lod_byte_from_dense(dense), [255, 255])


def test_jnp_polymorphism(rng):
    dense = jnp.asarray(rng.random((2, 8, 8, 8)) < 0.5)
    words = bits.brick_words_from_dense(dense)
    assert isinstance(words, jnp.ndarray)
    back = bits.dense_from_brick_words(words)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(dense))
    lod = bits.lod_byte_from_dense(dense)
    assert lod.shape == (2,)
