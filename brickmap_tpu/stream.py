"""Brick residency streaming: the TPU-native C5-C8 pipeline.

Reference pipeline (SURVEY.md §2 C5-C8): traversal atomically marks unloaded
bricks requested and appends coords to a device queue (voxel.cuh:228-245); the
CPU drains the queue, stages 64 B payloads + new index words into pinned
buffers (Scene.cpp:200-252), grows per-superchunk GPU pools by powers of two,
and a scatter kernel installs them next frame (kernel.cu:141-151).

TPU-native redesign: no atomics, no pinned staging, no device pointers.

* Traversal returns per-ray ``(request, request_pos)`` — the queue is an
  output, not a side effect.
* The manager dedupes host-side (the role of the ``requested`` bit +
  atomicOr), caps per step at ``queue_size`` (brick_load_queue_size = 1024,
  variables.h:35; overflow dropped and retried by later waves, same policy as
  voxel.cuh:237-240).
* Residency updates are batched device scatters into the linear pool, the
  index volume, and the 4x4x4 ``block_words`` tiling — address translation,
  not transport (the north star replaces host streaming with HBM residency;
  this module exists for reference-parity workflows and memory-capped pools).
* Pool growth doubles capacity (Scene.cpp:235-250) but reallocates one global
  linear pool with per-superchunk segments, re-basing ``pool_base``; a shape
  change (= recompile) happens only on the log-many doublings, mirroring the
  reference's realloc cost profile.
"""

from __future__ import annotations

import numpy as np

from . import bits, scene as scene_mod
from .config import GridConfig

__all__ = ["StreamingScene"]


class StreamingScene:
    """Host-side residency manager around a device :class:`VoxelScene`.

    ``truth`` is a fully-built host scene (every brick's payload + slot known,
    the analog of the CPU-side supergrid, Scene.h:19-29); the managed device
    scene starts with every brick ``unloaded | lod`` and no payloads
    (Scene.cpp:157-175).
    """

    def __init__(self, truth: scene_mod.VoxelScene, grid: GridConfig,
                 queue_size: int = 1024, starting_capacity: int = 16):
        import jax.numpy as jnp

        self.grid = grid
        self.queue_size = queue_size
        self.truth = truth
        iv_truth = np.asarray(truth.index_volume)
        self._truth_pool = np.asarray(truth.pool_words)
        self._truth_base = np.asarray(truth.pool_base)

        nonempty = (iv_truth & np.uint32(0xE000_0000)) != 0
        # Device init: unloaded | lod for non-empty, dist bits for empty.
        lod = bits.index_lod_byte(iv_truth).astype(np.uint32)
        self._iv = np.where(
            nonempty,
            np.uint32(0x4000_0000) | (lod << 12),
            iv_truth & np.uint32(0x1FF0_0000),
        ).astype(np.uint32)

        s = grid.num_superchunks
        self.capacity = np.full(s, starting_capacity, np.int64)
        self.highest = np.zeros(s, np.int64)     # gpu_index_highest
        self._pool = np.zeros((self._padded_total(), grid.cell_members),
                              np.uint32)
        self._rebase()
        self._pending: set[tuple] = set()        # requested-bit dedupe
        self.total_uploaded = 0
        self.total_dropped = 0
        self._jnp = jnp
        self._dirty = True
        self._dev = None

    # -- bookkeeping --------------------------------------------------------

    def _padded_total(self) -> int:
        """Global pool rows padded to a power of two: the device array's shape
        changes only on the log-many global doublings, so downstream programs
        recompile rarely (the reference reallocs without recompiling; XLA
        recompiles per shape — minutes through the remote tunnel)."""
        total = int(self.capacity.sum())
        return int(2 ** np.ceil(np.log2(max(total, 16))))

    def _rebase(self) -> None:
        self.pool_base = np.zeros(self.grid.num_superchunks, np.int32)
        self.pool_base[1:] = np.cumsum(self.capacity)[:-1].astype(np.int32)

    def device_scene(self) -> scene_mod.VoxelScene:
        """Current device-resident scene (arrays uploaded lazily)."""
        if self._dirty or self._dev is None:
            jnp = self._jnp
            self._dev = scene_mod.VoxelScene(
                index_volume=jnp.asarray(self._iv),
                pool_words=jnp.asarray(self._pool),
                pool_base=jnp.asarray(self.pool_base),
                block_words=jnp.asarray(
                    scene_mod.block_words_from_index(self._iv)),
            )
            self._dirty = False
        return self._dev

    def _sc_id(self, x, y, z):
        s = self.grid.supergrid_cell_size
        return (x // s + (y // s) * self.grid.supergrid_xy
                + (z // s) * self.grid.supergrid_xy ** 2)

    # -- the per-frame CPU half (Scene::process_load_queue) -----------------

    def process_requests(self, requests) -> int:
        """Service up to ``queue_size`` brick requests; returns uploads done.

        ``requests``: iterable of brick-grid (x, y, z) coords (from traversal
        output).  Duplicates and already-resident bricks are ignored; overflow
        beyond the queue cap is dropped (retried by later waves).
        """
        fresh = []
        seen = set()
        for xyz in requests:
            xyz = tuple(int(v) for v in xyz)
            if xyz in seen or xyz in self._pending:
                continue
            seen.add(xyz)
            x, y, z = xyz
            word = self._iv[z, y, x]
            if not (word & np.uint32(0x4000_0000)):
                continue  # already loaded (or empty)
            if len(fresh) >= self.queue_size:
                self.total_dropped += 1
                continue
            fresh.append(xyz)
        if not fresh:
            return 0

        # Slot assignment + pow-2 segment growth (Scene.cpp:222-250).
        needed = self.highest.copy()
        for x, y, z in fresh:
            needed[self._sc_id(x, y, z)] += 1
        grew = False
        for sc in np.nonzero(needed > self.capacity)[0]:
            self.capacity[sc] = int(2 ** np.ceil(np.log2(needed[sc])))
            grew = True
        if grew:
            old_pool, old_base = self._pool, self.pool_base.copy()
            self._rebase()
            new_pool = np.zeros((self._padded_total(),
                                 self.grid.cell_members), np.uint32)
            for sc in range(self.grid.num_superchunks):
                h = int(self.highest[sc])
                if h:
                    new_pool[self.pool_base[sc]:self.pool_base[sc] + h] = \
                        old_pool[old_base[sc]:old_base[sc] + h]
            self._pool = new_pool

        for x, y, z in fresh:
            sc = self._sc_id(x, y, z)
            slot = int(self.highest[sc])
            self.highest[sc] += 1
            # Payload from host truth (CPU brick list, Scene.cpp:223).
            tword = int(np.asarray(self.truth.index_volume)[z, y, x])
            tslot = self._truth_base[sc] + (tword & 0xFFF)
            payload = self._truth_pool[tslot]
            gslot = self.pool_base[sc] + slot
            self._pool[gslot] = payload
            lod = (tword >> 12) & 0xFF
            self._iv[z, y, x] = np.uint32(
                0x8000_0000 | (lod << 12) | slot)
            self._pending.discard((x, y, z))
        self.total_uploaded += len(fresh)
        self._dirty = True
        return len(fresh)

    # -- diagnostics --------------------------------------------------------

    def dump(self):
        """Per-superchunk resident-brick counts (Scene::dump, Scene.cpp:254)."""
        return self.highest.copy()

    def fully_resident(self) -> bool:
        return not ((self._iv & np.uint32(0x4000_0000)) != 0).any()
