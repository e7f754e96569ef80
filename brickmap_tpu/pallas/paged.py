"""Paged scene layout for the hierarchical Pallas traversal kernel.

The reference GPU walks a pointer table per superchunk and streams bricks
CPU->GPU on demand (``Scene.h:9-17``, ``Scene.cpp:200-252``).  The TPU-native
equivalent keeps everything HBM-resident and reorganizes the scene around the
*superchunk page* (16^3 brick cells) as the unit of on-chip locality:

* ``meta``   int32 [S, 16, 128] — one 8 KB row per page, DMA'd HBM->VMEM by
  the kernel when the page is voted:

  - row 0: occupancy bit per cell (any residency flag, the traversal's
    `if (index)` test, voxel.cuh:200) — in-page DDA tests are one lane-gather
    from this row (~0.1 us per 1024-ray step, notes/PERF.md round 2);
  - row 1: `loaded` flag bit-plane (streaming residency);
  - rows 2-9: per-cell 2x2x2 LoD byte (index-word bits 19:12,
    variables.h:30), 4 packed per word;
  - rows 10-13: per-cell Chebyshev empty-space-skip distance, 4-bit
    nibbles 8-per-word (0 = occupied/test-the-bit, d>=1 = all cells within
    L-inf (d-1) are empty) — in-page ESS for the march;
  - rows 14-15: reserved (tile alignment).

* ``poolT``  bfloat16 [S, 64, 4096] — per-CELL brick payloads, transposed:
  rows 4k..4k+3 hold the four bytes (LSB first) of occupancy word k for every
  cell.  Bytes (<= 255) are exact in bf16 and bf16 x bf16 -> f32 is the MXU's
  native mode, so the kernel's one-hot fetch is lossless (wider integers
  would round on the systolic array).  Cell-indexed, not slot-indexed: no
  slot/pool_base indirection, no per-lane HBM gathers.  Empty/unloaded cells
  are zero rows.  Full 4096^2x512 world: 2.1 GB of HBM.

* ``sc_dist`` int32 [NR4, 8, 128] — page-level Chebyshev distance to the
  nearest non-empty page (0 for non-empty), packed 1024 pages per register
  for the kernel's arb-gather.  Page-granular empty-space skipping: rays
  cross empty superchunks without touching page data.

Memory: the full 4096^2x512 world expands to ~2.1 GB of HBM (poolT) + 128 MB
of meta — the TPU-native trade replacing the reference's CPU->GPU transport
with address translation + bulk DMA (SURVEY.md section 7).

Page id convention matches the oracle (dda_ref.intersect_voxel / Scene.cpp:197):
``sc = qx + qy * supergrid_xy + qz * supergrid_xy**2`` with q = cell // 16.
In-page cell linearization is ``lin = (lz*16 + ly)*16 + lx`` (x fastest).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from ..config import (
    BRICK_DIST_MASK,
    BRICK_DIST_SHIFT,
    BRICK_FLAG_BITS,
    BRICK_INDEX_BITS,
    BRICK_LOADED_BIT,
    BRICK_LOD_SHIFT,
    GridConfig,
)

Array = Any

__all__ = ["PagedScene", "build_paged_scene", "build_paged_scene_device",
           "build_slot_tables", "check_paged_geometry"]


def check_paged_geometry(grid: GridConfig) -> None:
    """The page-major layout (and the kernels + streaming scatters that
    consume it) hardwires the default geometry: 16^3-cell pages (one page's
    occupancy plane == exactly one 128-word register row) and 8^3-voxel
    bricks (16 occupancy words -> 64 byte-rows of ``poolT``).  Any other
    geometry must fail loudly here rather than silently corrupt the packed
    planes downstream (VERDICT r4 weak #5)."""
    if grid.supergrid_cell_size != 16:
        raise ValueError(
            f"paged layout requires supergrid_cell_size == 16 "
            f"(got {grid.supergrid_cell_size}); use the XLA engine for "
            f"non-default page geometry")
    if grid.brick_size != 8:
        raise ValueError(
            f"paged layout requires brick_size == 8 "
            f"(got {grid.brick_size}); use the XLA engine for "
            f"non-default brick geometry")


@dataclass(frozen=True)
class PagedScene:
    """Page-major scene tables (a JAX pytree; see module docstring)."""

    meta: Array       # int32 [S, 16, 128] (bit patterns; int32 keeps
                      #   every in-kernel shift/mask single-dtype — mixed
                      #   u32>>i32 shifts miscompile on Mosaic)
    poolT: Array      # bfloat16 [S, 64, 4096] (bytes of words)
    sc_dist: Array    # int32 [NR4, 8, 128]

    def tree_flatten(self):
        return ((self.meta, self.poolT, self.sc_dist), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_pages(self) -> int:
        return self.meta.shape[0]


def _register_pytree() -> None:
    import jax

    jax.tree_util.register_pytree_node(
        PagedScene, PagedScene.tree_flatten, PagedScene.tree_unflatten)


_register_pytree()


def build_paged_scene(scene, grid: GridConfig,
                      include_pool: bool = True) -> PagedScene:
    """Expand a :class:`~brickmap_tpu.scene.VoxelScene` into page-major tables.

    Pure NumPy; one-time per scene (incremental residency updates go through
    :mod:`brickmap_tpu.stream` device scatters afterwards).
    ``include_pool=False`` skips the host ``poolT`` expansion (2.1 GB for the
    full world) for callers that build it on device instead
    (:func:`build_paged_scene_device`).
    """
    from ..scene import chebyshev_distance_field

    check_paged_geometry(grid)
    s = grid.supergrid_cell_size
    iv = np.asarray(scene.index_volume)          # [CZ, CY, CX] uint32
    pool = np.asarray(scene.pool_words)          # [P, 16] uint32
    pool_base = np.asarray(scene.pool_base)      # [S]
    cz, cy, cx = iv.shape
    sx = grid.supergrid_xy
    S = grid.num_superchunks
    pc = s ** 3                                   # cells per page (4096)
    cm = grid.cell_members                        # 16

    zz, yy, xx = np.meshgrid(np.arange(cz), np.arange(cy), np.arange(cx),
                             indexing="ij")
    sc = (xx // s) + (yy // s) * sx + (zz // s) * sx * sx
    lin = ((zz % s) * s + (yy % s)) * s + (xx % s)
    scf, linf = sc.ravel(), lin.ravel()

    occ = ((iv & np.uint32(BRICK_FLAG_BITS)) != 0).ravel()
    loaded = ((iv & np.uint32(BRICK_LOADED_BIT)) != 0).ravel()

    meta = np.zeros((S, 16, 128), np.uint32)

    def bitplane(row: int, mask: np.ndarray) -> None:
        np.bitwise_or.at(
            meta[:, row, :], (scf[mask], linf[mask] >> 5),
            np.uint32(1) << (linf[mask] & 31).astype(np.uint32))

    bitplane(0, occ)
    bitplane(1, loaded)

    lodb = ((iv >> BRICK_LOD_SHIFT) & np.uint32(0xFF)).ravel()
    lodrows = np.zeros((S, pc // 4), np.uint32)
    np.bitwise_or.at(
        lodrows, (scf, linf >> 2),
        lodb.astype(np.uint32) << ((linf & 3) * 8).astype(np.uint32))
    meta[:, 2:10, :] = lodrows.reshape(S, 8, 128)

    # Rows 10-13: per-cell Chebyshev empty-space-skip distance as 4-bit
    # nibbles, 8 per word — the XLA path's index-word ESS (bits 28:20)
    # brought into the page so the in-page march jumps empty runs instead
    # of stepping cell-by-cell.  0 = occupied (or unknown: test the bit),
    # d>=1 = every cell within L-inf (d-1) is empty; clamped to 15.
    dist = ((iv & np.uint32(BRICK_DIST_MASK))
            >> np.uint32(BRICK_DIST_SHIFT)).astype(np.int64).ravel()
    dist = np.where(occ, 0, np.minimum(dist, 15)).astype(np.uint32)
    distrows = np.zeros((S, pc // 8), np.uint32)
    np.bitwise_or.at(distrows, (scf, linf >> 3),
                     dist << ((linf & 7) * 4).astype(np.uint32))
    meta[:, 10:14, :] = distrows.reshape(S, 4, 128)

    poolT = None
    if include_pool:
        # Cell-indexed transposed brick payloads as bytes in bf16 (exact).
        import ml_dtypes

        poolT = np.zeros((S, 4 * cm, pc), ml_dtypes.bfloat16)
        gslot = (pool_base[scf[loaded]]
                 + (iv.ravel()[loaded] & np.uint32(BRICK_INDEX_BITS))
                 .astype(np.int64))
        words = pool[gslot]                           # [M, 16] uint32
        for b in range(4):
            poolT[scf[loaded], b::4, linf[loaded]] = \
                ((words >> (8 * b)) & np.uint32(0xFF)).astype(
                    ml_dtypes.bfloat16)

    # Page-level Chebyshev distance (empty-space skipping across superchunks).
    page_occ = occ.reshape(cz, cy, cx).reshape(
        cz // s, s, cy // s, s, cx // s, s).any(axis=(1, 3, 5))
    dist3 = chebyshev_distance_field(page_occ, cap=255)
    sc_dist = np.zeros(S, np.int32)
    qz, qy, qx = np.meshgrid(np.arange(cz // s), np.arange(cy // s),
                             np.arange(cx // s), indexing="ij")
    sc_dist[qx.ravel() + qy.ravel() * sx + qz.ravel() * sx * sx] = \
        dist3.ravel()
    nr4 = -(-S // 1024)
    sc_dist = np.pad(sc_dist, (0, nr4 * 1024 - S)).reshape(nr4, 8, 128)

    return PagedScene(meta=meta.view(np.int32), poolT=poolT,
                      sc_dist=sc_dist)


def build_slot_tables(scene, grid: GridConfig) -> tuple[np.ndarray, np.ndarray]:
    """Per-cell pool-slot tables for kernels that need the POOL ROW of a cell
    (the segment recorder feeding the differentiable replay).

    Returns ``(slotmeta, base_pack)``:

    * ``slotmeta`` int32 [S, 16, 128] — per-cell 12-bit brick slot
      (index-word bits 11:0, the reference's pointer-table payload,
      Scene.cpp:239) packed as 16-bit halves, two cells per word
      (cell ``lin`` lives in word ``lin >> 1``, half ``lin & 1``).
      Non-loaded cells hold the sentinel 0xFFFF (no pool row).
    * ``base_pack`` int32 [NR4, 8, 128] — per-page pool base row
      (``scene.pool_base``), packed 1024 pages per register exactly like
      ``sc_dist`` so the kernel reuses the same arb-gather.

    Global pool row of a recorded cell = ``base_pack[page] + slot12``.
    """
    check_paged_geometry(grid)
    s = grid.supergrid_cell_size
    iv = np.asarray(scene.index_volume)
    pool_base = np.asarray(scene.pool_base)
    cz, cy, cx = iv.shape
    sx = grid.supergrid_xy
    S = grid.num_superchunks
    pc = s ** 3

    zz, yy, xx = np.meshgrid(np.arange(cz), np.arange(cy), np.arange(cx),
                             indexing="ij")
    scf = ((xx // s) + (yy // s) * sx + (zz // s) * sx * sx).ravel()
    linf = (((zz % s) * s + (yy % s)) * s + (xx % s)).ravel()
    loaded = ((iv & np.uint32(BRICK_LOADED_BIT)) != 0).ravel()
    slot16 = np.where(loaded, (iv.ravel() & np.uint32(BRICK_INDEX_BITS)),
                      np.uint32(0xFFFF)).astype(np.uint32)

    rows = np.full((S, pc // 2), 0xFFFFFFFF, np.uint32)
    # Clear the target half then OR the slot in (cells default to 0xFFFF).
    np.bitwise_and.at(rows, (scf, linf >> 1),
                      ~(np.uint32(0xFFFF) << ((linf & 1) * 16)
                        .astype(np.uint32)))
    np.bitwise_or.at(rows, (scf, linf >> 1),
                     slot16 << ((linf & 1) * 16).astype(np.uint32))
    slotmeta = rows.reshape(S, 16, 128).view(np.int32)

    base = np.zeros(S, np.int32)
    base[:len(pool_base)] = pool_base.astype(np.int32)
    nr4 = -(-S // 1024)
    base_pack = np.pad(base, (0, nr4 * 1024 - S)).reshape(nr4, 8, 128)
    return slotmeta, base_pack


def _expand_poolT(pool_words, cellid, gslot, s_pages: int, pc: int, cm: int):
    """Jit body: compact (pool rows, loaded-cell ids) -> [S, 4*cm, pc] bf16.

    Bytes (<= 255) are exact in bf16; column 4k+b of a cell holds byte b
    (LSB first) of its occupancy word k — the same layout the host builder
    writes.
    """
    import jax.numpy as jnp

    rows = jnp.take(pool_words, gslot, axis=0)        # [M, cm] uint32
    cols = jnp.stack(
        [(rows >> jnp.uint32(8 * b)) & jnp.uint32(0xFF) for b in range(4)],
        axis=2).reshape(rows.shape[0], 4 * cm).astype(jnp.bfloat16)
    flat = jnp.zeros((s_pages * pc, 4 * cm), jnp.bfloat16)
    flat = flat.at[cellid].set(cols)
    return flat.reshape(s_pages, pc, 4 * cm).transpose(0, 2, 1)


def build_paged_scene_device(scene, grid: GridConfig,
                             meta: np.ndarray | None = None,
                             sc_dist: np.ndarray | None = None) -> PagedScene:
    """Paged tables as DEVICE arrays, with ``poolT`` expanded on device.

    The full-world ``poolT`` is 2.1 GB and cost 315 s to push through the
    remote tunnel (BENCH_r02); the information content is only the resident
    bricks' 64 B payloads plus their cell addresses (~180 MB full world), so
    upload the compact scene pool + per-loaded-cell (cellid, slot) vectors
    and expand to the page-major transposed layout with one device program
    (gather -> byte unpack -> row scatter -> transpose).  ``meta`` /
    ``sc_dist`` may be passed in from a disk cache; otherwise they are
    host-built here (32 MB + 16 KB — cheap to upload directly).
    """
    import jax
    import jax.numpy as jnp

    check_paged_geometry(grid)
    if meta is None or sc_dist is None:
        host = build_paged_scene(scene, grid, include_pool=False)
        meta, sc_dist = host.meta, host.sc_dist

    s = grid.supergrid_cell_size
    iv = np.asarray(scene.index_volume)
    pool_base = np.asarray(scene.pool_base)
    cz, cy, cx = iv.shape
    sx = grid.supergrid_xy
    pc = s ** 3
    cm = grid.cell_members

    zz, yy, xx = np.meshgrid(np.arange(cz), np.arange(cy), np.arange(cx),
                             indexing="ij")
    sc = (xx // s) + (yy // s) * sx + (zz // s) * sx * sx
    lin = ((zz % s) * s + (yy % s)) * s + (xx % s)
    loaded = ((iv & np.uint32(BRICK_LOADED_BIT)) != 0).ravel()
    scf, linf = sc.ravel()[loaded], lin.ravel()[loaded]
    cellid = (scf.astype(np.int64) * pc + linf).astype(np.int32)
    gslot = (pool_base[scf]
             + (iv.ravel()[loaded] & np.uint32(BRICK_INDEX_BITS))
             .astype(np.int64)).astype(np.int32)

    poolT = jax.jit(_expand_poolT, static_argnames=("s_pages", "pc", "cm"))(
        jnp.asarray(np.asarray(scene.pool_words)), jnp.asarray(cellid),
        jnp.asarray(gslot), s_pages=grid.num_superchunks, pc=pc, cm=cm)
    return PagedScene(meta=jnp.asarray(meta), poolT=poolT,
                      sc_dist=jnp.asarray(sc_dist))
