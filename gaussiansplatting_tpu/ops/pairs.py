"""(tile, depth) pair expansion, sort, and block alignment — fixed shapes.

The reference generates pairs with a dynamic atomic write cursor
(generateTilePairs, tiled_shaders.metal:745-794), sorts 64-bit keys on the CPU
(tiled_rasterizer.mm:27-102) and binary-searches tile ranges
(buildTileRanges, sort.metal:553-589).  None of that maps to TPU, so this
module re-derives the same result functionally:

  1. prefix-sum of per-Gaussian tile counts assigns each pair a slot,
  2. one vectorized gather materializes (tile_id, depth, gaussian_id) for every
     slot of a fixed-capacity pair array,
  3. ``jax.lax.sort`` orders lexicographically by (tile_id, depth) — two 32-bit
     keys instead of the reference's packed 64-bit key,
  4. pairs are scattered into a *block-aligned* layout where every tile's run
     is padded to a multiple of ``block`` pairs, so each block of the render
     kernel touches exactly one tile.

Everything is static-shape; overflow beyond ``pair_capacity`` drops whole
Gaussians exactly like the reference's bounds check
(tiled_shaders.metal:779-780).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussiansplatting_tpu.ops.projection import Projected


def _run_ids(starts: jnp.ndarray, run_live: jnp.ndarray, num_slots: int) -> jnp.ndarray:
    """Map each slot to the id of the run covering it.

    Equivalent to ``searchsorted(cum, arange(num_slots), 'right')`` for runs
    with exclusive-prefix starts ``starts`` (strictly increasing over live
    runs), but built from one scatter-max + one cummax: XLA's searchsorted
    lowering is a per-query binary-search scan that measures ~80x slower than
    this on TPU for millions of queries.
    """
    ids = jnp.arange(starts.shape[0], dtype=jnp.int32)
    dst = jnp.where(run_live, starts, num_slots)
    seed = jnp.full((num_slots,), -1, jnp.int32).at[dst].max(ids, mode="drop")
    return jax.lax.cummax(seed)


class PairBlocks(NamedTuple):
    """Block-aligned sorted pairs.

    gaussian_id: [num_blocks * block] int32, -1 for padding slots.
    block_tile:  [num_blocks] int32 tile id per block (num_tiles = padding).
    num_pairs:   [] int32, pairs actually emitted (diagnostics / overflow).
    overflow:    [] bool, capacity was exceeded (some Gaussians dropped).

    Gradient-reduction index data (ops/rasterize.gather_pair_rows): in SLOT
    order (pre-sort emission order) each Gaussian's pairs form one contiguous
    run, so per-Gaussian gradient sums are prefix-sum differences — no
    duplicate-index scatter-add anywhere in the backward pass.
    inv_amap:    [pair_capacity] int32 slot -> aligned position (cap = none).
    run_offsets: [N] int32 first slot of each Gaussian's run.
    run_counts:  [N] int32 pairs emitted per Gaussian (0 = culled/dropped).
    """

    gaussian_id: jnp.ndarray
    block_tile: jnp.ndarray
    num_pairs: jnp.ndarray
    overflow: jnp.ndarray
    inv_amap: jnp.ndarray
    run_offsets: jnp.ndarray
    run_counts: jnp.ndarray


def aligned_capacity(pair_capacity: int, num_tiles: int, block: int) -> int:
    """Static capacity of the block-aligned array: every tile can waste at most
    block-1 slots of padding."""
    return pair_capacity + num_tiles * block


def build_pairs(
    proj: Projected,
    tiles_x: int,
    tiles_y: int,
    pair_capacity: int,
    block: int,
    row0=0,
    compute_inverse: bool = False,
) -> PairBlocks:
    """``tiles_y`` is the number of tile ROWS this call rasterizes and ``row0``
    the first (absolute) tile row — used by the tile-sharded multi-chip path
    where each device owns a horizontal strip.  Tile ids in the output are
    strip-local.  The per-Gaussian cull decisions (including the 256-tile cap)
    were made against the FULL image rect in projection, matching the
    reference; only pair emission is restricted to the strip.

    ``compute_inverse`` additionally builds ``inv_amap`` for the scatter-free
    gradient reduction (grad_reduce="prefix").  It costs a fourth sort operand
    plus an inverse-permutation scatter — lax.sort permutes every operand
    whether its output is consumed or not — so it is off by default and
    ``inv_amap`` is a zero-length placeholder."""
    num_tiles = tiles_x * tiles_y
    n = proj.depth.shape[0]
    p_cap = pair_capacity
    a_cap = aligned_capacity(p_cap, num_tiles, block)
    num_blocks = a_cap // block

    # intersect each Gaussian's tile rect with the strip's row range
    row0 = jnp.asarray(row0, jnp.int32)
    ty_lo = jnp.maximum(proj.tile_min[:, 1], row0)
    ty_hi = jnp.minimum(proj.tile_max[:, 1], row0 + tiles_y - 1)
    span_y = jnp.maximum(ty_hi - ty_lo + 1, 0)
    span_x_full = proj.tile_max[:, 0] - proj.tile_min[:, 0] + 1
    counts = jnp.where(proj.n_tiles > 0, span_x_full * span_y, 0).astype(jnp.int32)
    cum = jnp.cumsum(counts)                 # inclusive
    offsets = cum - counts                   # exclusive
    total = cum[-1] if n > 0 else jnp.int32(0)

    # Capacity bound: drop Gaussians whose run would cross the end
    # (reference: writePos + tileCount > maxPairs -> return).
    fits = (offsets + counts) <= p_cap
    counts = jnp.where(fits, counts, 0)
    overflow = total > p_cap

    # --- expand: slot j belongs to the Gaussian whose cumulative range covers j
    slots = jnp.arange(p_cap, dtype=jnp.int32)
    # recompute cumsum with dropped Gaussians removed so slots stay dense
    cum = jnp.cumsum(counts)
    offsets = cum - counts
    total = jnp.minimum(cum[-1], p_cap) if n > 0 else jnp.int32(0)
    gid = _run_ids(offsets, counts > 0, p_cap)
    gid = jnp.clip(gid, 0, n - 1)
    slot_valid = slots < total

    # One row-gather of a packed per-Gaussian table instead of five separate
    # 1-D gathers: TPU gathers fetch >= a vector register row per index, so
    # [N, 8] rows cost the same random-access traffic as [N] elements and the
    # other four gathers come along for free.  Integer fields are exact in
    # fp32 (all < 2^24).
    table = jnp.stack(
        [
            offsets.astype(jnp.float32),
            span_x_full.astype(jnp.float32),
            ty_lo.astype(jnp.float32),
            proj.tile_min[:, 0].astype(jnp.float32),
            proj.depth,
        ],
        axis=-1,
    )  # [N, 5]
    rows = table[gid]  # [p_cap, 5]
    offset_g = rows[:, 0].astype(jnp.int32)
    span_x = jnp.maximum(rows[:, 1].astype(jnp.int32), 1)
    ty_lo_g = rows[:, 2].astype(jnp.int32)
    tmin_x_g = rows[:, 3].astype(jnp.int32)
    depth = jnp.where(slot_valid, rows[:, 4], jnp.inf)

    rank = slots - offset_g
    ty = ty_lo_g + rank // span_x
    tx = tmin_x_g + rank % span_x
    tile_id = jnp.where(
        slot_valid, (ty - row0) * tiles_x + tx, num_tiles
    ).astype(jnp.int32)
    gid = jnp.where(slot_valid, gid, -1)

    # --- lexicographic sort by (tile, depth); invalid pairs sink to the end.
    # The slot index rides along only when the aligned layout must be
    # invertible (scatter-free gradient reduction).
    if compute_inverse:
        sorted_tile, _sorted_depth, sorted_gid, sorted_slot = jax.lax.sort(
            (tile_id, depth, gid, slots), num_keys=2
        )
    else:
        sorted_tile, _sorted_depth, sorted_gid = jax.lax.sort(
            (tile_id, depth, gid), num_keys=2
        )
        sorted_slot = None

    # --- per-tile counts and starts in the sorted array
    ones = jnp.where(sorted_tile < num_tiles, 1, 0)
    tile_counts = jax.ops.segment_sum(
        ones, sorted_tile, num_segments=num_tiles + 1
    )[:num_tiles]
    tile_starts = jnp.cumsum(tile_counts) - tile_counts

    # --- block-aligned layout: tile t occupies [aligned_starts[t],
    #     aligned_starts[t] + ceil(count/block)*block)
    aligned_counts = -(-tile_counts // block) * block
    aligned_cum = jnp.cumsum(aligned_counts)
    aligned_starts = aligned_cum - aligned_counts

    # tile id of each block (blocks never straddle tiles by construction);
    # blocks past the last occupied one get the padding id num_tiles
    block_starts = jnp.arange(num_blocks, dtype=jnp.int32) * block
    block_tile = _run_ids(aligned_starts // block, aligned_counts > 0, num_blocks)
    block_tile = jnp.where(
        block_starts < aligned_cum[-1], jnp.clip(block_tile, 0, num_tiles - 1), num_tiles
    ).astype(jnp.int32)

    # GATHER sorted pairs into their aligned position (a scatter would be
    # ~4x slower on TPU): aligned slot j of tile t holds the pair ranked
    # (j - aligned_starts[t]) within t's sorted run, or -1 padding.  Shaped
    # [num_blocks, block] so every op is 2-D-tiled.
    lane = jnp.arange(block, dtype=jnp.int32)[None, :]
    safe_bt = jnp.minimum(block_tile, num_tiles - 1)
    rank2d = (block_starts - aligned_starts[safe_bt])[:, None] + lane
    src = tile_starts[safe_bt][:, None] + rank2d
    in_run = (block_tile[:, None] < num_tiles) & (
        rank2d < tile_counts[safe_bt][:, None]
    )
    src_c = jnp.clip(src, 0, p_cap - 1)
    aligned_gid = jnp.where(in_run, sorted_gid[src_c], -1).reshape(a_cap)

    # slot occupying each aligned position, and its inverse.  In-range
    # indices are unique (every slot lands in at most one aligned position)
    # but the out-of-range padding sentinel repeats, so unique_indices must
    # NOT be promised (XLA leaves violations undefined).
    if compute_inverse:
        amap_slot = jnp.where(in_run, sorted_slot[src_c], p_cap).reshape(a_cap)
        inv_amap = jnp.full((p_cap,), a_cap, jnp.int32).at[amap_slot].set(
            jnp.arange(a_cap, dtype=jnp.int32), mode="drop"
        )
    else:
        inv_amap = jnp.zeros((0,), jnp.int32)

    return PairBlocks(
        gaussian_id=aligned_gid,
        block_tile=block_tile,
        num_pairs=total,
        overflow=overflow,
        inv_amap=inv_amap,
        run_offsets=offsets,
        run_counts=counts,
    )
