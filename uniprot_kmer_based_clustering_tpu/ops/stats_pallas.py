"""Pallas statistics epilogue over a materialized counts matrix.

The XLA int8 matmul (ops.bitmul) runs at ~306 TOPS on v5e, but fusing the
8-statistic class-split epilogue into the same XLA program costs ~59 ms —
XLA materializes several full [N, N] intermediates for the mask/where/
reduce chain. The arithmetic itself is ~12 VPU ops per element; done
tile-wise in VMEM it is bounded by one read of the counts matrix
(462 MB ≈ 0.6 ms at HBM speed-of-light).

This kernel walks the upper-triangle 512-tiles of the counts matrix
(scalar-prefetch enumeration, same tile order as every other engine) and
produces the standard engine outputs:

  row_stats [S, 8]  — ops.popcount.ROW_STAT_NAMES per stationary row
  tile_hits [nT, 2] — #pairs over threshold (cross/same) per tile,
                      driving exact pair extraction (SURVEY.md §7.4
                      two-pass count-then-gather).

The counts matrix itself never leaves HBM→VMEM tiles and is produced
once by the MXU sweep; statistics read each upper-triangle tile exactly
once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uniprot_kmer_based_clustering_tpu.ops.popcount import (
    upper_triangle_tiles,
)

_NSTATS = 8
_STAT_LANES = 128


def stats_tiles(s: int, j: int, i_off: int, j_off: int, tile: int):
    """Tile enumeration for a counts block at global offset (i_off, j_off):
    row-major over the local grid, skipping tiles entirely below the pair
    diagonal (no gj > gi element)."""
    nti, ntj = s // tile, j // tile
    ti, tj = np.meshgrid(
        np.arange(nti, dtype=np.int32),
        np.arange(ntj, dtype=np.int32),
        indexing="ij",
    )
    keep = (j_off + (tj + 1) * tile - 1) > (i_off + ti * tile)
    return ti[keep].ravel(), tj[keep].ravel()


def accumulate_stats_block(
    counts,      # int32 [TM, TN] counts tile (value, not ref)
    i0,          # scalar global row offset
    j0,          # scalar global col offset
    crow,        # int32 [TM, 1]
    ccol,        # int32 [1, TN]
    first,       # scalar bool — first tile of this stationary row
    row_stats_ref,   # int32 [TM, 128] output ref (revisited)
    tile_hits_ref,   # int32 [8, 128] output ref
    *,
    n: int,
    threshold: int,
    w_thresh: int,
):
    """Fused 8-statistic epilogue for one counts tile, Mosaic-shaped.

    Everything is computed as full-lane-width [TM, 128] operations: the 8
    per-row stat columns are scattered into their lanes with iota-mask
    selects and merged into the revisited output in ONE read-modify-write.
    Per-lane slice stores (``ref[:, k:k+1] = …``) look natural but lower
    to catastrophic relayouts in Mosaic (measured ~4 ms per 512² tile vs
    ~40 µs for this formulation).
    """
    tm, tn = counts.shape
    gi = i0 + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
    gj = j0 + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    valid = (gi < gj) & (gj < n)
    cross = valid & (crow != ccol)
    same = valid & ~cross

    czero = jnp.where(cross, counts, 0)
    szero = jnp.where(same, counts, 0)
    kd = dict(axis=1, keepdims=True)
    cols = (
        jnp.sum(czero, **kd),
        jnp.sum((cross & (counts >= w_thresh)).astype(jnp.int32), **kd),
        jnp.sum((cross & (counts > threshold)).astype(jnp.int32), **kd),
        jnp.max(czero, **kd),
        jnp.sum(szero, **kd),
        jnp.sum((same & (counts >= w_thresh)).astype(jnp.int32), **kd),
        jnp.sum((same & (counts > threshold)).astype(jnp.int32), **kd),
        jnp.max(szero, **kd),
    )
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, _STAT_LANES), 1)
    colmat = jnp.zeros((tm, _STAT_LANES), jnp.int32)
    for lane, col in enumerate(cols):
        colmat = jnp.where(lanes == lane, col, colmat)
    is_max_lane = (lanes == 3) | (lanes == 7)
    prev = jnp.where(first, 0, row_stats_ref[...])
    row_stats_ref[...] = jnp.where(
        is_max_lane, jnp.maximum(prev, colmat), prev + colmat
    )

    sub = jax.lax.broadcasted_iota(jnp.int32, (8, _STAT_LANES), 0)
    hl = jax.lax.broadcasted_iota(jnp.int32, (8, _STAT_LANES), 1)
    hits = jnp.where((sub == 0) & (hl == 0), jnp.sum(cols[2]), 0)
    hits = hits + jnp.where((sub == 0) & (hl == 1), jnp.sum(cols[6]), 0)
    tile_hits_ref[...] = hits


def _stats_kernel(
    it_ref,         # int32 [nT] stationary tile index (local)
    jt_ref,         # int32 [nT] moving tile index (local)
    first_ref,      # int32 [nT] 1 on first tile of each stationary row
    counts_ref,     # int32 [T, T] one counts tile
    crow_ref,       # int32 [T, 1]
    ccol_ref,       # int32 [1, T]
    row_stats_ref,  # int32 [T, 128] revisited per stationary tile
    tile_hits_ref,  # int32 [8, 128]
    *,
    tile: int,
    i_off: int,
    j_off: int,
    n: int,
    threshold: int,
    w_thresh: int,
):
    t = pl.program_id(0)
    accumulate_stats_block(
        counts_ref[...],
        i_off + it_ref[t] * tile,
        j_off + jt_ref[t] * tile,
        crow_ref[...],
        ccol_ref[...],
        first_ref[t] == 1,
        row_stats_ref,
        tile_hits_ref,
        n=n,
        threshold=threshold,
        w_thresh=w_thresh,
    )


def _stats_kernel_traced(
    offs_ref,       # int32 [2] traced global (i_off, j_off)
    it_ref,         # int32 [nT] stationary tile index (local)
    jt_ref,         # int32 [nT] moving tile index (local)
    counts_ref, crow_ref, ccol_ref, row_stats_ref, tile_hits_ref,
    *, tile, n, threshold, w_thresh,
):
    t = pl.program_id(0)
    accumulate_stats_block(
        counts_ref[...],
        offs_ref[0] + it_ref[t] * tile,
        offs_ref[1] + jt_ref[t] * tile,
        crow_ref[...],
        ccol_ref[...],
        jt_ref[t] == 0,  # row-major full grid: first tile of each row
        row_stats_ref,
        tile_hits_ref,
        n=n,
        threshold=threshold,
        w_thresh=w_thresh,
    )


def stats_from_counts_traced(
    counts,          # int32 [S, J] materialized counts block (device)
    classes_row,     # int32 [S]
    classes_col,     # int32 [J]
    i_off,           # traced int32 scalar — global row offset
    j_off,           # traced int32 scalar — global col offset
    *,
    n: int,
    threshold: int,
    w_thresh: int = 1,
    tile: int = 512,
    interpret: bool = False,
):
    """:func:`stats_from_counts` with TRACED block offsets — the epilogue
    for the one-compiled-shape ``lax.scan`` sweep schedule (ops.bitmul
    ``_scan_sweep``), where the block position is a scan carry, not a
    Python int.

    The tile enumeration must be static, so ALL (S/tile)×(J/tile) tiles
    are visited (the below-diagonal tiles of diagonal blocks compute
    masked zeros — wasted epilogue work on ~1/nb of the scan steps only);
    the global gi<gj / gj<n masks ride the offsets through scalar
    prefetch.

    Returns (row_stats int32 [S, 8], block_hits int32 [S/tile, J/tile, 2]).
    """
    s, j = counts.shape
    assert s % tile == 0 and j % tile == 0
    nti, ntj = s // tile, j // tile
    ti, tj = np.meshgrid(
        np.arange(nti, dtype=np.int32),
        np.arange(ntj, dtype=np.int32),
        indexing="ij",
    )
    ti, tj = ti.ravel(), tj.ravel()
    nt = int(ti.shape[0])

    kernel = functools.partial(
        _stats_kernel_traced,
        tile=tile, n=n, threshold=threshold, w_thresh=w_thresh,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (tile, tile),
                lambda t, of, it, jt: (it[t], jt[t]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, 1),
                lambda t, of, it, jt: (it[t], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile),
                lambda t, of, it, jt: (0, jt[t]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile, _STAT_LANES),
                lambda t, of, it, jt: (it[t], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, _STAT_LANES),
                lambda t, of, it, jt: (t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    row_stats, tile_hits = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s, _STAT_LANES), jnp.int32),
            jax.ShapeDtypeStruct((nt * 8, _STAT_LANES), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * nt * tile * tile,
            bytes_accessed=nt * tile * tile * 4,
            transcendentals=0,
        ),
    )(
        jnp.stack(
            [jnp.asarray(i_off, jnp.int32), jnp.asarray(j_off, jnp.int32)]
        ),
        jnp.asarray(ti),
        jnp.asarray(tj),
        counts,
        jnp.asarray(classes_row, jnp.int32).reshape(s, 1),
        jnp.asarray(classes_col, jnp.int32).reshape(1, j),
    )
    return (
        row_stats[:, :_NSTATS],
        tile_hits[::8, :2].reshape(nti, ntj, 2),
    )


def stats_from_counts(
    counts,          # int32 [S, J] materialized counts (device)
    classes_row,     # int32 [S]
    classes_col,     # int32 [J]
    *,
    i_off: int,
    j_off: int,
    n: int,
    threshold: int,
    w_thresh: int = 1,
    tile: int = 512,
    interpret: bool = False,
    vma=None,
):
    """Tile-walk statistics over a counts block at global offset (i_off, j_off).

    `vma`: set of mesh axis names when called inside ``shard_map`` (the
    outputs vary per device; shard_map's check requires it declared).

    Tiles entirely below the pair diagonal (every local (gi, gj) has
    gj ≤ gi) are skipped — on the [N_pad, N_pad] square this visits only
    the upper-triangle tiles; on a strip-schedule block it skips the
    lower-left corner. Partial-diagonal tiles are handled by the in-kernel
    gi < gj mask.

    Returns (row_stats int32 [S, 8], tile_hits int32 [nT, 2],
             tiles (ti, tj, tile) in *local* tile coordinates).
    """
    s, j = counts.shape
    assert s % tile == 0 and j % tile == 0
    ti, tj = stats_tiles(s, j, i_off, j_off, tile)
    nt = int(ti.shape[0])
    # every stationary tile row must keep ≥1 tile: a row whose tiles are
    # all below the pair diagonal would never be visited, leaving its
    # row_stats output block UNINITIALIZED (pallas_call returns whatever
    # HBM held). In-repo callers pass diagonal-or-above blocks only —
    # enforce the precondition instead of returning garbage.
    covered = np.zeros(s // tile, bool)
    covered[ti] = True
    if not covered.all():
        raise ValueError(
            "stats_from_counts: some tile rows keep no tile (block lies "
            "entirely below the pair diagonal) — their row_stats would "
            "be uninitialized; pass diagonal-or-above blocks only"
        )
    first = np.ones(nt, dtype=np.int32)
    first[1:] = (ti[1:] != ti[:-1]).astype(np.int32)

    kernel = functools.partial(
        _stats_kernel,
        tile=tile,
        i_off=i_off,
        j_off=j_off,
        n=n,
        threshold=threshold,
        w_thresh=w_thresh,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (tile, tile),
                lambda t, it, jt, ft: (it[t], jt[t]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, 1),
                lambda t, it, jt, ft: (it[t], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile),
                lambda t, it, jt, ft: (0, jt[t]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile, _STAT_LANES),
                lambda t, it, jt, ft: (it[t], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, _STAT_LANES),
                lambda t, it, jt, ft: (t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    row_stats, tile_hits = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (s, _STAT_LANES), jnp.int32,
                **({"vma": frozenset(vma)} if vma is not None else {}),
            ),
            jax.ShapeDtypeStruct(
                (nt * 8, _STAT_LANES), jnp.int32,
                **({"vma": frozenset(vma)} if vma is not None else {}),
            ),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * nt * tile * tile,
            bytes_accessed=nt * tile * tile * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray(ti),
        jnp.asarray(tj),
        jnp.asarray(first),
        counts,
        jnp.asarray(classes_row, jnp.int32).reshape(s, 1),
        jnp.asarray(classes_col, jnp.int32).reshape(1, j),
    )
    return row_stats[:, :_NSTATS], tile_hits[::8, :2], (ti, tj, tile)
