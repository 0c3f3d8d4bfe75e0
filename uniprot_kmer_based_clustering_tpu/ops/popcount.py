"""Tiled pairwise AND+popcount sweep — the framework's hot kernel.

Computes, for every protein pair (i < j), the shared-repeated-k-mer count
``|kmers(i) ∩ kmers(j)| = Σ_w popcount(words[i, w] & words[j, w])`` over the
packed bitset matrix, fused with the AMR-class cross filter and the
alignment threshold. This single sweep subsumes the reference's entire
graph engine:

  * ``Graph::new``'s 258M-edge materialization (src/graph/mod.rs:39-193),
  * ``remove_uninteresting_edges``'s cross-AMR filter
    (src/graph/mod.rs:549-697),
  * ``combine_edges``'s parallel-edge merge (src/graph/mod.rs:322-546), and
  * the ``> 10`` shared-k-mer alignment gate (src/graph/mod.rs:242),

because the merged edge between proteins i and j carries exactly their
shared k-mers, so only the intersection *count* (and, for the 465 surviving
pairs, the k-mer ids recovered later on host) is ever consumed.

Design: the upper triangle of (tile_i, tile_j) pairs is enumerated by a
scalar-prefetch grid (``pltpu.PrefetchScalarGridSpec``) so no tile is
computed twice; the k-mer word axis is the second grid dimension with a
VMEM accumulator carried across it; per-tile statistics are reduced inside
the kernel so the O(N²) count matrix never touches HBM.

Outputs (both int32):
  row_stats [N_pad, 8] — per stationary protein row, over all j > i:
      0 cross_weight  Σ counts where class differs
      1 cross_pairs   #pairs with counts ≥ 1, class differs
      2 cross_over    #pairs with counts > threshold, class differs
      3 cross_max     max count, class differs
      4..7 the same four for class-equal pairs
  tile_hits [n_tiles, 8] — per (i,j) tile: lanes 0/1 = #cross/#same pairs
      over threshold (drives the host extraction pass), lanes 2/3 = #pairs
      with counts ≥ 1 (cross/same).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_STAT_NAMES = (
    "cross_weight",
    "cross_pairs",
    "cross_over",
    "cross_max",
    "same_weight",
    "same_pairs",
    "same_over",
    "same_max",
)
_NSTATS = 8
_STAT_LANES = 128  # pad the stat axis to one full lane tile


def upper_triangle_tiles(n_pad: int, tile: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (i_tile, j_tile) enumeration of the upper triangle,
    row-major so that all tiles sharing a stationary i are consecutive
    (required by the revisited row_stats output block)."""
    nt = n_pad // tile
    i, j = np.triu_indices(nt)
    return i.astype(np.int32), j.astype(np.int32)


def _masks(i0, j0, n, tile, classes_row, classes_col):
    """Pair-validity and class masks for one (i,j) tile.

    gi/gj are global protein indices; the `gi < gj` mask both removes the
    diagonal and deduplicates the two orientations of diagonal tiles (the
    reference's pair set is unordered: SURVEY.md §3.2).
    """
    gi = i0 + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    gj = j0 + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    valid = (gi < gj) & (gj < n) & (gi < n)
    cross = classes_row != classes_col  # [tile,1] vs [1,tile] broadcast
    return valid & cross, valid & ~cross


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _sweep_kernel(
    # scalar prefetch
    i_of_t_ref,     # int32 [nT] — stationary tile index per grid step
    j_of_t_ref,     # int32 [nT] — moving tile index per grid step
    first_of_t_ref, # int32 [nT] — 1 on the first tile of each stationary row
    classes_ref,    # int32 [N_pad] — AMR class ids (SMEM scalars)
    # inputs
    a_ref,          # [T, W] uint32 — stationary tile, full word axis
    b_ref,          # [T, W] uint32 — moving tile, full word axis
    crow_ref,       # [T, 1] int32 — stationary classes
    # outputs
    row_stats_ref,  # [T, 128] int32, indexed by i (revisited across t)
    tile_hits_ref,  # [8, 128] int32, indexed by t (hits in row 0)
    *,
    tile: int,
    n: int,
    threshold: int,
):
    """One (i_tile, j_tile) pair per grid step.

    The moving tile's rows are looped; each step ANDs one moving row
    against the whole stationary tile and lane-reduces the popcount to a
    [T, 1] count column. Stats accumulate in static lane slices of a VMEM
    scratch — Mosaic cannot lower dynamic *lane* stores, so the counts
    matrix itself is never materialized (which also keeps VMEM flat in the
    word axis and lets the full W live on chip).
    """
    t = pl.program_id(0)
    i0 = i_of_t_ref[t] * tile
    j0 = j_of_t_ref[t] * tile

    a = a_ref[...]
    gi = i0 + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    crow = crow_ref[...]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, _STAT_LANES), 1)
    is_max_lane = (lanes == 3) | (lanes == 7)

    def body(c, acc):
        # acc is a [tile, 128] VALUE carried through the loop — per-lane
        # slice stores on a ref lower to catastrophic relayouts in Mosaic
        # (see ops.stats_pallas.accumulate_stats_block); instead the 8
        # stat columns are scattered into their lanes with iota-mask
        # selects and merged full-width.
        brow = b_ref[pl.ds(c, 1), :]                        # [1, W]
        x = jax.lax.population_count(a & brow)
        cnt = jnp.sum(x.astype(jnp.int32), axis=1, keepdims=True)  # [T, 1]

        gj = j0 + c
        class_c = classes_ref[gj]
        valid = (gi < gj) & (gj < n)
        cross = valid & (crow != class_c)
        same = valid & (crow == class_c)

        czero = jnp.where(cross, cnt, 0)
        szero = jnp.where(same, cnt, 0)
        cols = (
            czero,
            (cross & (cnt >= 1)).astype(jnp.int32),
            (cross & (cnt > threshold)).astype(jnp.int32),
            czero,
            szero,
            (same & (cnt >= 1)).astype(jnp.int32),
            (same & (cnt > threshold)).astype(jnp.int32),
            szero,
        )
        colmat = jnp.zeros((tile, _STAT_LANES), jnp.int32)
        for lane, col in enumerate(cols):
            colmat = jnp.where(lanes == lane, col, colmat)
        return jnp.where(
            is_max_lane, jnp.maximum(acc, colmat), acc + colmat
        )

    acc = jax.lax.fori_loop(
        0, tile, body,
        jnp.zeros((tile, _STAT_LANES), jnp.int32),
        unroll=False,
    )

    first = first_of_t_ref[t] == 1
    prev = jnp.where(first, 0, row_stats_ref[...])
    row_stats_ref[...] = jnp.where(
        is_max_lane, jnp.maximum(prev, acc), prev + acc
    )

    # tile_hits blocks are 8 sublanes per tile (TPU min tile height); the
    # hits live in row 0, rows 1-7 are zero. Built with iota masks
    # (scatter is not lowerable in Mosaic).
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, _STAT_LANES), 0)
    hl = jax.lax.broadcasted_iota(jnp.int32, (8, _STAT_LANES), 1)
    hits = jnp.zeros((8, _STAT_LANES), jnp.int32)
    for lane, src in enumerate((2, 6, 1, 5)):
        hits = hits + jnp.where(
            (sub == 0) & (hl == lane),
            jnp.sum(acc[:, src : src + 1]),
            0,
        )
    tile_hits_ref[...] = hits


def sweep_pallas(
    words,
    classes,
    n: int,
    threshold: int,
    tile: int = 128,
    word_block: int = 512,  # unused; kept for a uniform engine signature
    interpret: bool = False,
):
    """Run the full upper-triangle sweep as one Pallas call.

    Args:
      words: uint32 [N_pad, W_pad] packed bitsets (N_pad % tile == 0).
      classes: int32 [N_pad] AMR class ids (pad rows are masked by `n`).
      n: true protein count.
      threshold: alignment gate — pairs with counts strictly greater survive
        (src/graph/mod.rs:242).

    Returns (row_stats int32 [N_pad, 8], tile_hits int32 [n_tiles, 4],
             tiles_ij (np.ndarray, np.ndarray)).
    """
    del word_block
    n_pad, w_pad = words.shape
    assert n_pad % tile == 0
    if w_pad % 128 != 0:
        words = jnp.pad(words, ((0, 0), (0, -w_pad % 128)))
        w_pad = words.shape[1]
    ti, tj = upper_triangle_tiles(n_pad, tile)
    nt = ti.shape[0]
    first = np.ones(nt, dtype=np.int32)
    first[1:] = (ti[1:] != ti[:-1]).astype(np.int32)

    classes = jnp.asarray(classes, jnp.int32)
    kernel = functools.partial(
        _sweep_kernel, tile=tile, n=n, threshold=threshold
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (tile, w_pad),
                lambda t, it, jt, ft, cl: (it[t], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, w_pad),
                lambda t, it, jt, ft, cl: (jt[t], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, 1),
                lambda t, it, jt, ft, cl: (it[t], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile, _STAT_LANES),
                lambda t, it, jt, ft, cl: (it[t], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, _STAT_LANES),
                lambda t, it, jt, ft, cl: (t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    row_stats, tile_hits = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, _STAT_LANES), jnp.int32),
            jax.ShapeDtypeStruct((nt * 8, _STAT_LANES), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * nt * tile * tile * w_pad,
            bytes_accessed=nt * 2 * tile * w_pad * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray(ti),
        jnp.asarray(tj),
        jnp.asarray(first),
        classes,
        words,
        words,
        classes.reshape(n_pad, 1),
    )
    return row_stats[:, :_NSTATS], tile_hits[::8, :4], (ti, tj, tile)


# ---------------------------------------------------------------------------
# XLA fallback / oracle
# ---------------------------------------------------------------------------


@jax.jit
def pairwise_counts_xla(a_words, b_words):
    """[A, W] × [B, W] → int32 [A, B] shared-bit counts (pure XLA)."""

    def one_row(row):
        return jnp.sum(
            jax.lax.population_count(row[None, :] & b_words).astype(jnp.int32),
            axis=1,
        )

    return jax.vmap(one_row)(a_words)


@functools.partial(jax.jit, static_argnames=("n", "threshold", "tile"))
def _tile_stats_xla(a, b, crow, ccol, i0, j0, *, n, threshold, tile):
    from uniprot_kmer_based_clustering_tpu.ops.bitmul import stack_row_stats

    counts = pairwise_counts_xla(a, b)
    cross, same = _masks(i0, j0, n, tile, crow, ccol)
    # the canonical shared 8-lane stack (the popcount engines never take
    # weights, so w_thresh stays at its default 1)
    stats, _, _ = stack_row_stats(counts, cross, same, threshold)
    hits = jnp.stack(
        [
            jnp.sum(stats[:, 2]),
            jnp.sum(stats[:, 6]),
            jnp.sum(stats[:, 1]),
            jnp.sum(stats[:, 5]),
        ]
    )
    return stats, hits


def sweep_xla(words, classes, n: int, threshold: int, tile: int = 512):
    """Tile-by-tile XLA sweep with identical outputs to :func:`sweep_pallas`.

    Python-loops the tile grid (one compiled tile program), so it is the
    correctness oracle on CPU and the fallback when Pallas is unavailable.
    """
    n_pad = words.shape[0]
    if n_pad % tile != 0:
        # a floored tile grid would silently skip the tail rows (or, for
        # n_pad < tile, sweep nothing at all)
        raise ValueError(
            f"n_pad={n_pad} must be a multiple of tile={tile} "
            "(pack with a matching row_multiple)"
        )
    ti, tj = upper_triangle_tiles(n_pad, tile)
    classes = jnp.asarray(classes, jnp.int32)
    row_stats = np.zeros((n_pad, _NSTATS), dtype=np.int64)
    tile_hits = np.zeros((ti.shape[0], 4), dtype=np.int32)
    # dispatch every tile asynchronously, fetch ONCE (a synchronizing
    # per-tile readback costs ~30 ms through the remote tunnel — ~14 s of
    # pure latency over the bundled set's 231 tiles)
    device_parts = []
    for t in range(ti.shape[0]):
        i, j = int(ti[t]), int(tj[t])
        a = jax.lax.dynamic_slice_in_dim(words, i * tile, tile, 0)
        b = jax.lax.dynamic_slice_in_dim(words, j * tile, tile, 0)
        crow = jax.lax.dynamic_slice_in_dim(classes, i * tile, tile).reshape(
            tile, 1
        )
        ccol = jax.lax.dynamic_slice_in_dim(classes, j * tile, tile).reshape(
            1, tile
        )
        device_parts.append(
            _tile_stats_xla(
                a, b, crow, ccol, i * tile, j * tile,
                n=n, threshold=threshold, tile=tile,
            )
        )
    for t, (stats, hits) in enumerate(jax.device_get(device_parts)):
        i = int(ti[t])
        stats = stats.astype(np.int64)
        sl = slice(i * tile, (i + 1) * tile)
        for lane in range(_NSTATS):
            if lane % 4 == 3:
                row_stats[sl, lane] = np.maximum(row_stats[sl, lane], stats[:, lane])
            else:
                row_stats[sl, lane] += stats[:, lane]
        tile_hits[t] = hits
    return row_stats, tile_hits, (ti, tj, tile)


def sweep(words, classes, n, threshold, tile=512, word_block=512,
          use_pallas=True, interpret=False, pallas_tile=None):
    """Dispatch to the Pallas kernel on TPU or the XLA fallback elsewhere.

    The Pallas engine uses its own (smaller) protein tile so both full-word
    row tiles fit VMEM; `tile` governs the XLA fallback and is accepted for
    a uniform signature.
    """
    on_tpu = jax.devices()[0].platform == "tpu"
    if use_pallas and (on_tpu or interpret):
        if pallas_tile is None:
            # 2 input blocks × 2 (pipeline double-buffering) must fit the
            # 16 MB VMEM together with outputs/scratch: 4·tile·W·4 bytes
            # ≤ ~12 MB. At UniProt-scale widths (e.g. 24,576 words at the
            # 100k synthetic run) that caps the tile at 32 rows; below 8
            # rows (the sublane minimum) no tile fits and the XLA
            # formulation takes over.
            w_pad = words.shape[1]
            cap = min(128, (12 << 20) // (16 * w_pad))
            pallas_tile = 0
            for d in range(cap - cap % 8, 7, -8):
                if words.shape[0] % d == 0:
                    pallas_tile = d
                    break
        if pallas_tile >= 8:
            # per-tile-pair metadata scales O((N/tile)²): the tile_hits
            # out_shape costs 4 KB per pair and the scalar-prefetch
            # schedule arrays live in SMEM. Small tiles at large N (the
            # VMEM cap at UniProt-scale widths forces tile=32 at 100k →
            # ~4.9M pairs ≈ 20 GB of hits) must take the XLA
            # formulation instead of OOMing.
            nt_rows = words.shape[0] // pallas_tile
            nt_pairs = nt_rows * (nt_rows + 1) // 2
            if nt_pairs * 8 * _STAT_LANES * 4 > 1 << 30:
                return sweep_xla(words, classes, n, threshold, tile)
            row_stats, tile_hits, tiles = sweep_pallas(
                words, classes, n, threshold, pallas_tile,
                interpret=interpret and not on_tpu,
            )
            return (
                np.asarray(row_stats, dtype=np.int64),
                np.asarray(tile_hits),
                tiles,
            )
    return sweep_xla(words, classes, n, threshold, tile)
