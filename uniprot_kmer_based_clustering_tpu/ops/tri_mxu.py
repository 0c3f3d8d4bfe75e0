"""Triangular-block MXU Pallas sweep — the speed-of-light pairwise engine.

Computes the same fused statistics as :func:`ops.bitmul.sweep_mxu` (the
reference's entire graph engine: src/graph/mod.rs:39-193 materialization,
:549-697 AMR filter, :322-546 merge, :242 alignment gate — collapsed to
``C = B·Bᵀ`` over the {0,1} incidence matrix), but:

  * only the **upper triangle** of (i_tile, j_tile) pairs is computed —
    the full-square XLA matmul does every pair twice; at 512-tiles the
    diagonal overcount is 1/(2·n_tiles) ≈ 2%, so the triangle does ~51%
    of the square's MACs;
  * operands stream from HBM **packed** (uint32 words, 8× less traffic
    than int8) and are unpacked to int8 in VMEM, bit-plane-major — 32
    static lane-slice stores of ``(w >> b) & 1``, the Mosaic-lowerable
    unpack (dynamic lane indexing and 3D reshapes are not). Bit-plane
    order permutes the contraction axis, which no dot product observes;
    BLOSUM column weights are permuted identically;
  * the int32 tile accumulator lives in VMEM across the word-chunk grid
    axis, and the 8-statistic epilogue (class-split sums / pair counts /
    threshold gates / maxima — ops.popcount.ROW_STAT_NAMES) runs fused at
    the last chunk, so the O(N²) counts never reach HBM.

Outputs are engine-interchangeable with sweep_mxu / sweep_pallas:
(row_stats [N_pad, 8], tile_hits [nT, 2] int32, tiles (ti, tj, tile)).
"""

from __future__ import annotations

import functools
from typing import Optional

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


def permute_weights_bitplane(weights: np.ndarray, wc: int) -> np.ndarray:
    """Per-k-mer int8 weights [W*32] → bit-plane layout [KC*32, wc].

    Kernel lane ``b*wc + w`` of chunk ``kc`` holds bit ``b`` of word
    ``kc*wc + w``, i.e. k-mer rank ``(kc*wc + w)*32 + b``.
    """
    k = weights.shape[0]
    w_words = k // 32
    kc_total = w_words // wc
    # [KC, wc, 32] (word-major) → [KC, 32, wc] (bit-plane-major)
    w3 = weights.reshape(kc_total, wc, 32).transpose(0, 2, 1)
    return np.ascontiguousarray(w3.reshape(kc_total * 32, wc)).astype(np.int8)


def _tri_kernel(
    # scalar prefetch
    it_ref,        # int32 [nT] stationary tile index
    jt_ref,        # int32 [nT] moving tile index
    first_ref,     # int32 [nT] 1 on the first tile of a stationary row
    # inputs
    a_ref,         # uint32 [TM, WC] stationary packed chunk
    b_ref,         # uint32 [TN, WC] moving packed chunk
    w_ref,         # int8 [32, WC] bit-plane column weights for this chunk
    crow_ref,      # int32 [TM, 1] stationary classes
    ccol_ref,      # int32 [1, TN] moving classes
    # outputs
    row_stats_ref, # int32 [TM, 128] revisited per stationary tile
    tile_hits_ref, # int32 [8, 128] per tile pair (row 0: lanes 0-3)
    # scratch
    a8_ref,        # int8 [TM, WC*32]
    b8_ref,        # int8 [TN, WC*32]
    acc_ref,       # int32 [TM, TN]
    *,
    tm: int,
    tn: int,
    wc: int,
    kc_total: int,
    n: int,
    threshold: int,
    w_thresh: int,
    weighted: bool,
    in_dtype,
    acc_dtype,
):
    t = pl.program_id(0)
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    aw = a_ref[...]
    bw = b_ref[...]
    for bbit in range(32):
        sl = slice(bbit * wc, (bbit + 1) * wc)
        # Mosaic has no direct uint32→bfloat16 cast; go through int32
        abits = ((aw >> bbit) & jnp.uint32(1)).astype(jnp.int32)
        a8_ref[:, sl] = abits.astype(in_dtype)
        bits = ((bw >> bbit) & jnp.uint32(1)).astype(jnp.int32)
        if weighted:
            bits = bits * w_ref[bbit : bbit + 1, :].astype(jnp.int32)
        b8_ref[:, sl] = bits.astype(in_dtype)
    acc_ref[...] += jax.lax.dot_general(
        a8_ref[...],
        b8_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=acc_dtype,
    )

    @pl.when(kc == kc_total - 1)
    def _():
        from uniprot_kmer_based_clustering_tpu.ops.stats_pallas import (
            accumulate_stats_block,
        )

        accumulate_stats_block(
            acc_ref[...].astype(jnp.int32),
            it_ref[t] * tm,
            jt_ref[t] * tn,
            crow_ref[...],
            ccol_ref[...],
            first_ref[t] == 1,
            row_stats_ref,
            tile_hits_ref,
            n=n,
            threshold=threshold,
            w_thresh=w_thresh,
        )


def sweep_tri_mxu(
    words,
    classes,
    n: int,
    threshold: int,
    tile: int = 512,
    word_chunk_words: int = 128,
    weights: Optional[np.ndarray] = None,
    w_thresh: int = 1,
    interpret: bool = False,
    dot_dtype: str = "int8",
):
    """Upper-triangle fused MXU sweep as one Pallas call.

    Args:
      words: uint32 [N_pad, W] packed bitsets, N_pad % tile == 0.
      classes: int32 [N_pad] AMR class ids (pad rows masked via `n`).
      n: true protein count.
      threshold: strict alignment gate (src/graph/mod.rs:242).
      weights: optional int8 per-k-mer-rank weights [W*32] (BLOSUM engine).
      w_thresh: minimum score counted as "shares ≥1 k-mer" (1 unweighted;
        the minimum positive weight in weighted mode).

    Returns (row_stats int64 [N_pad, 8], tile_hits int32 [nT, 2],
             tiles (ti, tj, tile)).
    """
    n_pad, w_words = words.shape
    assert n_pad % tile == 0, (n_pad, tile)
    wc = word_chunk_words
    if w_words % wc != 0:
        pad = -w_words % wc
        words = jnp.pad(words, ((0, 0), (0, pad)))
        w_words = words.shape[1]
    kc_total = w_words // wc

    ti, tj = upper_triangle_tiles(n_pad, tile)
    nt = int(ti.shape[0])
    first = np.ones(nt, dtype=np.int32)
    first[1:] = (ti[1:] != ti[:-1]).astype(np.int32)

    weighted = weights is not None
    if weighted:
        wts = np.zeros(w_words * 32, dtype=np.int8)
        wts[: weights.shape[0]] = np.asarray(weights, np.int8)
        w_perm = permute_weights_bitplane(wts, wc)
    else:
        w_perm = np.ones((kc_total * 32, wc), dtype=np.int8)

    if dot_dtype == "int8":
        in_dtype, acc_dtype = jnp.int8, jnp.int32
    elif dot_dtype == "bfloat16":
        # exact for {0,1}·weight products: per-chunk partial sums ≤ 127·wc·32
        # < 2²⁴ are integers represented exactly in the float32 accumulator
        in_dtype, acc_dtype = jnp.bfloat16, jnp.float32
        # the kernel operand is int8 either way (permute_weights_bitplane
        # casts), so the true bound is the int8 range, not the fp mantissa
        assert not weighted or int(np.max(np.abs(weights))) <= 127
        # …but the CROSS-chunk running total must also stay an exact
        # float32 integer: past 2²⁴ the accumulator rounds and the engine
        # silently breaks the all-engines-agree-exactly invariant
        maxw = int(np.max(np.abs(weights))) if weighted else 1
        worst = kc_total * 32 * wc * maxw
        if worst >= 1 << 24:
            raise ValueError(
                f"dot_dtype='bfloat16' cannot accumulate exactly here: "
                f"worst-case count {worst} ≥ 2^24 (float32 integer "
                f"range); use dot_dtype='int8'"
            )
    else:
        raise ValueError(dot_dtype)

    classes = jnp.asarray(classes, jnp.int32)
    kernel = functools.partial(
        _tri_kernel,
        tm=tile,
        tn=tile,
        wc=wc,
        kc_total=kc_total,
        n=n,
        threshold=threshold,
        w_thresh=w_thresh,
        weighted=weighted,
        in_dtype=in_dtype,
        acc_dtype=acc_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt, kc_total),
        in_specs=[
            pl.BlockSpec(
                (tile, wc),
                lambda t, kc, it, jt, ft: (it[t], kc),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, wc),
                lambda t, kc, it, jt, ft: (jt[t], kc),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (32, wc),
                lambda t, kc, it, jt, ft: (kc, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, 1),
                lambda t, kc, it, jt, ft: (it[t], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile),
                lambda t, kc, it, jt, ft: (0, jt[t]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile, _STAT_LANES),
                lambda t, kc, it, jt, ft: (it[t], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, _STAT_LANES),
                lambda t, kc, it, jt, ft: (t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, wc * 32), in_dtype),
            pltpu.VMEM((tile, wc * 32), in_dtype),
            pltpu.VMEM((tile, tile), acc_dtype),
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
            flops=2 * nt * tile * tile * w_words * 32,
            bytes_accessed=nt * 2 * tile * w_words * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray(ti),
        jnp.asarray(tj),
        jnp.asarray(first),
        words,
        words,
        jnp.asarray(w_perm),
        classes.reshape(n_pad, 1),
        classes.reshape(1, n_pad),
    )
    return (
        np.asarray(row_stats[:, :_NSTATS], dtype=np.int64),
        np.asarray(tile_hits[::8, :2]),
        (ti, tj, tile),
    )
