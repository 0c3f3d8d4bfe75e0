"""Single-chip pairwise similarity sweep: stats + surviving-pair extraction.

Replaces the reference's graph engine (``src/graph/``): the sweep's
aggregate statistics reproduce the stderr counters the reference prints
("Number of total edges", "Number of edges now", src/graph/mod.rs:50-51,
545,695) and the extraction pass reproduces the pair set that
``align_and_output_pairs`` would align (counts > threshold, cross-AMR —
src/graph/mod.rs:242,580-587).

Two-pass extraction under XLA's static shapes (SURVEY.md §7.4): pass 1 is
the fused sweep, which reports per-tile hit counts; pass 2 recomputes the
handful of hit tiles and pulls their counts to host for exact index
recovery. Deterministic: pairs are produced sorted by (i, j).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uniprot_kmer_based_clustering_tpu.config import PipelineConfig
from uniprot_kmer_based_clustering_tpu.kmers.bitset import BitsetMatrix
from uniprot_kmer_based_clustering_tpu.ops.bitmul import (
    sweep_mxu,
    unpack_words_to_int8,
)
from uniprot_kmer_based_clustering_tpu.ops.popcount import (
    pairwise_counts_xla,
    sweep,
)


@jax.jit
def _weighted_counts_xla(words_a, words_b, weights):
    """int32 [A, B] BLOSUM-weighted shared-k-mer scores for one tile pair."""
    a = unpack_words_to_int8(words_a)
    b = unpack_words_to_int8(words_b, weights)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )


@dataclasses.dataclass
class PairwiseResult:
    """Aggregate similarity statistics plus the surviving pair list.

    Attributes map to reference parity counters:
      cross_weight: Σ shared-kmer counts over cross-AMR pairs — the edge
        count after ``remove_uninteresting_edges`` (5,300,233 golden).
      cross_pairs: distinct cross-AMR pairs with ≥1 shared k-mer — the edge
        count after ``combine_edges`` (4,350,628 golden).
      cross_over: pairs over the alignment threshold (465 golden).
      cross_max: maximum shared-k-mer count over cross-AMR pairs (567).
      same_*: the same statistics for class-equal pairs (the reference
        discards these; kept for observability).
      pairs: int64 [M, 3] — (i, j, shared_count) for surviving pairs,
        sorted by (i, j). With cross_amr_only=False both populations
        survive the gate.
    """

    cross_weight: int
    cross_pairs: int
    cross_over: int
    cross_max: int
    same_weight: int
    same_pairs: int
    same_over: int
    same_max: int
    pairs: np.ndarray

    def parity_counters(self) -> Dict[str, int]:
        return {
            "edges_after_amr_filter": self.cross_weight,
            "pairs_after_merge": self.cross_pairs,
            "pairs_over_threshold": self.cross_over,
            "max_shared_kmers": self.cross_max,
        }


def extract_pairs(
    words,
    classes,
    tile_hits: np.ndarray,
    tiles,
    n: int,
    threshold: int,
    cross_amr_only: bool = True,
    weights=None,
) -> np.ndarray:
    """Pass-2 exact pair recovery from tiles that reported hits.

    `tiles` is the (ti, tj, tile_size) enumeration returned by the sweep
    engine that produced `tile_hits` — the granularities must match.
    With `weights` (int8 per-bit-column), recovered values are the
    BLOSUM-weighted scores instead of raw counts.
    """
    ti, tj, tile = tiles
    want = tile_hits[:, 0] > 0
    if not cross_amr_only:
        want |= tile_hits[:, 1] > 0
    hit_tiles = np.nonzero(want)[0]
    classes_np = np.asarray(classes)
    if weights is not None:
        weights = jnp.asarray(weights, jnp.int8)

    # Dispatch hit tiles asynchronously and fetch count blocks in batched
    # device→host transfers (each synchronizing readback costs a ~30 ms
    # round trip through the remote tunnel). Batching is bounded so the
    # in-flight [tile, tile] int32 buffers never exceed ~batch MB of HBM —
    # dense-homology scale runs can have tens of thousands of hit tiles.
    batch = 128
    host_counts = []
    for lo in range(0, len(hit_tiles), batch):
        device_counts = []
        for t in hit_tiles[lo : lo + batch]:
            i, j = int(ti[t]), int(tj[t])
            a = jax.lax.dynamic_slice_in_dim(words, i * tile, tile, 0)
            b = jax.lax.dynamic_slice_in_dim(words, j * tile, tile, 0)
            if weights is None:
                device_counts.append(pairwise_counts_xla(a, b))
            else:
                device_counts.append(_weighted_counts_xla(a, b, weights))
        host_counts.extend(jax.device_get(device_counts))

    out = []
    for t, counts in zip(hit_tiles, host_counts):
        i, j = int(ti[t]), int(tj[t])
        gi = i * tile + np.arange(tile)[:, None]
        gj = j * tile + np.arange(tile)[None, :]
        mask = (counts > threshold) & (gi < gj) & (gj < n)
        if cross_amr_only:
            mask &= classes_np[np.clip(gi, 0, n - 1)] != classes_np[
                np.clip(gj, 0, n - 1)
            ]
        r, c = np.nonzero(mask)
        out.append(
            np.stack(
                [gi[r, 0], gj[0, c], counts[r, c]], axis=1
            ).astype(np.int64)
        )
    if not out:
        return np.zeros((0, 3), dtype=np.int64)
    pairs = np.concatenate(out, axis=0)
    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
    return pairs[order]


def pairwise_similarity(
    bitset: BitsetMatrix,
    class_ids: np.ndarray,
    config: Optional[PipelineConfig] = None,
    interpret: bool = False,
    weights: Optional[np.ndarray] = None,
) -> PairwiseResult:
    """Run the fused sweep + extraction on the current default device.

    `weights` (int8 per-bit-column, from utils.blosum.rank_weights_int8)
    switches the score to BLOSUM-weighted mode; the weighted sweep always
    uses the MXU engine (the weighting is a matmul column scale).
    """
    config = config or PipelineConfig()
    n = bitset.n
    n_pad = bitset.n_pad
    classes = np.full(n_pad, -1, dtype=np.int32)
    classes[:n] = np.asarray(class_ids, dtype=np.int32)

    words = jnp.asarray(bitset.words)
    classes_j = jnp.asarray(classes)

    engine = config.engine
    if engine == "auto":
        engine = "mxu" if jax.devices()[0].platform == "tpu" else "xla"
    if weights is not None:
        engine = "mxu"
    threshold = (
        config.effective_weighted_threshold(weights)
        if weights is not None
        else config.threshold
    )
    if engine == "mxu":
        strip = config.strip
        if strip is not None and n_pad % strip != 0:
            strip = config.tile
        row_stats, tile_hits, tiles = sweep_mxu(
            words,
            classes_j,
            n=n,
            threshold=threshold,
            strip=strip,
            block=config.tile,
            weights=weights,
        )
    else:
        row_stats, tile_hits, tiles = sweep(
            words,
            classes_j,
            n=n,
            threshold=config.threshold,
            tile=config.tile,
            word_block=config.word_block,
            use_pallas=(engine == "popcount"),
            interpret=interpret,
        )
    totals = row_stats.astype(np.int64).sum(axis=0)
    maxes = row_stats.astype(np.int64).max(axis=0)

    pairs = extract_pairs(
        words,
        classes,
        tile_hits,
        tiles,
        n=n,
        threshold=threshold,
        cross_amr_only=config.cross_amr_only,
        weights=weights,
    )

    return PairwiseResult(
        cross_weight=int(totals[0]),
        cross_pairs=int(totals[1]),
        cross_over=int(totals[2]),
        cross_max=int(maxes[3]),
        same_weight=int(totals[4]),
        same_pairs=int(totals[5]),
        same_over=int(totals[6]),
        same_max=int(maxes[7]),
        pairs=pairs,
    )
