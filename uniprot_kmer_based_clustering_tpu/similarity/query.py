"""Query serving: shared-k-mer search of new sequences against a built
corpus index.

The reference is a batch binary with no query path — re-clustering the
whole corpus is its only way to relate a new protein to it. Here the
packed corpus bitset is a standing index: encoding Q query sequences,
rank-hashing them into the corpus's repeated-k-mer space, and one
[Q, K]·[K, N] int8 matmul give every query's shared-k-mer counts against
all N corpus proteins at the sweep's full MXU rate — the serving-side
complement of the batch pipeline (queries with k-mers outside the
corpus's repeated set simply don't match on those positions, exactly as
a corpus member wouldn't).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from uniprot_kmer_based_clustering_tpu.kmers.bitset import BitsetMatrix
from uniprot_kmer_based_clustering_tpu.kmers.encode import (
    encode_kmers,
)
from uniprot_kmer_based_clustering_tpu.kmers.index import KmerIndex


def pack_query_bitsets(
    index: KmerIndex, seqs: Sequence[str], w_pad: int
) -> np.ndarray:
    """uint32 [Q, w_pad] presence rows for query sequences, in the
    corpus's rank-hash bit space (non-repeated k-mers drop out)."""
    buf = np.frombuffer("".join(seqs).encode("ascii"), np.uint8)
    offsets = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    codes, koff = encode_kmers(buf, offsets, index.k)
    words = np.zeros((len(seqs), w_pad), np.uint32)
    for qi in range(len(seqs)):
        ranks = index.rank_of(codes[koff[qi] : koff[qi + 1]])
        ranks = np.unique(ranks[ranks >= 0]).astype(np.int64)
        np.bitwise_or.at(
            words[qi], ranks >> 5, np.uint32(1) << (ranks & 31).astype(np.uint32)
        )
    return words


def query_shared_kmers(
    index: KmerIndex,
    bitset: BitsetMatrix,
    seqs: Sequence[str],
    threshold: int = 10,
    weights: Optional[np.ndarray] = None,
    top: Optional[int] = None,
) -> List[np.ndarray]:
    """Shared-k-mer counts of each query sequence against the corpus.

    Args:
      index / bitset: the built corpus artifacts (``run_pipeline``
        result's ``.index`` / ``.bitset``).
      seqs: query amino-acid strings (any characters; unknowns map to
        the ``*`` catch-all like the reference's encoder).
      threshold: report corpus proteins sharing **>** threshold k-mers
        with the query (the pipeline's alignment gate).
      weights: optional int8 per-bit-column BLOSUM weights — the counts
        become weighted scores, same as the weighted sweep.
      top: optionally keep only the `top` highest-count matches per
        query.

    Returns one int64 ``[M_q, 2]`` array per query — (corpus protein
    index, shared count), sorted by count descending then index — the
    serving analogue of the pipeline's pair list.
    """
    import jax
    import jax.numpy as jnp

    from uniprot_kmer_based_clustering_tpu.ops.bitmul import (
        unpack_words_to_int8,
    )

    qwords = pack_query_bitsets(index, seqs, bitset.w_pad)

    @jax.jit
    def counts_fn(q, corpus, wts):
        a = unpack_words_to_int8(q, wts)
        b = unpack_words_to_int8(corpus)
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    wts = (
        jnp.asarray(weights, jnp.int8)
        if weights is not None
        else jnp.ones(bitset.w_pad * 32, jnp.int8)
    )
    counts = np.asarray(
        counts_fn(jnp.asarray(qwords), jnp.asarray(bitset.words), wts)
    )[:, : bitset.n]

    out: List[np.ndarray] = []
    for qi in range(len(seqs)):
        hits = np.nonzero(counts[qi] > threshold)[0]
        c = counts[qi, hits].astype(np.int64)
        order = np.lexsort((hits, -c))
        m = np.stack([hits[order], c[order]], axis=1)
        out.append(m[:top] if top is not None else m)
    return out
