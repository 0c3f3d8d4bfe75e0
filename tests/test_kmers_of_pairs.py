"""shared_kmer_ranks edge cases (the reference Debug-dump recovery)."""

import numpy as np

from uniprot_kmer_based_clustering_tpu.kmers import build_index, encode_kmers
from uniprot_kmer_based_clustering_tpu.kmers.encode import seqs_to_buffer
from uniprot_kmer_based_clustering_tpu.similarity.kmers_of_pairs import (
    shared_kmer_ranks,
)


def test_pair_touching_trailing_incidence_free_protein():
    """A pair that includes a protein with NO repeated k-mers beyond the
    last incidence-bearing one must yield an empty intersection, not an
    IndexError (regression: the CSR was sized from ip[-1]+1)."""
    # proteins 0 and 1 share k-mers; protein 2 is unique-only (every
    # 5-mer appears once corpus-wide -> no incidences)
    seqs = [
        "MKTAYIAKQRMKTAYIAKQR",
        "MKTAYIAKQRCCCCCCCCCC",
        "WWWWWYYYYYFFFFFHHHHH",
    ]
    buf, offs = seqs_to_buffer(seqs)
    codes, koff = encode_kmers(buf, offs, 5)
    idx = build_index(codes, koff, 5)
    assert idx.incidence_protein.max() == 1  # protein 2 truly empty
    pairs = np.array([[0, 1, 9], [1, 2, 0], [0, 2, 0]], np.int64)
    got = shared_kmer_ranks(idx, pairs)
    assert len(got[0]) > 0
    assert len(got[1]) == 0 and len(got[2]) == 0
