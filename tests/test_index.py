"""Doc-freq index / rank-hash tests (reference: src/main.rs:77-199)."""

import numpy as np

from uniprot_kmer_based_clustering_tpu.kmers.encode import encode_kmers
from uniprot_kmer_based_clustering_tpu.kmers.index import (
    build_index,
    doc_freq_dense_device,
)


def _toy_index():
    # 3 proteins sharing some 5-mers
    seqs = ["CSTAGCSTAG", "CSTAGPPPPP", "PPPPPWWWWW"]
    buf = np.frombuffer("".join(seqs).encode(), np.uint8)
    offs = np.cumsum([0] + [len(s) for s in seqs])
    codes, koff = encode_kmers(buf, offs, 5)
    return build_index(codes, koff, 5), seqs


def test_doc_freq_semantics():
    idx, seqs = _toy_index()
    # document frequency counts proteins, not occurrences: CSTAG appears
    # twice in protein 0 but docfreq must count it once per protein.
    sets = [
        {s[i : i + 5] for i in range(len(s) - 4)} for s in seqs
    ]
    from uniprot_kmer_based_clustering_tpu.kmers.encode import decode_kmer

    for code, freq in zip(idx.codes, idx.doc_freq):
        kmer = decode_kmer(int(code), 5)
        assert freq == sum(kmer in s for s in sets)


def test_unique_repeat_split_and_rank_hash():
    idx, _ = _toy_index()
    assert idx.n_distinct == idx.n_unique + idx.n_repeated
    assert (idx.doc_freq >= 1).all()
    # rank hash is a minimal perfect hash: bijection onto [0, R)
    ranks = idx.rank_of(idx.repeated_codes)
    assert np.array_equal(np.sort(ranks), np.arange(idx.n_repeated))
    # non-repeated codes map to -1
    unique_codes = np.setdiff1d(idx.codes, idx.repeated_codes)
    assert (idx.rank_of(unique_codes) == -1).all()


def test_incidences_strip_unique_kmers():
    idx, seqs = _toy_index()
    # every incidence rank has docfreq ≥ 2 (src/protein.rs:151-162 removes
    # all unique k-mers before hashing)
    assert (idx.hash_doc_freq[idx.incidence_rank] >= 2).all()
    # incidences are per-protein distinct
    key = idx.incidence_protein.astype(np.int64) * idx.n_repeated + idx.incidence_rank
    assert len(np.unique(key)) == len(key)


def test_multigraph_edge_count():
    idx, _ = _toy_index()
    f = idx.hash_doc_freq
    assert idx.multigraph_edge_count() == int((f * (f - 1) // 2).sum())


def test_dense_device_doc_freq_matches_host():
    import jax.numpy as jnp

    from uniprot_kmer_based_clustering_tpu.kmers.encode import (
        encode_kmers_device,
        residues_to_indices,
    )

    rng = np.random.default_rng(11)
    seqs = ["".join("CSTAGPDEQNHRKMILVWYF"[i] for i in rng.integers(0, 20, int(n)))
            for n in rng.integers(10, 40, 12)]
    buf = np.frombuffer("".join(seqs).encode(), np.uint8)
    offs = np.cumsum([0] + [len(s) for s in seqs])
    codes, koff = encode_kmers(buf, offs, 5)
    idx = build_index(codes, koff, 5)

    lmax = max(len(s) for s in seqs)
    mat = np.zeros((len(seqs), lmax), np.int32)
    lengths = np.array([len(s) for s in seqs], np.int32)
    for i, s in enumerate(seqs):
        mat[i, : len(s)] = residues_to_indices(np.frombuffer(s.encode(), np.uint8))
    dcodes, valid = encode_kmers_device(jnp.asarray(mat), jnp.asarray(lengths), 5)
    freq = np.asarray(doc_freq_dense_device(dcodes, valid, 5))
    assert freq.sum() == idx.nnz + (idx.doc_freq == 1).sum()
    assert np.array_equal(np.nonzero(freq)[0], idx.codes)
    assert np.array_equal(freq[idx.codes], idx.doc_freq)


def test_rank_of_with_no_repeated_codes():
    """Degenerate dataset where every k-mer is unique: rank_of returns
    -1s (the documented contract) instead of indexing an empty array."""
    from uniprot_kmer_based_clustering_tpu.kmers.encode import encode_kmers
    from uniprot_kmer_based_clustering_tpu.kmers.index import build_index

    seqs = ["CSTAG", "PDEQN"]  # disjoint single 5-mers
    buf = np.frombuffer("".join(seqs).encode(), np.uint8)
    offs = np.cumsum([0] + [len(s) for s in seqs])
    codes, koff = encode_kmers(buf, offs, 5)
    idx = build_index(codes, koff, 5)
    assert idx.n_repeated == 0
    assert np.array_equal(idx.rank_of(codes), np.full(codes.shape, -1))
