"""Incremental corpus append (kmers/append.py, QueryServer.add_proteins).

The reference's incremental path is ``Tree::add_protein``
(src/tree.rs:524-536): one protein's bitset folds into the standing
structure. The framework's exact analogue is index algebra —
``append(A, B) ≡ rebuild(A ∪ B)`` — pinned here field-for-field and
pair-for-pair, including the docfreq-promotion case (a k-mer unique in
the standing corpus reaching docfreq ≥ 2 via an appended protein must
set the OLD owner's bit without re-encoding the old corpus).
"""

import os

import numpy as np
import pytest

from uniprot_kmer_based_clustering_tpu.io import read_fasta
from uniprot_kmer_based_clustering_tpu.kmers import (
    append_to_index,
    build_index,
    encode_kmers,
    pack_bitsets,
)
from uniprot_kmer_based_clustering_tpu.kmers.encode import seqs_to_buffer


def _build(seqs, k=5):
    buf, off = seqs_to_buffer(seqs)
    codes, koff = encode_kmers(buf, off, k)
    idx = build_index(codes, koff, k)
    bs = pack_bitsets(
        idx.incidence_protein, idx.incidence_rank, len(seqs),
        idx.n_repeated,
    )
    return idx, bs


def _assert_index_equal(a, b):
    assert np.array_equal(a.codes, b.codes)
    assert np.array_equal(a.doc_freq, b.doc_freq)
    assert np.array_equal(a.repeated_codes, b.repeated_codes)
    assert np.array_equal(a.incidence_protein, b.incidence_protein)
    assert np.array_equal(a.incidence_rank, b.incidence_rank)
    assert np.array_equal(a.hash_doc_freq, b.hash_doc_freq)
    assert np.array_equal(a.unique_owner, b.unique_owner)


@pytest.fixture(scope="module")
def toy_seqs(toy_fasta):
    table = read_fasta(toy_fasta)
    return [table.seq(i) for i in range(table.n)]


def test_append_equals_rebuild(toy_seqs):
    idx_a, bs_a = _build(toy_seqs[:40])
    idx_full, bs_full = _build(toy_seqs)

    # the split must actually exercise docfreq promotion, or this test
    # proves nothing about the hard case
    promoted = np.intersect1d(
        idx_a.codes[idx_a.doc_freq == 1], idx_full.repeated_codes
    )
    assert promoted.shape[0] > 0, "toy split exercises no promotion"

    idx_app, bs_app = append_to_index(idx_a, bs_a, toy_seqs[40:])
    _assert_index_equal(idx_app, idx_full)
    assert bs_app.n == bs_full.n and bs_app.n_bits == bs_full.n_bits
    assert np.array_equal(
        np.asarray(bs_app.words), np.asarray(bs_full.words)
    )


def test_append_chained(toy_seqs):
    """Two successive appends ≡ one rebuild (the owner bookkeeping must
    survive across appends, including owners of NEW unique codes)."""
    idx, bs = _build(toy_seqs[:25])
    idx, bs = append_to_index(idx, bs, toy_seqs[25:45])
    idx, bs = append_to_index(idx, bs, toy_seqs[45:])
    idx_full, bs_full = _build(toy_seqs)
    _assert_index_equal(idx, idx_full)
    assert np.array_equal(np.asarray(bs.words), np.asarray(bs_full.words))


def test_append_empty_and_errors(toy_seqs):
    idx, bs = _build(toy_seqs[:10])
    same_idx, same_bs = append_to_index(idx, bs, [])
    assert same_idx is idx and same_bs is bs

    import dataclasses

    no_owner = dataclasses.replace(idx, unique_owner=None)
    with pytest.raises(ValueError, match="unique-code owners"):
        append_to_index(no_owner, bs, toy_seqs[10:12])

    from uniprot_kmer_based_clustering_tpu.kmers.index import KmerIndex

    dev_like = KmerIndex.from_sparse_freq(idx.codes, idx.doc_freq, idx.k)
    with pytest.raises(ValueError, match="incidence"):
        append_to_index(dev_like, bs, toy_seqs[10:12])

    # a sampled corpus stream cannot take full-stream appends
    sampled = dataclasses.replace(idx, sampling="random10")
    with pytest.raises(ValueError, match="sampling"):
        append_to_index(sampled, bs, toy_seqs[10:12])


def test_add_proteins_rollback_on_rebuild_failure(toy_seqs):
    """A failing serving rebuild must not leave the server half-updated
    (index advanced, corpus blocks stale): the pre-append state is
    restored and the server keeps answering exactly."""
    from uniprot_kmer_based_clustering_tpu.similarity import QueryServer

    idx, bs = _build(toy_seqs[:40])
    srv = QueryServer(idx, bs, mode="host")
    probe = [toy_seqs[0], toy_seqs[5]]
    before = srv.query(probe, threshold=3)

    original = QueryServer._build_host_csr
    calls = {"n": 0}

    def boom(self):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected rebuild failure")
        return original(self)

    try:
        QueryServer._build_host_csr = boom
        with pytest.raises(RuntimeError, match="injected"):
            srv.add_proteins(toy_seqs[40:], threshold=3)
    finally:
        QueryServer._build_host_csr = original

    assert srv.index is idx and srv.bitset is bs  # state restored
    after = srv.query(probe, threshold=3)
    for a, b in zip(before, after):
        assert np.array_equal(a, b)

    # and the server still accepts a successful append afterwards
    srv.add_proteins(toy_seqs[40:42], threshold=3)
    assert srv.bitset.n == 42


def test_add_proteins_double_failure_flags_server(toy_seqs):
    """If restoring the pre-append serving state ALSO fails, the server
    must not silently keep serving from a half-dead state: queries raise
    until rebuild_serving() succeeds (advisor r03 finding)."""
    from uniprot_kmer_based_clustering_tpu.similarity import QueryServer

    idx, bs = _build(toy_seqs[:40])
    srv = QueryServer(idx, bs, mode="host")
    probe = [toy_seqs[0], toy_seqs[5]]
    before = srv.query(probe, threshold=3)

    original = QueryServer._build_host_csr
    calls = {"n": 0}

    def boom(self):
        calls["n"] += 1
        if calls["n"] <= 2:  # append rebuild AND restore both fail
            raise RuntimeError(f"injected failure {calls['n']}")
        return original(self)

    try:
        QueryServer._build_host_csr = boom
        with pytest.warns(RuntimeWarning, match="rollback failed"):
            with pytest.raises(RuntimeError, match="injected failure 1"):
                srv.add_proteins(toy_seqs[40:], threshold=3)
    finally:
        QueryServer._build_host_csr = original

    assert srv._needs_rebuild
    with pytest.raises(RuntimeError, match="rebuild_serving"):
        srv.query(probe, threshold=3)

    srv.rebuild_serving()
    assert not srv._needs_rebuild
    after = srv.query(probe, threshold=3)
    for a, b in zip(before, after):
        assert np.array_equal(a, b)


def test_append_promotion_explicit():
    """Hand-built promotion: k-mer X unique to protein 0 of the standing
    corpus becomes repeated when the appended protein also carries it —
    protein 0's bit must appear in the NEW rank space."""
    # A: two proteins sharing one 5-mer run (so a rank space exists) and
    # protein 0 carrying a private tail
    shared = "CCCCCCCC"  # 4 shared 5-mers, docfreq 2
    a0 = shared + "WWWWW"  # 'WWWWW' unique to protein 0
    a1 = shared + "YFYFY"
    idx, bs = _build([a0, a1])
    assert idx.rank_of(np.array([_code("WWWWW")]))[0] == -1  # unique: no rank

    idx2, bs2 = append_to_index(idx, bs, ["MMWWWWWMM"])
    r = idx2.rank_of(np.array([_code("WWWWW")]))[0]
    assert r >= 0, "promotion did not enter the rank space"
    assert bs2.row_bits(0)[r], "old owner's promoted bit not set"
    assert bs2.row_bits(2)[r], "new protein's promoted bit not set"
    assert not bs2.row_bits(1)[r]
    # ≡ rebuild, bit for bit
    idxf, bsf = _build([a0, a1, "MMWWWWWMM"])
    _assert_index_equal(idx2, idxf)
    assert np.array_equal(np.asarray(bs2.words), np.asarray(bsf.words))


def _code(s, k=5):
    from uniprot_kmer_based_clustering_tpu.kmers import AMINO_ACIDS

    c = 0
    for ch in s:
        c = c * 21 + AMINO_ACIDS.index(ch)
    return c


def test_query_server_add_proteins_host_and_device(toy_seqs):
    from uniprot_kmer_based_clustering_tpu.similarity import QueryServer

    idx_a, bs_a = _build(toy_seqs[:40])
    idx_f, bs_f = _build(toy_seqs)
    new = toy_seqs[40:]
    thr = 3

    for mode in ("host", "device"):
        srv = QueryServer(idx_a, bs_a, mode=mode)
        report = srv.add_proteins(new, threshold=thr)
        # server state after append ≡ a fresh server over the union
        fresh = QueryServer(idx_f, bs_f, mode=mode)
        probe = [toy_seqs[0], new[0], "MKT"]
        for a, b in zip(
            srv.query(probe, threshold=thr), fresh.query(probe, threshold=thr)
        ):
            assert np.array_equal(a, b), mode

        # report = every (i, j, count) pair over the gate touching a new
        # row — oracle: brute-force popcount over the rebuilt bitset
        words = np.asarray(bs_f.words)
        n = bs_f.n
        expected = set()
        for gi in range(40, n):
            for j in range(n):
                if j == gi:
                    continue
                c = int(np.bitwise_count(words[gi] & words[j]).sum())
                if c > thr:
                    expected.add((min(gi, j), max(gi, j), c))
        got = {tuple(int(v) for v in row) for row in report}
        assert got == expected, mode
        assert report.shape[0] == len(expected)
        # sorted by (i, j)
        assert np.array_equal(report, report[np.lexsort((report[:, 1],
                                                         report[:, 0]))])

    # weighted servers refuse in-place appends (stale rank-aligned weights)
    w = np.ones(bs_a.w_pad * 32, np.int8)
    wsrv = QueryServer(idx_a, bs_a, weights=w, mode="host")
    with pytest.raises(ValueError, match="weighted"):
        wsrv.add_proteins(new)


@pytest.mark.golden
@pytest.mark.skipif(
    not os.path.exists("/root/reference/uniprot_arg.fasta"),
    reason="bundled dataset missing",
)
def test_append_golden_bundled():
    """Append the last 100 bundled proteins onto a 10,519-protein
    standing corpus: the result must hit every BASELINE.md golden the
    full build hits — 430,853 distinct / 231,253 repeated / 3,189,295
    incidences, and the 465-pair / max-567 sweep."""
    from uniprot_kmer_based_clustering_tpu.io import native
    from uniprot_kmer_based_clustering_tpu.similarity.pairwise import (
        PairwiseResult,
    )

    table = read_fasta("/root/reference/uniprot_arg.fasta")
    seqs = [table.seq(i) for i in range(table.n)]
    idx, bs = _build(seqs[:-100])
    idx, bs = append_to_index(idx, bs, seqs[-100:])
    assert idx.n_distinct == 430_853
    assert idx.n_repeated == 231_253
    assert idx.nnz == 3_189_295
    assert idx.multigraph_edge_count() == 258_621_291

    classes = np.asarray(table.amr_class_ids, np.int32)
    rs, pairs = native.sparse_sweep(
        idx.incidence_protein, idx.incidence_rank, table.n,
        idx.n_repeated, classes, 10,
    )
    res = PairwiseResult.from_row_stats(rs, pairs)
    assert (res.cross_weight, res.cross_pairs, res.cross_over,
            res.cross_max) == (5_300_233, 4_350_628, 465, 567)
