"""Packed bitset tests."""

import numpy as np

from uniprot_kmer_based_clustering_tpu.kmers.bitset import (
    pack_bitsets,
    unpack_ranks,
)


def test_roundtrip_and_padding(rng):
    n, k = 37, 500
    rows, cols = np.nonzero(rng.random((n, k)) < 0.07)
    bs = pack_bitsets(
        rows.astype(np.int32), cols.astype(np.int32), n, k,
        row_multiple=16, word_multiple=128, chunk_rows=8,
    )
    assert bs.n_pad % 16 == 0 and bs.w_pad % 128 == 0
    for i in range(n):
        want = np.sort(cols[rows == i])
        assert np.array_equal(unpack_ranks(bs, i), want)
    # pad rows and pad bits are zero
    assert not bs.words[n:].any()
    full_bits = np.unpackbits(bs.words.view(np.uint8), bitorder="little")
    full_bits = full_bits.reshape(bs.n_pad, bs.w_pad * 32)
    assert not full_bits[:, k:].any()


def test_empty_rows():
    bs = pack_bitsets(
        np.array([], np.int32), np.array([], np.int32), 5, 10,
        row_multiple=8, word_multiple=128,
    )
    assert not bs.words.any()


def test_device_pack_matches_host(rng):
    from uniprot_kmer_based_clustering_tpu.kmers.bitset import (
        pack_bitsets_device,
    )

    n, k = 300, 900
    keys = rng.choice(n * k, size=5000, replace=False)
    ip = (keys // k).astype(np.int32)
    ir = (keys % k).astype(np.int32)
    a = pack_bitsets(ip, ir, n, k, row_multiple=16, word_multiple=128)
    b = pack_bitsets_device(ip, ir, n, k, row_multiple=16, word_multiple=128)
    assert np.array_equal(a.words, np.asarray(b.words))
