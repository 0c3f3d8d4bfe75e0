"""k-mer encoding oracles (reference semantics: src/protein.rs:9-54)."""

import numpy as np
import pytest

from uniprot_kmer_based_clustering_tpu.kmers.encode import (
    AMINO_ACIDS,
    decode_kmer,
    encode_kmers,
    encode_kmers_device,
    residues_to_indices,
)


def _enc(seq: str, k: int = 5, **kw):
    buf = np.frombuffer(seq.encode(), np.uint8)
    return encode_kmers(buf, np.array([0, len(seq)]), k, **kw)


def test_hand_computed_code():
    # 'CSTAG' → 0·21⁴ + 1·21³ + 2·21² + 3·21 + 4 (src/protein.rs:29-37)
    codes, off = _enc("CSTAG")
    assert codes.tolist() == [0 + 9261 + 2 * 441 + 63 + 4]
    assert off.tolist() == [0, 1]


def test_alphabet_order_matches_reference():
    assert AMINO_ACIDS == "CSTAGPDEQNHRKMILVWYF*"
    idx = residues_to_indices(np.frombuffer(b"CSTAGPDEQNHRKMILVWYF*", np.uint8))
    assert idx.tolist() == list(range(21))


def test_unknown_and_lowercase_map_to_star():
    # exact-match semantics: any unmatched byte → 20 (src/protein.rs:49-54)
    for seq in ("XXXXX", "csTAG", "B9J1Z", "*U-? "):
        codes, _ = _enc(seq)
        decoded = decode_kmer(int(codes[0]), 5)
        expect = "".join(c if c in AMINO_ACIDS[:20] else "*" for c in seq)
        assert decoded == expect


def test_decode_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        seq = "".join(AMINO_ACIDS[i] for i in rng.integers(0, 21, 9))
        codes, _ = _enc(seq, k=7)
        for p in range(len(seq) - 6):
            assert decode_kmer(int(codes[p]), 7) == seq[p : p + 7]


def test_window_count_law():
    # len−k+1 windows per protein (src/protein.rs:113-122)
    seqs = ["CCCCC", "CSTAGPDEQN", "AAAAAAA"]
    buf = np.frombuffer("".join(seqs).encode(), np.uint8)
    offs = np.cumsum([0] + [len(s) for s in seqs])
    codes, koff = encode_kmers(buf, offs, 5)
    assert np.diff(koff).tolist() == [1, 6, 3]
    # windows never straddle protein boundaries
    codes7, koff7 = encode_kmers(buf, offs, 7)
    assert np.diff(koff7).tolist() == [0, 4, 1]


def test_too_short_protein_yields_no_windows():
    codes, off = _enc("CST")
    assert codes.shape[0] == 0
    assert off.tolist() == [0, 0]


def test_random10_determinism_and_count():
    seq = "".join("CSTAG" * 30)  # len 150 → (150−4)//10 = 14 samples
    c1, o1 = _enc(seq, sampling="random10", seed=9)
    c2, _ = _enc(seq, sampling="random10", seed=9)
    c3, _ = _enc(seq, sampling="random10", seed=10)
    assert np.array_equal(c1, c2)
    assert not np.array_equal(c1, c3)
    assert o1.tolist() == [0, 14]
    # sampled codes are a subset of the full set
    full, _ = _enc(seq)
    assert set(c1.tolist()) <= set(full.tolist())


def test_device_encode_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    seqs = ["".join(AMINO_ACIDS[i] for i in rng.integers(0, 20, int(n)))
            for n in rng.integers(8, 30, 10)]
    buf = np.frombuffer("".join(seqs).encode(), np.uint8)
    offs = np.cumsum([0] + [len(s) for s in seqs])
    host_codes, host_off = encode_kmers(buf, offs, 5)

    lmax = max(len(s) for s in seqs)
    mat = np.zeros((len(seqs), lmax), np.int32)
    lengths = np.array([len(s) for s in seqs], np.int32)
    for i, s in enumerate(seqs):
        mat[i, : len(s)] = residues_to_indices(
            np.frombuffer(s.encode(), np.uint8)
        )
    dev_codes, valid = encode_kmers_device(jnp.asarray(mat), jnp.asarray(lengths), 5)
    dev_codes = np.asarray(dev_codes)
    valid = np.asarray(valid)
    for i in range(len(seqs)):
        got = dev_codes[i][valid[i]]
        want = host_codes[host_off[i] : host_off[i + 1]]
        assert np.array_equal(got, want)


def test_encode_empty_table():
    """n=0 (empty FASTA) returns empty codes instead of a numpy
    broadcast crash."""
    codes, koff = encode_kmers(
        np.zeros(0, np.uint8), np.zeros(1, np.int64), 5
    )
    assert codes.shape == (0,)
    assert np.array_equal(koff, [0])
