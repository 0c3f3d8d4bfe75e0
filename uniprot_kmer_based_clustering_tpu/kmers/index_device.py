"""Device-side index build: doc-freq → rank hash → packed bitsets, all on
TPU (k=5).

The 5-mer universe is only 21⁵ = 4,084,101 codes, so the document
frequency is one dense ``bincount`` (distributable with a single ``psum``,
see parallel.doc_freq_psum) and the rank hash is a ``cumsum`` over the
repeated mask — no host sort, no MPHF construction. The packed bitset is
built by a scatter-add of single-bit words: within a protein row each
repeated rank is unique, hence each (row, word, bit) triple is unique and
ADD equals OR.

Produces bit-identical arrays to the host path (kmers/index.py +
kmers/bitset.py) — asserted in tests/test_index_device.py — so the two
paths are interchangeable per stage. k=7 (1.8e9-code universe) stays on
the host sort path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_pad", "w_pad"))
def _device_index_k5(codes, valid, *, n_pad: int, w_pad: int):
    universe = 21**5
    sent = universe

    # per-protein first-occurrence dedup (sorted rows)
    c = jnp.where(valid, codes, sent)
    c = jnp.sort(c, axis=1)
    first = jnp.concatenate(
        [jnp.ones((c.shape[0], 1), bool), c[:, 1:] != c[:, :-1]], axis=1
    )
    inc_code = jnp.where(first & (c < sent), c, sent)  # [N, Wmax]

    flat = inc_code.reshape(-1)
    freq = jnp.zeros(universe + 1, jnp.int32).at[flat].add(1)
    freq = freq.at[universe].set(0)

    repeated = freq >= 2
    # rank of code = #repeated codes before it (ascending-code rank — the
    # same dense-rank hash as the host path)
    rank = jnp.cumsum(repeated.astype(jnp.int32)) - 1  # [universe+1]
    n_repeated = rank[universe - 1] + 1

    # scatter single-bit words; (row, word) collisions only occur across
    # distinct bits, so add == or
    r = rank[jnp.minimum(inc_code, universe - 1)]
    keep = (inc_code < sent) & repeated[jnp.minimum(inc_code, universe - 1)]
    word_idx = r >> 5
    bit = (jnp.uint32(1) << (r & 31).astype(jnp.uint32))
    row = jax.lax.broadcasted_iota(
        jnp.int32, inc_code.shape, 0
    )
    flat_idx = jnp.where(keep, row * w_pad + word_idx, n_pad * w_pad)
    words = jnp.zeros(n_pad * w_pad + 1, jnp.uint32)
    words = words.at[flat_idx.reshape(-1)].add(
        jnp.where(keep, bit, 0).reshape(-1)
    )
    return words[:-1].reshape(n_pad, w_pad), freq[:universe], n_repeated


def build_bitset_device(
    residue_idx: np.ndarray,
    lengths: np.ndarray,
    n: int,
    row_multiple: int = 512,
    word_multiple: int = 128,
):
    """Full device index build for k=5.

    Args:
      residue_idx: int32 [N, Lmax] alphabet indices (pad arbitrary).
      lengths: int32 [N] true lengths.

    Returns (words uint32 [N_pad, W_pad] device array, freq int32 [21^5]
    device array, n_repeated int). Matches the host
    ``build_index``+``pack_bitsets`` bit layout exactly.
    """
    from uniprot_kmer_based_clustering_tpu.kmers.encode import (
        encode_kmers_device,
    )

    codes, valid = encode_kmers_device(
        jnp.asarray(residue_idx), jnp.asarray(lengths), 5
    )
    n_pad = -(-max(n, 1) // row_multiple) * row_multiple
    if codes.shape[0] != n_pad:
        pad = n_pad - codes.shape[0]
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad), (0, 0)))

    # upper bound on W: distinct codes ≤ total valid windows
    # (host computes exactly; here we need a static shape — use the
    # universe bound /32, then trim on host if desired). To keep HBM sane
    # we run a first pass for n_repeated, then a second with the tight W.
    universe = 21**5
    w_bound = -(-universe // 32 // word_multiple) * word_multiple

    # pass 1: frequency only (cheap) to size W tightly
    from uniprot_kmer_based_clustering_tpu.kmers.index import (
        doc_freq_dense_device,
    )

    freq = doc_freq_dense_device(codes, valid, 5)
    n_repeated = int(jnp.sum(freq >= 2))
    w_pad = -(-max(n_repeated, 1) // 32 // word_multiple) * word_multiple
    del w_bound

    words, freq, n_rep_dev = _device_index_k5(
        codes, valid, n_pad=n_pad, w_pad=w_pad
    )
    assert int(n_rep_dev) == n_repeated
    return words, freq, n_repeated
