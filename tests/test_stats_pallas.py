"""Parity tests for the Pallas statistics epilogue and the tri-MXU engine.

Both run in Pallas interpret mode on CPU against the XLA oracle
(ops.popcount.sweep_xla); on TPU the same code paths are exercised by
bench.py's golden gate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from uniprot_kmer_based_clustering_tpu.ops.bitmul import (
    _strip_counts,
    sweep_mxu,
)
from uniprot_kmer_based_clustering_tpu.ops.popcount import (
    sweep_xla,
    upper_triangle_tiles,
)
from uniprot_kmer_based_clustering_tpu.ops.stats_pallas import (
    stats_from_counts,
    stats_tiles,
)
from uniprot_kmer_based_clustering_tpu.ops.tri_mxu import sweep_tri_mxu


@pytest.fixture(scope="module")
def small_case():
    rng = np.random.default_rng(7)
    n_pad, w = 1536, 64
    n = 1500
    words = rng.integers(0, 2**32, size=(n_pad, w), dtype=np.uint32)
    words[n:] = 0
    classes = rng.integers(0, 4, size=n_pad).astype(np.int32)
    classes[n:] = -1
    rs, th, tiles = sweep_xla(jnp.asarray(words), classes, n, 10, tile=512)
    return words, classes, n, rs, th, tiles


def test_stats_pallas_square(small_case):
    words, classes, n, rs_ref, th_ref, _ = small_case
    wts = jnp.ones(words.shape[1] * 32, jnp.int8)
    counts = _strip_counts(jnp.asarray(words), jnp.asarray(words), wts)
    rs, th, _ = stats_from_counts(
        counts, classes, classes, i_off=0, j_off=0, n=n, threshold=10,
        interpret=True,
    )
    assert np.array_equal(rs_ref, np.asarray(rs, np.int64))
    assert np.array_equal(th_ref[:, :2], np.asarray(th))


def test_stats_pallas_strips(small_case):
    words, classes, n, rs_ref, th_ref, _ = small_case
    n_pad = words.shape[0]
    wts = jnp.ones(words.shape[1] * 32, jnp.int8)
    rs_acc = np.zeros((n_pad, 8), np.int64)
    bh = np.zeros((3, 3, 2), np.int32)
    for si in range(3):
        i0 = si * 512
        counts = _strip_counts(
            jnp.asarray(words[i0 : i0 + 512]), jnp.asarray(words[i0:]), wts
        )
        rs, th, _ = stats_from_counts(
            counts, classes[i0 : i0 + 512], classes[i0:],
            i_off=i0, j_off=i0, n=n, threshold=10, interpret=True,
        )
        lti, ltj = stats_tiles(512, n_pad - i0, i0, i0, 512)
        rs_acc[i0 : i0 + 512] = np.asarray(rs, np.int64)
        gb = i0 // 512
        bh[gb + lti, gb + ltj] += np.asarray(th)
    gti, gtj = upper_triangle_tiles(n_pad, 512)
    assert np.array_equal(rs_ref, rs_acc)
    assert np.array_equal(th_ref[:, :2], bh[gti, gtj])


def test_tri_mxu_raw(small_case):
    words, classes, n, rs_ref, th_ref, _ = small_case
    rs, th, _ = sweep_tri_mxu(
        jnp.asarray(words), jnp.asarray(classes), n, 10, interpret=True
    )
    assert np.array_equal(rs_ref, rs)
    assert np.array_equal(th_ref[:, :2], th)


def test_tri_mxu_weighted_matches_mxu(small_case):
    words, classes, n, _, _, _ = small_case
    rng = np.random.default_rng(11)
    wts = rng.integers(1, 50, size=words.shape[1] * 32).astype(np.int8)
    rs_ref, th_ref, _ = sweep_mxu(
        jnp.asarray(words), jnp.asarray(classes), n, 100,
        weights=wts, w_thresh=1, strip=words.shape[0],
    )
    rs, th, _ = sweep_tri_mxu(
        jnp.asarray(words), jnp.asarray(classes), n, 100,
        weights=wts, w_thresh=1, interpret=True,
    )
    assert np.array_equal(rs_ref, rs)
    assert np.array_equal(th_ref[:, :2], th)


def test_sweep_mxu_strip_schedules_agree(small_case):
    words, classes, n, rs_ref, th_ref, _ = small_case
    for strip in (512, 1536):
        rs, th, _ = sweep_mxu(
            jnp.asarray(words), jnp.asarray(classes), n, 10, strip=strip
        )
        assert np.array_equal(rs_ref, rs), strip
        assert np.array_equal(th_ref[:, :2], th), strip


def test_word_chunked_sweep_matches_unchunked(small_case):
    """Contraction-axis chunking (the HBM-bounded scale path) is exact."""
    words, classes, n, rs_ref, th_ref, _ = small_case
    for wc in (128, 256):
        rs, th, _ = sweep_mxu(
            jnp.asarray(words), jnp.asarray(classes), n, 10,
            strip=words.shape[0], word_chunk=wc,
        )
        assert np.array_equal(rs_ref, rs), wc
        assert np.array_equal(th_ref[:, :2], th), wc


def test_word_chunked_weighted_matches(small_case):
    words, classes, n, _, _, _ = small_case
    rng = np.random.default_rng(3)
    wts = rng.integers(1, 50, size=words.shape[1] * 32).astype(np.int8)
    ref = sweep_mxu(
        jnp.asarray(words), jnp.asarray(classes), n, 100,
        weights=wts, strip=words.shape[0],
    )
    got = sweep_mxu(
        jnp.asarray(words), jnp.asarray(classes), n, 100,
        weights=wts, strip=words.shape[0], word_chunk=128,
    )
    assert np.array_equal(ref[0], got[0])
    assert np.array_equal(ref[1], got[1])


def test_scan_schedule_matches(small_case):
    """One-compiled-shape block-pair scan == strip schedule == oracle."""
    words, classes, n, rs_ref, th_ref, _ = small_case
    for wc in (0, 32):
        rs, th, _ = sweep_mxu(
            jnp.asarray(words), jnp.asarray(classes), n, 10,
            strip=512, schedule="scan", word_chunk=wc,
        )
        assert np.array_equal(rs_ref, rs), wc
        assert np.array_equal(th_ref[:, :2], th), wc


def test_stats_pallas_traced_offsets(small_case):
    """The traced-offset epilogue (the scan schedule's, enumerating ALL
    tiles) matches the static-offset kernel on diagonal and off-diagonal
    blocks."""
    from uniprot_kmer_based_clustering_tpu.ops.stats_pallas import (
        stats_from_counts_traced,
    )

    words, classes, n, _, _, _ = small_case
    wts = jnp.ones(words.shape[1] * 32, jnp.int8)
    for (i0, j0, s, j) in [(0, 512, 512, 1024), (512, 512, 1024, 1024)]:
        counts = _strip_counts(
            jnp.asarray(words[i0 : i0 + s]),
            jnp.asarray(words[j0 : j0 + j]),
            wts,
        )
        rs_t, bh_t = stats_from_counts_traced(
            counts, classes[i0 : i0 + s], classes[j0 : j0 + j],
            jnp.int32(i0), jnp.int32(j0),
            n=n, threshold=10, interpret=True,
        )
        rs_s, th_s, (ti, tj, _) = stats_from_counts(
            counts, classes[i0 : i0 + s], classes[j0 : j0 + j],
            i_off=i0, j_off=j0, n=n, threshold=10, interpret=True,
        )
        assert np.array_equal(np.asarray(rs_t), np.asarray(rs_s)), (i0, j0)
        # the static variant skips fully-subdiagonal tiles (they mask to
        # zero); scatter it onto the full grid for comparison
        bh_s = np.zeros((s // 512, j // 512, 2), np.int32)
        bh_s[ti, tj] = np.asarray(th_s)
        assert np.array_equal(np.asarray(bh_t), bh_s), (i0, j0)
