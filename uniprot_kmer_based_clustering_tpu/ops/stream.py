"""Out-of-core streaming MXU sweep: corpora larger than one device's HBM.

Every in-core engine keeps the packed ``[N_pad, W]`` uint32 bitset matrix
resident on the device (DESIGN.md known-limits: ~10 GB at a 100k synthetic
run — the single-chip ceiling). This engine keeps the packed matrix in
HOST memory and streams row *blocks* through the device:

* a **stationary group** of ``g`` row blocks is uploaded once and stays
  resident;
* every moving block ``j`` is uploaded once per group and swept against
  all stationary blocks ``i ≤ j`` of the group — the upper-triangle
  block-pair schedule of ``ops.bitmul._scan_sweep``, with the operands
  now explicit device arrays instead of in-HBM slices;
* statistics accumulate **on device** in donated ``[N_pad, 8]`` /
  ``[nb, nb, 2]`` buffers (one host fetch for the whole sweep); a tiny
  per-step probe scalar bounds the dispatch queue to ``inflight`` steps
  so host→device transfers never pile up unboundedly.

Host↔device traffic ≈ ``matrix_bytes · nbk / (2·g)`` for the moving
blocks plus one pass of stationaries — the same blocking trade-off as an
out-of-core matmul. Results are bit-identical to every in-core engine
(the core invariant; tests/test_stream.py pins pair-list equality).

This is the single-chip analogue of the mesh row sharding in
``parallel/sharded.py`` (which divides the residency by the device
count): a 1-chip user with a corpus beyond HBM streams; a pod user
shards. The reference has no counterpart — its whole 258M-edge graph
lives in a 512 GB RAM envelope (run.sh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from uniprot_kmer_based_clustering_tpu.ops.bitmul import (
    _counts_window_pair,
    bucket_pow2,
    stack_row_stats,
    topk_subtile_candidates,
)


@functools.partial(
    jax.jit,
    static_argnames=("n", "threshold", "block", "w_thresh", "word_chunk"),
    donate_argnames=("row_stats", "block_hits"),
)
def _stream_step(
    row_stats,   # int32 [N_pad, 8]   (donated accumulator)
    block_hits,  # int32 [nb, nb, 2]  (donated accumulator)
    wa,          # uint32 [bs, W] stationary block
    wb,          # uint32 [bs, W] moving block
    ca,          # int32 [bs]
    cb,          # int32 [bs]
    weights,     # int8 [W*32]
    i0,          # int32 scalar (traced) — global row offset of wa
    j0,          # int32 scalar (traced) — global row offset of wb
    *,
    n: int,
    threshold: int,
    block: int,
    w_thresh: int,
    word_chunk: int = 0,
):
    """One block-pair: counts matmul + stats, accumulated in place.

    Identical math to ``_scan_sweep``'s body (ops/bitmul.py) — the stats
    definitions are shared via :func:`stack_row_stats` so the engines
    cannot drift. ``probe`` (int32 scalar, NOT donated) forces step
    completion when fetched — the in-flight window bound.
    """
    bs = wa.shape[0]
    nbs = bs // block
    counts = _counts_window_pair(wa, wb, weights, word_chunk=word_chunk)
    gi = i0 + jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    gj = j0 + jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    valid = (gi < gj) & (gj < n)
    cross = valid & (ca[:, None] != cb[None, :])
    same = valid & ~cross
    rs, over_c, over_s = stack_row_stats(
        counts, cross, same, threshold, w_thresh
    )
    bh = jnp.stack(
        [
            over_c.astype(jnp.int32)
            .reshape(nbs, block, nbs, block).sum(axis=(1, 3)),
            over_s.astype(jnp.int32)
            .reshape(nbs, block, nbs, block).sum(axis=(1, 3)),
        ],
        axis=-1,
    )
    lanes8 = jnp.arange(8)[None, :]
    prev = jax.lax.dynamic_slice(row_stats, (i0, 0), (bs, 8))
    merged = jnp.where(lanes8 % 4 == 3, jnp.maximum(prev, rs), prev + rs)
    row_stats = jax.lax.dynamic_update_slice(row_stats, merged, (i0, 0))
    bi, bj = i0 // block, j0 // block
    prev_bh = jax.lax.dynamic_slice(block_hits, (bi, bj, 0), (nbs, nbs, 2))
    block_hits = jax.lax.dynamic_update_slice(
        block_hits, prev_bh + bh, (bi, bj, 0)
    )
    probe = counts[0, 0] + rs[0, 0]
    return row_stats, block_hits, probe


def _pad_rows(words: np.ndarray, classes: np.ndarray, multiple: int):
    """Zero-pad host rows (class −1) so the block schedule divides evenly.

    Padding rows have empty bitsets and invalid classes; the ``gj < n``
    mask already excludes them from every statistic, so extra padding is
    free correctness-wise (same contract as kmers.bitset.pack_bitsets)."""
    n_pad = words.shape[0]
    target = -(-n_pad // multiple) * multiple
    if target == n_pad:
        return words, classes
    words = np.concatenate(
        [words, np.zeros((target - n_pad, words.shape[1]), words.dtype)]
    )
    classes = np.concatenate(
        [classes, np.full(target - n_pad, -1, classes.dtype)]
    )
    return words, classes


def auto_stream_block(n_pad: int, w_words: int, block: int,
                      hbm_budget_bytes: int) -> int:
    """Stream-block row count: large blocks amortize dispatch and keep
    the MXU contraction long, but one block must fit comfortably many
    times over (stationary group + in-flight moving blocks + the int32
    counts square). Capped so the [bs, bs] counts block stays ≤ 1/16 of
    the budget and bs ≤ 4096 (beyond which the counts square dominates)."""
    bs = block
    while (
        bs * 2 <= 4096
        and bs * 2 <= n_pad
        and (bs * 2) * (bs * 2) * 4 <= hbm_budget_bytes // 16
    ):
        bs *= 2
    # round UP to a block multiple of n_pad only via padding (caller pads)
    return max(block, bs)


def sweep_mxu_stream(
    words_host: np.ndarray,
    classes: np.ndarray,
    n: int,
    threshold: int,
    *,
    bs: Optional[int] = None,
    block: int = 512,
    weights: Optional[np.ndarray] = None,
    w_thresh: int = 1,
    word_chunk: Optional[int] = None,
    hbm_budget_bytes: int = 13 << 30,
    inflight: int = 4,
):
    """Full upper-triangle sweep with the packed matrix in HOST memory.

    Args mirror :func:`ops.bitmul.sweep_mxu` (``bs`` plays ``strip``'s
    role: rows per streamed block). Returns the engine-agnostic
    ``(row_stats int64 [N_pad', 8], tile_hits int32 [nT, 2],
    (ti, tj, block))`` triple — note ``N_pad'`` may exceed
    ``words_host.shape[0]`` (rows padded to a ``bs`` multiple; padding
    rows carry zero stats).
    """
    words_host = np.ascontiguousarray(words_host)
    classes = np.asarray(classes, np.int32)
    if classes.shape[0] < words_host.shape[0]:
        classes = np.concatenate(
            [
                classes,
                np.full(words_host.shape[0] - classes.shape[0], -1, np.int32),
            ]
        )
    w_words = words_host.shape[1]
    if bs is None:
        bs = auto_stream_block(
            words_host.shape[0], w_words, block, hbm_budget_bytes
        )
    assert bs % block == 0, "stream block must be a multiple of the tile"
    words_host, classes = _pad_rows(words_host, classes, bs)
    n_pad = words_host.shape[0]
    nb = n_pad // block
    nbk = n_pad // bs

    if word_chunk is None:
        # bound the unpacked int8 transients (8× the packed block each)
        word_chunk = 0
        if 2 * bs * w_words * 32 > hbm_budget_bytes // 4:
            target = max(128, hbm_budget_bytes // 4 // (2 * bs * 32))
            base = w_words // 128
            best = 1
            for d in range(1, base + 1):
                if base % d == 0 and d * 128 <= target:
                    best = d
            word_chunk = best * 128

    # stationary group size: how many [bs, W] blocks stay resident
    block_bytes = bs * w_words * 4
    resident_budget = max(block_bytes, hbm_budget_bytes // 2)
    g = int(min(nbk, max(1, resident_budget // block_bytes)))

    wts = jnp.asarray(
        weights if weights is not None else np.ones(w_words * 32, np.int8),
        jnp.int8,
    )
    row_stats = jnp.zeros((n_pad, 8), jnp.int32)
    block_hits = jnp.zeros((nb, nb, 2), jnp.int32)
    cls_dev = [
        jax.device_put(classes[b * bs : (b + 1) * bs]) for b in range(nbk)
    ]

    probes = []
    for s0 in range(0, nbk, g):
        g_here = min(g, nbk - s0)
        stationary = [
            jax.device_put(words_host[(s0 + t) * bs : (s0 + t + 1) * bs])
            for t in range(g_here)
        ]
        for jb in range(s0, nbk):
            if jb < s0 + g_here:
                wb = stationary[jb - s0]
            else:
                wb = jax.device_put(words_host[jb * bs : (jb + 1) * bs])
            for t in range(g_here):
                ib = s0 + t
                if ib > jb:
                    continue
                row_stats, block_hits, probe = _stream_step(
                    row_stats, block_hits, stationary[t], wb,
                    cls_dev[ib], cls_dev[jb], wts,
                    jnp.int32(ib * bs), jnp.int32(jb * bs),
                    n=n, threshold=threshold, block=block,
                    w_thresh=w_thresh, word_chunk=word_chunk,
                )
                probes.append(probe)
                if len(probes) > inflight:
                    # completing step t-inflight bounds live moving-block
                    # buffers (uploads dispatch asynchronously; nothing
                    # else backpressures the queue)
                    jax.device_get(probes.pop(0))

    rs, bh = jax.device_get((row_stats, block_hits))
    from uniprot_kmer_based_clustering_tpu.ops.popcount import (
        upper_triangle_tiles,
    )

    ti, tj = upper_triangle_tiles(n_pad, block)
    return rs.astype(np.int64), bh[ti, tj], (ti, tj, block)


@functools.partial(
    jax.jit,
    static_argnames=("tile", "weighted", "cross_amr_only", "k"),
)
def _extract_stream_topk(
    wa,        # uint32 [B, tile, W] stacked row windows (i side)
    wb,        # uint32 [B, tile, W] stacked row windows (j side)
    ca,        # int32 [B, tile]
    cb,        # int32 [B, tile]
    weights,   # int8 [W*32]
    gi0s,      # int32 [B] global row offsets
    gj0s,      # int32 [B] global col offsets
    valid_t,   # bool [B]
    n,
    threshold,
    *,
    tile: int,
    weighted: bool,
    cross_amr_only: bool,
    k: int,
):
    """Recompute a batch of hit tiles from STACKED operands and compact
    survivors per tile with ``lax.top_k`` (the extract_pairs idiom, with
    the row windows shipped from host instead of sliced from a resident
    matrix). Returns (gi, gj, cnt) int32 [B, k]; unused slots cnt −1."""

    def step(carry, idx):
        counts = _counts_window_pair(
            wa[idx], wb[idx], weights if weighted else None
        )
        gi0 = gi0s[idx]
        gj0 = gj0s[idx]
        gi = gi0 + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        gj = gj0 + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        mask = (counts > threshold) & (gi < gj) & (gj < n) & valid_t[idx]
        if cross_amr_only:
            mask &= ca[idx][:, None] != cb[idx][None, :]
        bi, bj, bc = topk_subtile_candidates(
            mask.astype(jnp.int32), counts, gi0, gj0, tile=tile, k=k
        )
        return carry, (bi[0], bj[0], bc[0])  # one tile == one sub-tile

    _, (bi, bj, bc) = jax.lax.scan(step, 0, jnp.arange(wa.shape[0]))
    return bi, bj, bc


def extract_pairs_stream(
    words_host: np.ndarray,
    classes: np.ndarray,
    tile_hits: np.ndarray,
    tiles,
    n: int,
    threshold: int,
    cross_amr_only: bool = True,
    weights: Optional[np.ndarray] = None,
    batch_budget_bytes: int = 512 << 20,
) -> np.ndarray:
    """Pass-2 exact pair recovery for the streaming engine.

    Only the row windows of tiles that reported hits are (re)uploaded —
    ``2 · tile · W · 4`` bytes per hit tile, stacked into batches bounded
    by ``batch_budget_bytes``. Weighted mode note: ``_counts_window_pair``
    scales its SECOND operand, so weights ride on the ``wb`` stack —
    either operand is equivalent (the weight is a per-column scale of the
    product).
    """
    ti, tj, tile = tiles
    words_host = np.ascontiguousarray(words_host)
    classes = np.asarray(classes, np.int32)
    if classes.shape[0] < words_host.shape[0]:
        classes = np.concatenate(
            [
                classes,
                np.full(words_host.shape[0] - classes.shape[0], -1, np.int32),
            ]
        )
    if len(ti):
        # the sweep's tile enumeration may cover rows beyond the caller's
        # matrix (sweep-side padding to a stream-block multiple)
        n_pad = max(
            (int(max(ti.max(), tj.max())) + 1) * tile, words_host.shape[0]
        )
        words_host, classes = _pad_rows(words_host, classes, n_pad)

    hits_per_tile = tile_hits[:, 0].astype(np.int64)
    want = tile_hits[:, 0] > 0
    if not cross_amr_only:
        want |= tile_hits[:, 1] > 0
        hits_per_tile = hits_per_tile + tile_hits[:, 1]
    hit_tiles = np.nonzero(want)[0]
    if len(hit_tiles) == 0:
        return np.zeros((0, 3), dtype=np.int64)

    weighted = weights is not None
    wts = jnp.asarray(
        weights if weighted else np.ones(words_host.shape[1] * 32, np.int8),
        jnp.int8,
    )
    w_words = words_host.shape[1]
    batch = int(
        max(1, min(64, batch_budget_bytes // (2 * tile * w_words * 4)))
    )
    # sort by hit count so each batch's k bucket fits its tiles tightly
    hit_tiles = hit_tiles[np.argsort(-hits_per_tile[hit_tiles])]

    parts = []
    for lo in range(0, len(hit_tiles), batch):
        gsel = hit_tiles[lo : lo + batch]
        k = bucket_pow2(hits_per_tile[gsel].max(), 512, tile * tile)
        b = len(gsel)
        wa = np.zeros((batch, tile, w_words), np.uint32)
        wb = np.zeros((batch, tile, w_words), np.uint32)
        ca = np.full((batch, tile), -1, np.int32)
        cb = np.full((batch, tile), -1, np.int32)
        gi0s = np.zeros(batch, np.int32)
        gj0s = np.zeros(batch, np.int32)
        valid_t = np.zeros(batch, bool)
        for t, tsel in enumerate(gsel):
            i0 = int(ti[tsel]) * tile
            j0 = int(tj[tsel]) * tile
            wa[t] = words_host[i0 : i0 + tile]
            wb[t] = words_host[j0 : j0 + tile]
            ca[t] = classes[i0 : i0 + tile]
            cb[t] = classes[j0 : j0 + tile]
            gi0s[t] = i0
            gj0s[t] = j0
            valid_t[t] = True
        parts.append(
            _extract_stream_topk(
                jnp.asarray(wa), jnp.asarray(wb),
                jnp.asarray(ca), jnp.asarray(cb), wts,
                jnp.asarray(gi0s), jnp.asarray(gj0s), jnp.asarray(valid_t),
                jnp.int32(n), jnp.int32(threshold),
                tile=tile, weighted=weighted,
                cross_amr_only=cross_amr_only, k=k,
            )
        )
        del wa, wb  # the host stacks are the transient cost; drop eagerly

    out = []
    for bi, bj, bc in jax.device_get(parts):
        m = bc >= 0
        out.append(np.stack([bi[m], bj[m], bc[m]], axis=1).astype(np.int64))
    pairs = np.concatenate(out, axis=0)
    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
    return pairs[order]
