"""Batched agglomerative clustering on the MXU — the TPU-native
reformulation of the reference's tree semantics (SURVEY.md §7.4).

The reference's ``src/tree.rs`` inserts proteins one at a time and
greedily merges the two children whose **c-bitarray intersections**
(the AND of all members' k-mer bitsets) overlap the most
(``Node::balance``, src/tree.rs:179-240) — an inherently sequential,
insertion-order-dependent procedure (revived exactly in
``models/tree.py``). This module keeps the same similarity notion —
shared k-mers between cluster intersection signatures — but reorganizes
the control flow TPU-first:

  * every cluster keeps a packed **intersection signature** (the
    c-bitarray) as one row of a ``[N_pad, W]`` uint32 matrix;
  * each round computes ALL pairwise signature intersection counts in
    one int8 binary matmul (the same MXU machinery as the pair sweep);
  * every **mutual-argmax** pair with count ≥ min_shared merges (the
    batched analogue of balance()'s argmax merge; ties break to the
    lowest index, so the result is deterministic and insertion-order
    free);
  * merged signatures are the AND of the two parents; rounds repeat
    until no pair clears the gate — O(log N) rounds on clustered data
    instead of N sequential insertions.

Returns both a flat partition and the dendrogram (one merge edge per
round entry), i.e. the hierarchical structure the reference's tree
encodes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uniprot_kmer_based_clustering_tpu.ops.bitmul import unpack_words_to_int8


@functools.partial(jax.jit, static_argnames=())
def _round_argmax(sigs, active):
    """Per-row best mutual-merge candidate over active signature rows.

    Returns (best_j int32 [N], best_count int32 [N]) with inactive rows
    and the diagonal masked out. One [N, K]·[N, K]ᵀ int8 matmul.
    """
    a = unpack_words_to_int8(sigs)
    counts = jax.lax.dot_general(
        a, a, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    npad = counts.shape[0]
    eye = jnp.eye(npad, dtype=bool)
    ok = active[None, :] & active[:, None] & ~eye
    counts = jnp.where(ok, counts, -1)
    best_j = jnp.argmax(counts, axis=1).astype(jnp.int32)
    best_c = jnp.take_along_axis(counts, best_j[:, None], axis=1)[:, 0]
    return best_j, best_c


@jax.jit
def _merge_signatures(sigs, win, lose):
    """sigs[win] &= sigs[lose]; sigs[lose] = 0 (batched index update)."""
    merged = sigs[win] & sigs[lose]
    sigs = sigs.at[win].set(merged)
    return sigs.at[lose].set(jnp.zeros_like(merged))


@dataclass
class AgglomerativeResult:
    labels: np.ndarray        # [n] cluster label (minimum member index)
    merges: np.ndarray        # [M, 3] (winner, loser, shared_count) in order
    rounds: int


def agglomerative_cluster(
    bitset, n: int, min_shared: int = 1, max_rounds: int = 10_000
) -> AgglomerativeResult:
    """Cluster `n` proteins by iterative mutual-argmax signature merges.

    `bitset`: a BitsetMatrix (or any object with ``.words`` uint32
    [N_pad, W]). `min_shared`: minimum shared k-mers between the two
    cluster intersection signatures for a merge (the analogue of
    balance()'s "shares any k-mer" gate at 1).
    """
    words = np.asarray(bitset.words)
    n_pad = words.shape[0]
    sigs = jnp.asarray(words)
    active_np = np.zeros(n_pad, bool)
    active_np[:n] = True
    parent = np.arange(n_pad, dtype=np.int64)  # union-find for labels

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    merges: List[Tuple[int, int, int]] = []
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        best_j, best_c = jax.device_get(
            _round_argmax(sigs, jnp.asarray(active_np))
        )
        # mutual argmax pairs over the gate; i < j canonical; ties are
        # deterministic (argmax returns the first maximum)
        i_idx = np.arange(n_pad)
        mutual = (
            active_np
            & (best_c >= min_shared)
            & (best_j[best_j] == i_idx)
            & (i_idx < best_j)
        )
        winners = i_idx[mutual]
        losers = best_j[mutual]
        if winners.size == 0:
            break
        sigs = _merge_signatures(
            sigs, jnp.asarray(winners), jnp.asarray(losers)
        )
        for w, l, c in zip(winners, losers, best_c[winners]):
            merges.append((int(w), int(l), int(c)))
            parent[find(int(l))] = find(int(w))
        active_np[losers] = False

    labels = np.full(n, -1, np.int32)
    roots: dict = {}
    for i in range(n):
        r = find(i)
        if r not in roots:
            roots[r] = i  # first member = minimum index (ascending scan)
        labels[i] = roots[r]
    return AgglomerativeResult(
        labels=labels,
        merges=np.asarray(merges, np.int64).reshape(-1, 3),
        rounds=rounds,
    )
