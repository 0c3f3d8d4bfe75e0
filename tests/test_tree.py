"""Cluster-tree tests: cached implementation vs direct transcription of
src/tree.rs, plus structural invariants."""

import numpy as np
import pytest

from uniprot_kmer_based_clustering_tpu.kmers.bitset import pack_bitsets
from uniprot_kmer_based_clustering_tpu.models.tree import (
    ClusterTree,
    build_tree,
)


def _popcount_and(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.bitwise_count(a & b).sum())


# --- direct (cache-free) transcription of the reference semantics -------
class _RefNode:
    def __init__(self, u, c, protein):
        self.children, self.u, self.c, self.protein = [], u, c, protein


def _ref_add_child(curr, child):
    if not curr.children:
        cloned = _RefNode(curr.u, curr.c, curr.protein)
        curr.protein = None
        curr.u = curr.u | child.u
        curr.c = curr.c & child.c
        curr.children = [cloned] + (child.children if child.children else [child])
        return
    had = bool(np.any(curr.u & child.u))
    curr.u = curr.u | child.u
    curr.c = curr.c & child.c
    curr.children.append(child)
    if had:
        _ref_balance(curr)


def _ref_balance(curr):
    m = len(curr.children)
    max_val, max_i, max_j = 0, 0, 0
    min_val = None
    for i in range(1, m):
        for j in range(i):
            v = _popcount_and(curr.children[i].c, curr.children[j].c)
            if v > max_val:
                max_val, max_i, max_j = v, i, j
            if min_val is None or v < min_val:
                min_val = v
    if min_val is None or max_val <= min_val:
        return
    one, two = curr.children[max_i], curr.children[max_j]
    if len(one.children) < len(two.children):
        adopter, adopted, rm = one, two, max_j
    else:
        adopter, adopted, rm = two, one, max_i
    del curr.children[rm]
    _ref_add_child(adopter, adopted)


def _ref_labels(root, n):
    labels = np.full(n, -1, np.int32)
    if root.protein is not None:
        labels[root.protein] = root.protein
        return labels
    for child in root.children:
        members, stack = [], [child]
        while stack:
            nd = stack.pop()
            if nd.protein is not None:
                members.append(nd.protein)
            stack.extend(nd.children)
        labels[np.asarray(members)] = min(members)
    return labels


def _random_bitset(rng, n, k, density):
    rows, cols = np.nonzero(rng.random((n, k)) < density)
    return pack_bitsets(
        rows.astype(np.int32), cols.astype(np.int32), n, k,
        row_multiple=8, word_multiple=128,
    )


@pytest.mark.parametrize("density,seed", [(0.05, 0), (0.2, 1), (0.01, 2)])
def test_matches_direct_transcription(density, seed):
    rng = np.random.default_rng(seed)
    n, k = 80, 400
    bs = _random_bitset(rng, n, k, density)
    w64 = np.ascontiguousarray(bs.words[:n]).view(np.uint64)

    tree = build_tree(bs, n)
    root = _RefNode(w64[0], w64[0], 0)
    for i in range(1, n):
        _ref_add_child(root, _RefNode(w64[i], w64[i], i))
    assert np.array_equal(tree.labels(n), _ref_labels(root, n))


def test_structural_invariants():
    rng = np.random.default_rng(5)
    n, k = 60, 300
    bs = _random_bitset(rng, n, k, 0.08)
    tree = build_tree(bs, n)
    w64 = np.ascontiguousarray(bs.words[:n]).view(np.uint64)

    seen = []

    def check(node):
        if node.protein is not None:
            assert not node.children
            seen.append(node.protein)
            return node.u.copy(), node.u.copy()
        assert node.children
        u = None
        c = None
        for ch in node.children:
            cu, cc = check(ch)
            u = cu if u is None else (u | cu)
            c = cc if c is None else (c & cc)
        assert np.array_equal(node.u, u), "u != union of descendants"
        assert np.array_equal(node.c, c), "c != intersection of descendants"
        return u, c

    check(tree.root)
    assert sorted(seen) == list(range(n))
    labels = tree.labels(n)
    assert (labels >= 0).all()
    # labels are canonical minima
    for lbl in np.unique(labels):
        assert np.nonzero(labels == lbl)[0].min() == lbl


def test_identical_proteins_cluster_together():
    # four copies of two disjoint k-mer sets → exactly two clusters
    n, k = 8, 256
    rows = np.repeat(np.arange(8), 10).astype(np.int32)
    cols = np.concatenate([np.arange(10) + (i % 2) * 100 for i in range(8)]).astype(np.int32)
    bs = pack_bitsets(rows, cols, n, k, row_multiple=8, word_multiple=128)
    labels = build_tree(bs, n).labels(n)
    assert len(np.unique(labels)) == 2
    assert (labels[::2] == labels[0]).all()
    assert (labels[1::2] == labels[1]).all()


def test_native_and_numpy_sims_paths_agree(monkeypatch):
    """The fused native AND+popcount cache path and the numpy fallback
    must build identical trees (labels are a full structural probe)."""
    from uniprot_kmer_based_clustering_tpu.models import tree as treemod

    rng = np.random.default_rng(3)
    n, k = 120, 500
    bs = _random_bitset(rng, n, k, 0.08)
    lab_default = build_tree(bs, n).labels(n)
    monkeypatch.setattr(treemod, "_native_rows", None)
    lab_numpy = build_tree(bs, n).labels(n)
    assert np.array_equal(lab_default, lab_numpy)


def test_cluster_tree_accepts_uint32_rows():
    """ClusterTree is public API and BitsetMatrix rows are uint32 — the
    natural direct input. The native cache kernel's ABI is uint64 rows,
    so non-uint64 inputs must fall through to the numpy path instead of
    raising ctypes.ArgumentError mid-insertion (environment-dependent
    crash: only reproduced with the native lib built)."""
    from uniprot_kmer_based_clustering_tpu.models.tree import ClusterTree

    rng = np.random.default_rng(9)
    n, k = 40, 300
    bs = _random_bitset(rng, n, k, 0.1)
    rows32 = bs.words  # uint32, NOT viewed as uint64
    assert rows32.dtype == np.uint32
    t = ClusterTree(0, rows32[0])
    for i in range(1, n):
        t.add_protein(i, rows32[i])
    lab32 = t.labels(n)
    lab64 = build_tree(bs, n).labels(n)  # the uint64 fast path
    assert np.array_equal(lab32, lab64)


def test_single_protein_tree():
    bs = _random_bitset(np.random.default_rng(0), 1, 64, 0.2)
    t = build_tree(bs, 1)
    assert t.labels(1).tolist() == [0]
