"""Connected-components clustering tests."""

import numpy as np

from uniprot_kmer_based_clustering_tpu.models.components import (
    connected_components,
    connected_components_device,
)


def _random_graph(rng, n, m):
    pairs = rng.integers(0, n, (m, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    return pairs


def test_union_find_basic():
    labels = connected_components(6, np.array([[0, 1], [1, 2], [4, 5]]))
    assert labels.tolist() == [0, 0, 0, 3, 4, 4]


def test_empty_graph():
    labels = connected_components(4, np.zeros((0, 2), np.int64))
    assert labels.tolist() == [0, 1, 2, 3]


def test_device_matches_host(rng):
    n = 200
    for m in (0, 10, 100, 400):
        pairs = _random_graph(rng, n, m)
        host = connected_components(n, pairs)
        if len(pairs) == 0:
            pairs = np.array([[0, 0]])  # device path needs ≥1 edge; self-loop is a no-op
        dev = np.asarray(
            connected_components_device(
                pairs[:, 0].astype(np.int32),
                pairs[:, 1].astype(np.int32),
                n=n,
            )
        )
        assert np.array_equal(host, dev)


def test_min_label_is_canonical(rng):
    n = 50
    pairs = _random_graph(rng, n, 80)
    labels = connected_components(n, pairs)
    for lbl in np.unique(labels):
        members = np.nonzero(labels == lbl)[0]
        assert members.min() == lbl


def test_sharded_matches_host(rng):
    from uniprot_kmer_based_clustering_tpu.models.components import (
        connected_components_sharded,
    )
    from uniprot_kmer_based_clustering_tpu.parallel import make_mesh

    n = 300
    m = 450
    pairs = rng.integers(0, n, size=(m, 2)).astype(np.int64)
    ref = connected_components(n, pairs)
    for d in (1, 3, 8):
        mesh = make_mesh(d)
        got = connected_components_sharded(mesh, pairs, n)
        assert np.array_equal(ref, got), d
