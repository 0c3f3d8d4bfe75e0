"""CLI surface tests (toy data, CPU engine)."""

import json
import os
import subprocess
import sys

import numpy as np

from uniprot_kmer_based_clustering_tpu.cli import main


def test_cli_run_artifacts(toy_fasta, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = main([
        "run", toy_fasta, "--engine", "xla", "--threshold", "2",
        "--out", out, "--dump-kmers", "--cpu",
    ])
    assert rc == 0
    parity = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parity["proteins"] == 60
    for name in ("pairs.tsv", "clusters.tsv", "stats.json", "pair_kmers.tsv"):
        assert os.path.exists(os.path.join(out, name)), name
    stats = json.load(open(os.path.join(out, "stats.json")))
    assert stats["parity"] == parity
    # pairs.tsv row count matches the gate counter
    rows = open(os.path.join(out, "pairs.tsv")).read().strip().splitlines()
    assert len(rows) - 1 == parity["pairs_over_threshold"]
    # shared-kmer dump: k-mer count per pair == pair score column
    krows = open(os.path.join(out, "pair_kmers.tsv")).read().strip().splitlines()[1:]
    scores = {tuple(r.split("\t")[:2]): int(r.split("\t")[6]) for r in rows[1:]}
    for r in krows:
        i, j, kmers = r.split("\t")
        assert len(kmers.split(",")) == scores[(i, j)]


def test_cli_all_pairs_stats_match_pairs_tsv(toy_fasta, tmp_path, capsys):
    """--all-pairs: stats.json counters must track pairs.tsv exactly
    (round-1 bug: parity_counters() hardcoded the cross-AMR lanes, so an
    --all-pairs run under-reported pairs_over_threshold)."""
    out = str(tmp_path / "out_ap")
    rc = main([
        "run", toy_fasta, "--engine", "xla", "--threshold", "2",
        "--all-pairs", "--out", out, "--cpu",
    ])
    assert rc == 0
    parity = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rows = open(os.path.join(out, "pairs.tsv")).read().strip().splitlines()
    assert len(rows) - 1 == parity["pairs_over_threshold"]
    assert parity["max_shared_kmers"] == max(
        int(r.split("\t")[6]) for r in rows[1:]
    )
    # the all-pairs gate is a strict superset of the cross-AMR gate
    out2 = str(tmp_path / "out_cross")
    rc = main([
        "run", toy_fasta, "--engine", "xla", "--threshold", "2",
        "--out", out2, "--cpu",
    ])
    assert rc == 0
    p_cross = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parity["pairs_over_threshold"] > p_cross["pairs_over_threshold"]
    cross_rows = set(
        open(os.path.join(out2, "pairs.tsv")).read().strip().splitlines()[1:]
    )
    assert cross_rows <= set(rows[1:])


def test_cli_tree_cluster_mode(toy_fasta, tmp_path):
    out = str(tmp_path / "out_tree")
    rc = main([
        "run", toy_fasta, "--engine", "xla", "--threshold", "2",
        "--cluster", "tree", "--out", out, "--cpu",
    ])
    assert rc == 0
    labels = {}
    for line in open(os.path.join(out, "clusters.tsv")).read().splitlines()[1:]:
        p, _id, _cls, lbl = line.split("\t")
        labels[int(p)] = int(lbl)
    assert len(labels) == 60
    assert min(labels.values()) >= 0


def test_cli_bad_args():
    import pytest

    with pytest.raises(SystemExit):
        main(["run", "x.fasta", "--k", "6"])


def test_cli_mesh_shape_matches_single_chip(toy_fasta, tmp_path, capsys):
    """--mesh-shape 2x4 (hierarchical ring) == single-chip xla run."""
    out1 = str(tmp_path / "out_1chip")
    rc = main([
        "run", toy_fasta, "--engine", "xla", "--threshold", "2",
        "--out", out1, "--cpu",
    ])
    assert rc == 0
    p1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out2 = str(tmp_path / "out_2d")
    rc = main([
        "run", toy_fasta, "--threshold", "2",
        "--mesh-shape", "2x4", "--out", out2, "--cpu",
    ])
    assert rc == 0
    p2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in ("proteins", "pairs_over_threshold", "max_shared",
                "cross_amr_pairs"):
        if key in p1:
            assert p1[key] == p2[key], key
    assert (
        open(os.path.join(out1, "pairs.tsv")).read()
        == open(os.path.join(out2, "pairs.tsv")).read()
    )


def test_cli_shard_axis_kmers_matches_single_chip(toy_fasta, tmp_path, capsys):
    """--shard-axis kmers (contraction sharding) == single-chip run."""
    out1 = str(tmp_path / "out_rows")
    rc = main([
        "run", toy_fasta, "--engine", "xla", "--threshold", "2",
        "--out", out1, "--cpu",
    ])
    assert rc == 0
    capsys.readouterr()

    out2 = str(tmp_path / "out_kaxis")
    rc = main([
        "run", toy_fasta, "--threshold", "2", "--devices", "4",
        "--shard-axis", "kmers", "--out", out2, "--cpu",
    ])
    assert rc == 0
    assert (
        open(os.path.join(out1, "pairs.tsv")).read()
        == open(os.path.join(out2, "pairs.tsv")).read()
    )


def test_cli_dump_proteins(toy_fasta, tmp_path):
    """proteins.tsv: reference protein-Debug parity (decoded k-mers, degree)."""
    out = str(tmp_path / "out_dp")
    rc = main([
        "run", toy_fasta, "--engine", "xla", "--threshold", "2",
        "--out", out, "--dump-proteins", "--cpu",
    ])
    assert rc == 0
    rows = open(os.path.join(out, "proteins.tsv")).read().strip().splitlines()
    assert rows[0].split("\t") == [
        "protein", "id", "amr_class", "length", "degree", "repeated_kmers"
    ]
    assert len(rows) - 1 == 60
    prows = open(os.path.join(out, "pairs.tsv")).read().strip().splitlines()[1:]
    deg = {}
    for r in prows:
        i, j = r.split("\t")[:2]
        deg[i] = deg.get(i, 0) + 1
        deg[j] = deg.get(j, 0) + 1
    total_kmers = 0
    for r in rows[1:]:
        p, _id, _cls, length, degree, kmers = r.split("\t")
        assert int(degree) == deg.get(p, 0)
        ks = [k for k in kmers.split(",") if k]
        assert all(len(k) == 5 for k in ks)
        total_kmers += len(ks)
    assert total_kmers > 0  # incidences exist on the toy set
