"""Diamond orchestration tests (binary-independent paths)."""

import numpy as np
import pytest

from uniprot_kmer_based_clustering_tpu.align import align_pairs, diamond_available
from uniprot_kmer_based_clustering_tpu.align.diamond import TSV_HEADER, OUTFMT
from uniprot_kmer_based_clustering_tpu.io import read_fasta


def test_outfmt_matches_reference():
    # exact column set of src/graph/mod.rs:283-293
    assert OUTFMT == [
        "qseqid", "qlen", "sseqid", "slen", "qstart", "qend", "sstart",
        "send", "length", "pident", "evalue", "bitscore",
    ]
    assert TSV_HEADER.rstrip("\n").split("\t") == OUTFMT


def test_missing_binary_raises(toy_fasta, tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", "")
    table = read_fasta(toy_fasta)
    pairs = np.array([[0, 1, 5]], np.int64)
    with pytest.raises(RuntimeError, match="diamond binary not found"):
        align_pairs(table, pairs, str(tmp_path / "out.tsv"))


@pytest.mark.skipif(not diamond_available(), reason="diamond not installed")
def test_real_alignment(toy_fasta, tmp_path):
    table = read_fasta(toy_fasta)
    pairs = np.array([[0, 3, 5], [1, 4, 5]], np.int64)
    out = align_pairs(table, pairs, str(tmp_path / "blastp_output.tsv"))
    content = open(out).read()
    assert content.startswith(TSV_HEADER)


def test_diamond_failure_surfaces_per_pair(toy_fasta, tmp_path, monkeypatch):
    """Fault injection: a crashing diamond binary surfaces a per-pair
    error summary instead of aborting the process (the reference
    expect()-crashes the whole 12 h job, src/graph/mod.rs:270,293)."""
    import os
    import stat

    import numpy as np
    import pytest

    from uniprot_kmer_based_clustering_tpu.align import align_pairs
    from uniprot_kmer_based_clustering_tpu.io import read_fasta

    fake = tmp_path / "bin" / "diamond"
    fake.parent.mkdir()
    fake.write_text("#!/bin/sh\necho boom >&2\nexit 3\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv(
        "PATH", str(fake.parent) + os.pathsep + os.environ["PATH"]
    )

    table = read_fasta(toy_fasta)
    pairs = np.array([[0, 1, 5], [2, 3, 7]], np.int64)
    with pytest.raises(RuntimeError) as exc:
        align_pairs(table, pairs, str(tmp_path / "out.tsv"))
    assert "2 / 2 alignments failed" in str(exc.value)
    assert "rc=3" in str(exc.value) or "boom" in str(exc.value)


def test_profile_trace_written(toy_fasta, tmp_path):
    """--profile captures a jax.profiler trace directory."""
    import os

    from uniprot_kmer_based_clustering_tpu.cli import main

    prof = str(tmp_path / "trace")
    rc = main([
        "run", toy_fasta, "--engine", "xla", "--threshold", "2",
        "--out", str(tmp_path / "o"), "--cpu", "--profile", prof,
    ])
    assert rc == 0
    found = []
    for root, _dirs, files in os.walk(prof):
        found += files
    assert any(f.endswith((".pb", ".json.gz", ".trace.json.gz")) or "xplane" in f for f in found), found
