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
