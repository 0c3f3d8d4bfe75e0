"""The committed alignment artifact (artifacts/blastp_output.tsv): the
reference's only output file (src/graph/mod.rs:304-317) produced for the
465 golden pairs by the built-in Smith-Waterman backend (--align sw;
diamond is not installable in this environment — no egress — so the SW
TSV is the committed stand-in, same outfmt-6 columns).

Gates: row count (465 + header), column schema, pair identity vs the
golden pair list, and byte-level determinism of a re-aligned sample.
"""

import os

import numpy as np
import pytest

from uniprot_kmer_based_clustering_tpu.align.diamond import TSV_HEADER
from uniprot_kmer_based_clustering_tpu.align.sw_pairs import align_pairs_sw
from uniprot_kmer_based_clustering_tpu.config import PipelineConfig
from uniprot_kmer_based_clustering_tpu.pipeline import run_pipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "artifacts", "blastp_output.tsv")
FASTA = "/root/reference/uniprot_arg.fasta"


needs_data = pytest.mark.skipif(
    not (os.path.exists(ARTIFACT) and os.path.exists(FASTA)),
    reason="bundled dataset or committed artifact missing",
)


@needs_data
def test_artifact_rows_and_schema():
    lines = open(ARTIFACT).read().splitlines()
    assert lines[0] + "\n" == TSV_HEADER
    assert len(lines) == 1 + 465  # the golden pair count
    for ln in lines[1:]:
        cols = ln.split("\t")
        assert len(cols) == 12
        # qlen/slen/qstart/qend/sstart/send/length integers; pident float
        for c in (cols[1], cols[3], *cols[4:9]):
            int(c)
        assert 0.0 < float(cols[9]) <= 100.0
        float(cols[10]); float(cols[11])


@needs_data
def test_artifact_matches_golden_pairs_and_recompute():
    res = run_pipeline(FASTA, PipelineConfig(cluster="none"))
    pairs = res.pairwise.pairs
    assert pairs.shape[0] == 465
    table = res.table
    lines = open(ARTIFACT).read().splitlines()[1:]
    # identity coverage: row r aligns pair r (query=j, subject=i — the
    # reference's makedb side is the earlier vertex)
    for r in range(0, 465, 31):
        i, j = int(pairs[r, 0]), int(pairs[r, 1])
        cols = lines[r].split("\t")
        assert cols[0] == table.ids[j]
        assert cols[2] == table.ids[i]
        assert int(cols[1]) == int(table.lengths[j])
        assert int(cols[3]) == int(table.lengths[i])
    # byte-determinism: re-align a deterministic sample on the host DP
    sample = pairs[::40]
    out = align_pairs_sw(
        table, sample, os.path.join(os.path.dirname(ARTIFACT), ".tmp_sw"),
        device_scores=False,
    )
    got = open(out).read().splitlines()[1:]
    os.remove(out)
    want = [lines[r] for r in range(0, 465, 40)]
    assert got == want
