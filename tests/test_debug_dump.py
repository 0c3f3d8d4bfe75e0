"""The reference's stdout graph dump (--dump-debug): byte-exact Rust
{:#?} text format (src/main.rs:235; Debug impls at
src/graph/mod.rs:700-708, src/graph/edge.rs:158-175,
src/graph/vertex.rs:159-166), hand-written expected literals."""

import os

from uniprot_kmer_based_clustering_tpu.cli import main


def _write(path, recs):
    with open(path, "w") as f:
        for rid, seq in recs:
            f.write(f">{rid}\n{seq}\n")
    return str(path)


def _run_dump(fasta, out):
    rc = main([
        "run", fasta, "--engine", "xla", "--threshold", "0",
        "--cluster", "none", "--dump-debug", "--out", out, "--cpu",
    ])
    assert rc == 0
    return open(os.path.join(out, "graph_debug.txt")).read()


def test_debug_dump_single_group(tmp_path, capsys):
    # A and B share all five 5-mers (ranks 0..4); C shares nothing
    p = _write(tmp_path / "t.fasta",
               [("A|x|u|classA|g", "MKTLLVLLF"),
                ("B|x|u|classB|g", "MKTLLVLLF"),
                ("C|x|u|classC|g", "WWWWYYYYF")])
    got = _run_dump(p, str(tmp_path / "out"))
    assert got == (
        "Graph right now:\n"
        "Graph {\n"
        "    Kmers: [\n"
        "        Kmer Group {\n"
        "            kmer: [\n"
        "                0,\n"
        "                1,\n"
        "                2,\n"
        "                3,\n"
        "                4,\n"
        "            ],\n"
        "            size: 2,\n"
        "        },\n"
        "    ],\n"
        "    Proteins: [\n"
        "        Protein {\n"
        "            key: 0,\n"
        "            size: 1,\n"
        "        },\n"
        "        Protein {\n"
        "            key: 1,\n"
        "            size: 1,\n"
        "        },\n"
        "        Protein {\n"
        "            key: 2,\n"
        "            size: 0,\n"
        "        },\n"
        "    ],\n"
        "}\n"
    )


def test_debug_dump_edge_order_by_owner_slot(tmp_path, capsys):
    """Edge order = ascending owning k-mer id then (i, j) — the
    reference's slot layout (src/graph/vertex.rs:59-140; the merge keeps
    the minimum-slot edge, src/graph/mod.rs:393-412). Pair (0,2) shares
    CCCCC (rank 0) so it precedes pair (0,1) sharing FFFFF (rank 1)
    despite the lexicographically earlier pair index."""
    p = _write(tmp_path / "t2.fasta",
               [("A|x|u|classA|g", "CCCCCAAFFFFF"),
                ("B|x|u|classB|g", "GGGGFFFFF"),
                ("C|x|u|classC|g", "CCCCCWWWW")])
    got = _run_dump(p, str(tmp_path / "out2"))
    assert got == (
        "Graph right now:\n"
        "Graph {\n"
        "    Kmers: [\n"
        "        Kmer Group {\n"
        "            kmer: [\n"
        "                0,\n"
        "            ],\n"
        "            size: 2,\n"
        "        },\n"
        "        Kmer Group {\n"
        "            kmer: [\n"
        "                1,\n"
        "            ],\n"
        "            size: 2,\n"
        "        },\n"
        "    ],\n"
        "    Proteins: [\n"
        "        Protein {\n"
        "            key: 0,\n"
        "            size: 2,\n"
        "        },\n"
        "        Protein {\n"
        "            key: 1,\n"
        "            size: 1,\n"
        "        },\n"
        "        Protein {\n"
        "            key: 2,\n"
        "            size: 1,\n"
        "        },\n"
        "    ],\n"
        "}\n"
    )


def test_debug_dump_empty(tmp_path, capsys):
    p = _write(tmp_path / "t3.fasta",
               [("A|x|u|classA|g", "MKTLLVLLF")])
    got = _run_dump(p, str(tmp_path / "out3"))
    assert got == (
        "Graph right now:\n"
        "Graph {\n"
        "    Kmers: [],\n"
        "    Proteins: [\n"
        "        Protein {\n"
        "            key: 0,\n"
        "            size: 0,\n"
        "        },\n"
        "    ],\n"
        "}\n"
    )
