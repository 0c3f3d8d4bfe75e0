"""Deterministic toy FASTA shared by conftest and the multi-process
worker (both processes must synthesize byte-identical data)."""

import numpy as np


def write_toy_fasta(path: str) -> str:
    """Small synthetic FASTA with reference-format headers.

    Proteins are point-mutated copies of 4 shared templates so that k-mer
    sharing (within and across AMR classes) actually occurs, mirroring the
    homology structure of the real dataset.
    """
    rng = np.random.default_rng(42)
    aas = "CSTAGPDEQNHRKMILVWYF"
    classes = ["beta_lactam", "bacitracin", "MLS"]
    templates = [
        "".join(aas[j] for j in rng.integers(0, 20, int(n)))
        for n in rng.integers(60, 120, 4)
    ]
    lines = []
    for i in range(60):
        cls = classes[i % len(classes)]
        t = list(templates[i % len(templates)])
        n_mut = max(1, len(t) // 8)
        for p in rng.integers(0, len(t), n_mut):
            t[p] = aas[int(rng.integers(0, 20))]
        lines.append(f">P{i:05d}|FEATURES|UNIPROT|{cls}|gene{i}")
        lines.append("".join(t))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path
