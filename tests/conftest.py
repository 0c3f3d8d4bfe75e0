"""Test harness: force an 8-device virtual CPU mesh.

Must run before any jax backend initialization. The axon sitecustomize
pins JAX_PLATFORMS=axon (real TPU tunnel); tests always run on CPU so they
are hermetic and can emulate a multi-chip mesh.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def toy_fasta(tmp_path_factory):
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
    path = tmp_path_factory.mktemp("data") / "toy.fasta"
    lines = []
    for i in range(60):
        cls = classes[i % len(classes)]
        t = list(templates[i % len(templates)])
        n_mut = max(1, len(t) // 8)
        for p in rng.integers(0, len(t), n_mut):
            t[p] = aas[int(rng.integers(0, 20))]
        lines.append(f">P{i:05d}|FEATURES|UNIPROT|{cls}|gene{i}")
        lines.append("".join(t))
    path.write_text("\n".join(lines) + "\n")
    return str(path)


@pytest.fixture(scope="session")
def arg_fasta():
    """The bundled reference dataset (read-only)."""
    p = "/root/reference/uniprot_arg.fasta"
    if not os.path.exists(p):
        pytest.skip("reference dataset not available")
    return p
