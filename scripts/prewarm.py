"""Pre-warm the persistent compilation cache for the production shapes.

The axon tunnel charges 60-270 s per NEW compiled shape but ~5 s for a
persistent-cache hit (utils/accel.enable_persistent_cache docstring).
Running this once after a deploy (or a cache wipe) compiles the shapes
the CLI's default paths use — every later process rehydrates warm.

    python scripts/prewarm.py [fasta]    # default: the bundled dataset

Shapes are keyed on (N_pad, W_pad), so pre-warm with a corpus of the
same padded geometry as production traffic.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

FASTA = (
    sys.argv[1] if len(sys.argv) > 1 else "/root/reference/uniprot_arg.fasta"
)


def main():
    from uniprot_kmer_based_clustering_tpu.utils.accel import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from uniprot_kmer_based_clustering_tpu.config import PipelineConfig
    from uniprot_kmer_based_clustering_tpu.pipeline import run_pipeline

    for label, cfg in (
        ("two_pass", PipelineConfig(cluster="none")),
        ("fused", PipelineConfig(cluster="none", extract="fused")),
        ("full_dump", PipelineConfig(cluster="none", threshold=0)),
    ):
        t0 = time.time()
        res = run_pipeline(FASTA, cfg)
        print(
            f"prewarm {label}: {time.time() - t0:.1f} s, "
            f"{res.pairwise.pairs.shape[0]} pairs",
            flush=True,
        )


if __name__ == "__main__":
    main()
