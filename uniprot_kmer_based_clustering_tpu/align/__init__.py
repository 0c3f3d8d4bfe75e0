from uniprot_kmer_based_clustering_tpu.align.diamond import (  # noqa: F401
    align_pairs,
    diamond_available,
)
