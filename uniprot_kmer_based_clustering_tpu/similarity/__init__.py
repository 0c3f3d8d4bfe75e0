from uniprot_kmer_based_clustering_tpu.similarity.pairwise import (  # noqa: F401
    PairwiseResult,
    extract_pairs,
    pairwise_similarity,
)
