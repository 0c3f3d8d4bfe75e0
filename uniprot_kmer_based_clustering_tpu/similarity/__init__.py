from uniprot_kmer_based_clustering_tpu.similarity.pairwise import (  # noqa: F401
    PairwiseResult,
    extract_pairs,
    extract_pairs_fused,
    pairwise_similarity,
)
from uniprot_kmer_based_clustering_tpu.similarity.query import (  # noqa: F401
    QueryServer,
    query_shared_kmers,
)
