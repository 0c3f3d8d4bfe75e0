from uniprot_kmer_based_clustering_tpu.utils.timing import StageTimers  # noqa: F401
