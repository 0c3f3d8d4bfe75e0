from uniprot_kmer_based_clustering_tpu.io.fasta import (  # noqa: F401
    ProteinTable,
    read_fasta,
)
