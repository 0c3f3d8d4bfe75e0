from uniprot_kmer_based_clustering_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    pad_for_mesh,
)
from uniprot_kmer_based_clustering_tpu.parallel.sharded import (  # noqa: F401
    doc_freq_psum,
    make_ring_sweep,
    sharded_pairwise_similarity,
)
