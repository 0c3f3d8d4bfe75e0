from uniprot_kmer_based_clustering_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    make_mesh_2d,
    pad_for_mesh,
)
from uniprot_kmer_based_clustering_tpu.parallel.sharded import (  # noqa: F401
    doc_freq_psum,
    make_kaxis_extract,
    make_kaxis_sweep,
    make_kaxis_fused,
    make_ring_extract,
    make_ring_extract_2d,
    make_ring_fused,
    make_ring_fused_2d,
    make_ring_sweep,
    make_ring_sweep_2d,
    sharded_extract_pairs,
    sharded_pairwise_fused,
    sharded_pairwise_similarity,
    sharded_pairwise_similarity_2d,
    sharded_pairwise_similarity_kaxis,
    stage_mesh_inputs,
    stage_mesh_inputs_csr,
)
from uniprot_kmer_based_clustering_tpu.parallel.stream_mesh import (  # noqa: F401
    sweep_extract_stream_mesh,
)
