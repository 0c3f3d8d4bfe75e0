from uniprot_kmer_based_clustering_tpu.kmers.encode import (  # noqa: F401
    AMINO_ACIDS,
    decode_kmer,
    encode_kmers,
    encode_kmers_device,
    residues_to_indices,
)
from uniprot_kmer_based_clustering_tpu.kmers.index import (  # noqa: F401
    KmerIndex,
    build_index,
)
from uniprot_kmer_based_clustering_tpu.kmers.bitset import (  # noqa: F401
    BitsetMatrix,
    VirtualBitsetMatrix,
    pack_bitsets,
    pack_bitsets_device,
)
from uniprot_kmer_based_clustering_tpu.kmers.append import (  # noqa: F401
    append_to_index,
)
