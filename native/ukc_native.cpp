// Native host-side runtime for the TPU k-mer clustering framework.
//
// Three roles (C ABI, loaded via ctypes from
// uniprot_kmer_based_clustering_tpu/io/native.py):
//
//   1. FASTA parsing — replaces the reference's seq_io reader-thread
//      pipeline (src/main.rs:62-74) with a single linear scan producing
//      flat id/sequence buffers + offsets, the layout the device arrays
//      want. Semantics match io/fasta.py::parse_fasta_bytes exactly
//      (id = first whitespace token after '>', CRLF tolerated, sequence
//      lines concatenated).
//
//   2. Bitset packing — scatter (protein, rank) incidences into the
//      packed uint32 presence matrix (LSB-first within a word), the
//      native counterpart of kmers/bitset.py::pack_bitsets.
//
//   3. CPU pairwise popcount sweep — the strongest dense CPU
//      formulation of the similarity stage (uint64 AND+popcount over the
//      upper triangle, multithreaded). Serves as an independent oracle
//      for the device engines and as the measured stand-in for the
//      reference's multithreaded CPU baseline (BENCH notes).
//
// Build: `make -C native` → native/build/libukc_native.so

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// FASTA
// ---------------------------------------------------------------------

// Pass 1: count records and byte totals so the caller can allocate.
// Returns 0 on success, negative on malformed input.
int ukc_fasta_stats(const uint8_t* data, int64_t len, int64_t* n_records,
                    int64_t* id_bytes, int64_t* seq_bytes) {
  int64_t n = 0, idb = 0, seqb = 0;
  int64_t i = 0;
  bool seen_header = false;
  while (i < len) {
    int64_t j = i;
    while (j < len && data[j] != '\n') j++;
    int64_t e = j;
    if (e > i && data[e - 1] == '\r') e--;
    if (e > i) {
      if (data[i] == '>') {
        n++;
        seen_header = true;
        int64_t k = i + 1;
        while (k < e && data[k] != ' ' && data[k] != '\t') k++;
        idb += k - (i + 1);
      } else {
        if (!seen_header) return -1;  // sequence before first header
        seqb += e - i;
      }
    }
    i = j + 1;
  }
  *n_records = n;
  *id_bytes = idb;
  *seq_bytes = seqb;
  return 0;
}

// Pass 2: fill the flat buffers. Offsets arrays have n_records+1 slots.
int ukc_fasta_parse(const uint8_t* data, int64_t len, uint8_t* id_buf,
                    int64_t* id_off, uint8_t* seq_buf, int64_t* seq_off) {
  int64_t rec = -1, idp = 0, seqp = 0;
  int64_t i = 0;
  id_off[0] = 0;
  seq_off[0] = 0;
  while (i < len) {
    int64_t j = i;
    while (j < len && data[j] != '\n') j++;
    int64_t e = j;
    if (e > i && data[e - 1] == '\r') e--;
    if (e > i) {
      if (data[i] == '>') {
        rec++;
        int64_t k = i + 1;
        while (k < e && data[k] != ' ' && data[k] != '\t') k++;
        std::memcpy(id_buf + idp, data + i + 1, k - (i + 1));
        idp += k - (i + 1);
        id_off[rec + 1] = idp;
        seq_off[rec + 1] = seqp;
      } else {
        if (rec < 0) return -1;
        std::memcpy(seq_buf + seqp, data + i, e - i);
        seqp += e - i;
        seq_off[rec + 1] = seqp;
      }
    }
    i = j + 1;
  }
  return 0;
}

// ---------------------------------------------------------------------
// Bitset packing
// ---------------------------------------------------------------------

// words is zero-initialized uint32[n_pad * w_pad]; incidences need not be
// sorted. Bit r%32 (LSB-first) of word r/32 marks rank r.
void ukc_pack_bits(const int32_t* prot, const int32_t* rank, int64_t nnz,
                   uint32_t* words, int64_t w_pad) {
  for (int64_t i = 0; i < nnz; i++) {
    int64_t p = prot[i];
    int64_t r = rank[i];
    words[p * w_pad + (r >> 5)] |= (1u << (r & 31));
  }
}

// ---------------------------------------------------------------------
// CPU pairwise sweep
// ---------------------------------------------------------------------

// row_stats: int64[n * 8] zero-initialized; layout matches
// ops.popcount.ROW_STAT_NAMES. pairs_out: int64[pairs_cap * 3] receives
// (i, j, count) for cross-class pairs with count > threshold (and
// same-class ones when include_same != 0). Returns the number of pairs
// found (may exceed pairs_cap; only the first pairs_cap are written).
int64_t ukc_popcount_sweep(const uint64_t* words, int64_t n, int64_t w64,
                           const int32_t* classes, int32_t threshold,
                           int64_t* row_stats, int64_t* pairs_out,
                           int64_t pairs_cap, int include_same,
                           int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next_row(0);
  std::atomic<int64_t> n_pairs(0);

  auto worker = [&]() {
    for (;;) {
      int64_t i = next_row.fetch_add(1);
      if (i >= n) break;
      const uint64_t* a = words + i * w64;
      int64_t* rs = row_stats + i * 8;
      for (int64_t j = i + 1; j < n; j++) {
        const uint64_t* b = words + j * w64;
        int64_t cnt = 0;
        for (int64_t w = 0; w < w64; w++)
          cnt += __builtin_popcountll(a[w] & b[w]);
        bool cross = classes[i] != classes[j];
        int64_t base = cross ? 0 : 4;
        rs[base + 0] += cnt;
        rs[base + 1] += cnt >= 1;
        rs[base + 2] += cnt > threshold;
        if (cnt > rs[base + 3]) rs[base + 3] = cnt;
        if (cnt > threshold && (cross || include_same)) {
          int64_t slot = n_pairs.fetch_add(1);
          if (slot < pairs_cap) {
            pairs_out[slot * 3 + 0] = i;
            pairs_out[slot * 3 + 1] = j;
            pairs_out[slot * 3 + 2] = cnt;
          }
        }
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return n_pairs.load();
}

}  // extern "C"
