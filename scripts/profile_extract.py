"""Validate + time the device-finalize extraction at scale (cache-fed)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from uniprot_kmer_based_clustering_tpu.utils.accel import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import jax.numpy as jnp

    from uniprot_kmer_based_clustering_tpu.kmers import pack_bitsets_device
    from uniprot_kmer_based_clustering_tpu.ops.bitmul import sweep_mxu
    from uniprot_kmer_based_clustering_tpu.similarity import pairwise as pw

    n = int(os.environ.get("UKC_SCALE_N", "100000"))
    z = np.load(f"/tmp/ukc_scale_{n}.npz")
    ip, ir, n_rep, classes = z["ip"], z["ir"], int(z["n_rep"]), z["classes"]

    bitset = pack_bitsets_device(ip, ir, n, n_rep, row_multiple=7 * 512)
    words = bitset.words
    cls_np = np.full(bitset.n_pad, -1, np.int32)
    cls_np[:n] = classes
    cls = jnp.asarray(cls_np)
    print("[pack] done", flush=True)

    t0 = time.perf_counter()
    rs, th, tl = sweep_mxu(words, cls, n, 10)
    print(f"[sweep first] {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    rs, th, tl = sweep_mxu(words, cls, n, 10)
    print(f"[sweep warm] {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    pairs = pw.extract_pairs(words, cls_np, th, tl, n=n, threshold=10)
    print(f"[extract two-pass first] {time.perf_counter()-t0:.1f}s "
          f"pairs={len(pairs)} dtype={pairs.dtype}", flush=True)
    for tag in ("warm1", "warm2"):
        t0 = time.perf_counter()
        pairs = pw.extract_pairs(words, cls_np, th, tl, n=n, threshold=10)
        print(f"[extract two-pass {tag}] {time.perf_counter()-t0:.1f}s",
              flush=True)
    tot = rs.sum(axis=0)
    assert len(pairs) == int(tot[2])
    assert (np.diff(pairs[:, 0] * (bitset.n_pad + 1.0) + pairs[:, 1]) > 0).all()

    t0 = time.perf_counter()
    rs_f, th_f, tl_f, cands = sweep_mxu(words, cls, n, 10, fused_k=None)
    print(f"[sweep fused first] {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    rs_f, th_f, tl_f, cands = sweep_mxu(words, cls, n, 10, fused_k=None)
    print(f"[sweep fused warm] {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    pairs_f = pw.extract_pairs_fused(
        words, cls_np, th_f, tl_f, cands, n=n, threshold=10
    )
    print(f"[extract fused first] {time.perf_counter()-t0:.1f}s", flush=True)
    assert np.array_equal(pairs_f, pairs)
    for tag in ("warm1", "warm2"):
        t0 = time.perf_counter()
        pairs_f = pw.extract_pairs_fused(
            words, cls_np, th_f, tl_f, cands, n=n, threshold=10
        )
        print(f"[extract fused {tag}] {time.perf_counter()-t0:.1f}s",
              flush=True)
    assert np.array_equal(pairs_f, pairs)
    print("[parity] fused == two-pass OK", flush=True)


if __name__ == "__main__":
    main()
