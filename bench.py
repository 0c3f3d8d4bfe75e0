"""Headline benchmark: pairwise-similarity pairs/s/chip on uniprot_arg.fasta.

Prints ONE JSON line:
  {"metric": "pairwise_similarity", "value": <pairs/s/chip>,
   "unit": "pairs/s/chip", "vs_baseline": <ratio>, ...extras}

Quality gate: the run only reports if the sweep reproduces the golden
parity counters (BASELINE.md) — a fast wrong kernel scores zero.

Baseline: the reference is a multithreaded Rust CPU program with no
published numbers (BASELINE.md); its 258M-edge graph engine needed a
512 GB/12 h SLURM envelope (run.sh). As a *conservative* stand-in we
measure the strongest CPU formulation of the same computation on this
host — scipy.sparse B·Bᵀ over the incidence matrix (exploits sparsity,
far faster than the reference's atomic-pointer graph) — and report
vs_baseline against it. Beating this stand-in by 10× strictly implies
beating the reference by more.

(The framework's own CPU fallback — the native sparse Gustavson sweep,
io/native.py sparse_sweep — is ~9× faster again than this scipy
stand-in, but it is part of the framework under test, not a baseline;
the baseline deliberately stays an independent external implementation.)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

FASTA = os.environ.get(
    "UKC_BENCH_FASTA", "/root/reference/uniprot_arg.fasta"
)
GOLDEN = {
    "edges_after_amr_filter": 5_300_233,
    "pairs_after_merge": 4_350_628,
    "pairs_over_threshold": 465,
    "max_shared_kmers": 567,
}


def _cpu_baseline_pairs_per_s(idx, table, n_pairs: float):
    """Scipy-sparse stand-in baseline, or None when scipy is missing —
    the bench must still emit its one JSON line (minutes of completed
    TPU measurement would otherwise die on the baseline import)."""
    try:
        import scipy.sparse as sp
    except ImportError:
        return None

    best = float("inf")
    for _ in range(3):  # best-of-3: the single shared CPU core is noisy
        t0 = time.perf_counter()
        b = sp.csr_matrix(
            (
                np.ones(idx.nnz, np.int32),
                (idx.incidence_protein, idx.incidence_rank),
            ),
            shape=(table.n, idx.n_repeated),
        )
        c = (b @ b.T).tocoo()
        i, j, v = c.row, c.col, c.data
        m = i < j
        cls = table.amr_class_ids
        vm = v[m]
        cross = cls[i[m]] != cls[j[m]]
        vc = vm[cross]
        # same reductions as the device sweep
        _ = (int(vc.sum()), int(cross.sum()), int((vc > 10).sum()))
        best = min(best, time.perf_counter() - t0)
    return n_pairs / best


def _baseline_fields(value: float, baseline):
    """vs_baseline record fields, tolerating a missing scipy baseline."""
    if baseline is None:
        return {"vs_baseline": 0.0, "baseline_unavailable": "scipy missing"}
    return {
        "vs_baseline": round(value / baseline, 2),
        "cpu_baseline_pairs_per_s": round(baseline, 1),
    }


def _probe_accelerator(timeout_s: int):
    """Shared subprocess probe (utils/accel.py): None on an accelerator,
    else the reason string for the CPU fallback."""
    from uniprot_kmer_based_clustering_tpu.utils.accel import (
        probe_accelerator,
    )

    return probe_accelerator(timeout_s)


def _main_cpu_fallback(reason: str):
    """Accelerator unreachable: report the framework's native CPU engine
    rate — clearly labeled — instead of hanging or dying silently (the
    driver records exactly one JSON line per round)."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from uniprot_kmer_based_clustering_tpu.io import native, read_fasta
    from uniprot_kmer_based_clustering_tpu.kmers import (
        build_index,
        encode_kmers,
    )

    table = read_fasta(FASTA)
    codes, koff = encode_kmers(table.seq_buf, table.offsets, 5)
    idx = build_index(codes, koff, 5)
    n_pairs = table.n * (table.n - 1) / 2.0
    classes = np.asarray(table.amr_class_ids, np.int32)

    fail = {
        "metric": "pairwise_similarity",
        "value": 0.0,
        "unit": "pairs/s/chip",
        "vs_baseline": 0.0,
    }
    if not native.available():
        print(json.dumps({
            **fail,
            "error": f"TPU unavailable ({reason}) and the native CPU "
                     "engine is not built",
        }))
        return

    best = float("inf")
    out = None
    for _ in range(5):  # best-of-5: the single shared core is noisy ±30%
        t0 = time.perf_counter()
        out = native.sparse_sweep(
            idx.incidence_protein, idx.incidence_rank, table.n,
            idx.n_repeated, classes, 10,
        )
        if out is None:
            break
        best = min(best, time.perf_counter() - t0)
    if out is None:
        print(json.dumps({
            **fail,
            "error": f"TPU unavailable ({reason}); native sweep failed",
        }))
        return
    row_stats, _pairs = out
    totals = row_stats.sum(axis=0)
    maxes = row_stats.max(axis=0)
    got = {
        "edges_after_amr_filter": int(totals[0]),
        "pairs_after_merge": int(totals[1]),
        "pairs_over_threshold": int(totals[2]),
        "max_shared_kmers": int(maxes[3]),
    }
    if got != GOLDEN:
        print(json.dumps({
            **fail, "error": f"golden parity FAILED: {got}",
        }))
        return

    baseline = _cpu_baseline_pairs_per_s(idx, table, n_pairs)
    value = n_pairs / best
    print(json.dumps({
        "metric": "pairwise_similarity",
        "value": round(value, 1),
        "unit": "pairs/s/chip",
        **_baseline_fields(value, baseline),
        "sweep_seconds": round(best, 4),
        "parity": "golden-exact",
        "device": "cpu (native C++ engine)",
        "tpu_unavailable": reason,
    }))


def main():
    # generous default: a slow-but-alive tunnel (cold backend init can
    # take minutes) should win over a premature CPU fallback; a dead
    # tunnel still produces the one JSON line after the wait
    probe_timeout = int(os.environ.get("UKC_BENCH_PROBE_TIMEOUT", "480"))
    reason = _probe_accelerator(probe_timeout)
    if reason is not None:
        _main_cpu_fallback(reason)
        return

    import jax

    from uniprot_kmer_based_clustering_tpu.utils.accel import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax.numpy as jnp

    from uniprot_kmer_based_clustering_tpu.io import read_fasta
    from uniprot_kmer_based_clustering_tpu.kmers import (
        build_index,
        encode_kmers,
        pack_bitsets,
    )
    from uniprot_kmer_based_clustering_tpu.ops.bitmul import sweep_mxu

    table = read_fasta(FASTA)
    codes, koff = encode_kmers(table.seq_buf, table.offsets, 5)
    idx = build_index(codes, koff, 5)
    bitset = pack_bitsets(
        idx.incidence_protein,
        idx.incidence_rank,
        table.n,
        idx.n_repeated,
        row_multiple=512,
    )
    words = jnp.asarray(bitset.words)
    classes = np.full(bitset.n_pad, -1, np.int32)
    classes[: table.n] = table.amr_class_ids
    classes = jnp.asarray(classes)
    n_pairs = table.n * (table.n - 1) / 2.0

    # warm-up / compile + quality gate
    row_stats, tile_hits, tiles = sweep_mxu(words, classes, table.n, 10)
    totals = row_stats.sum(axis=0)
    maxes = row_stats.max(axis=0)
    got = {
        "edges_after_amr_filter": int(totals[0]),
        "pairs_after_merge": int(totals[1]),
        "pairs_over_threshold": int(totals[2]),
        "max_shared_kmers": int(maxes[3]),
    }
    if got != GOLDEN:
        print(json.dumps({
            "metric": "pairwise_similarity",
            "value": 0.0,
            "unit": "pairs/s/chip",
            "vs_baseline": 0.0,
            "error": f"golden parity FAILED: {got}",
        }))
        return

    from uniprot_kmer_based_clustering_tpu.ops.bitmul import sweep_mxu_async

    # single synchronous call latency (includes the ~30 ms tunnel round
    # trip of the host fetch)
    reps = int(os.environ.get("UKC_BENCH_REPS", "5"))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rs, _, _ = sweep_mxu(words, classes, table.n, 10)
        times.append(time.perf_counter() - t0)
    latency = min(times)

    # steady-state throughput: dispatch `reps` back-to-back sweeps, fetch
    # once — the production regime (device work pipelines; the host fetch
    # amortizes). Best of two loops: the remote tunnel adds run-to-run
    # jitter (~±10%). The finalized stats re-check the golden gate.
    steady = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        handles = None
        for _ in range(reps):
            handles, finalize = sweep_mxu_async(words, classes, table.n, 10)
        rs2, _, _ = finalize(handles)
        steady = min(steady, (time.perf_counter() - t0) / reps)
        if not (rs2 == row_stats).all():
            print(json.dumps({
                "metric": "pairwise_similarity", "value": 0.0,
                "unit": "pairs/s/chip", "vs_baseline": 0.0,
                "error": "steady-state rerun diverged from golden run",
            }))
            return
    value = n_pairs / steady

    baseline = _cpu_baseline_pairs_per_s(idx, table, n_pairs)

    # the framework's own CPU fallback rate (native sparse sweep) —
    # reported for observability, NOT used as the baseline (it is part
    # of the framework under test)
    native_rate = None
    from uniprot_kmer_based_clustering_tpu.io import native as _native

    if _native.available():
        best = float("inf")
        for _ in range(2):  # best-of-2, like the scipy baseline
            t0 = time.perf_counter()
            out = _native.sparse_sweep(
                idx.incidence_protein, idx.incidence_rank, table.n,
                idx.n_repeated,
                np.asarray(table.amr_class_ids, np.int32), 10,
            )
            if out is None:
                break
            best = min(best, time.perf_counter() - t0)
        if best < float("inf"):
            native_rate = round(n_pairs / best, 1)

    print(json.dumps({
        "metric": "pairwise_similarity",
        "value": round(value, 1),
        "unit": "pairs/s/chip",
        **_baseline_fields(value, baseline),
        "sweep_seconds": round(steady, 4),
        "sync_latency_seconds": round(latency, 4),
        "cpu_native_engine_pairs_per_s": native_rate,
        "parity": "golden-exact",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
