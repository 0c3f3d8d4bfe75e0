"""Scale benchmark: UniProt-scale synthetic run (BASELINE config #5).

Synthesizes N proteins (default 30,000) as point-mutated copies of shared
templates — the homology structure that makes k-mer clustering meaningful —
then runs the full index → bitset → strip sweep on the default device and
prints one JSON line with pairs/s/chip at scale.

This exercises the code paths the bundled 10,619-protein dataset cannot:
the auto-strip fallback (counts matrix exceeds the HBM budget) and
multi-million-bit rows. Usage:

    UKC_SCALE_N=30000 python bench_scale.py

UKC_SCALE_K=7 switches to the 7-mer universe (the src/tree.rs:96-105
capability at scale): 21^7 ≈ 1.8e9 codes (still < 2^31, int64 host
encode), sort-based rank compaction, and — on an accelerator — the
device sorted index build (kmers/index_device.build_bitset_device_sorted)
timed and parity-gated against the host index. Pick the mutation knobs so
the repeated-7-mer universe lands in the millions while the packed bitset
stays single-chip, e.g.:

    UKC_SCALE_K=7 UKC_SCALE_N=30000 UKC_SCALE_TEMPLATES=50 \
        UKC_SCALE_MUTDIV=6 python bench_scale.py   # ~1.1M repeated 7-mers

Every run is oracle-gated on a CPU-verifiable subset: sampled pairs are
re-counted exactly from the host incidence lists (an independent
structure from the packed bitset) and checked for membership + count
against the extracted pair list.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def synth_proteins(n: int, seed: int = 0):
    """Template-mutation synthetic dataset (ids carry synthetic AMR classes).

    UKC_SCALE_TEMPLATES caps the template count — the repeated-k-mer
    universe (and so the packed bitset) scales with it, which is the knob
    for fitting 100k+ single-chip runs in HBM (the row-sharded mesh path
    divides the bitset instead at multi-host scale).
    """
    rng = np.random.default_rng(seed)
    aas = np.frombuffer(b"CSTAGPDEQNHRKMILVWYF", np.uint8)
    # defaults auto-scale so the packed bitset stays single-chip: past
    # ~50k proteins the repeated-k-mer universe (dominated by
    # same-template mutation collisions) must be capped or the matrix
    # outgrows the 15.75 GB HBM (100k at the small-N defaults → 31 GB)
    n_templates = int(
        os.environ.get(
            "UKC_SCALE_TEMPLATES", max(50, min(250, n // 100))
        )
    )
    n_classes = 15
    lengths = rng.integers(150, 500, n_templates)
    templates = [aas[rng.integers(0, 20, int(L))] for L in lengths]

    # UKC_SCALE_MUTDIV: residues per mutation (higher = fewer mutations =
    # smaller collision-mutant k-mer universe; the repeated-k-mer count —
    # and so the packed bitset size — is dominated by same-template
    # same-position mutation collisions at high proteins-per-template).
    mut_div = int(
        os.environ.get("UKC_SCALE_MUTDIV", "12" if n <= 50_000 else "50")
    )
    seqs = []
    classes = np.empty(n, np.int32)
    for i in range(n):
        t = templates[i % n_templates].copy()
        n_mut = max(1, len(t) // mut_div)
        pos = rng.integers(0, len(t), n_mut)
        t[pos] = aas[rng.integers(0, 20, n_mut)]
        seqs.append(t)
        # class independent of template so homologous pairs cross classes
        classes[i] = int(rng.integers(0, n_classes))
    seq_buf = np.concatenate(seqs)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    return seq_buf, offsets, classes


def oracle_gate(
    idx, classes, pairs, n: int, threshold: int, samples: int = 512,
    seed: int = 7,
) -> int:
    """CPU-verifiable subset oracle for the extracted pair list.

    Re-counts sampled pairs exactly from the host incidence lists — an
    independent structure from the packed bitset the device swept — via
    per-protein sorted-rank intersection (the Gustavson walk the native
    engine and the host QueryServer use). Gates BOTH directions:

      * `samples` uniform random pairs: membership in the extracted list
        must equal (count > threshold and cross-AMR), and the stored
        count must match exactly;
      * `samples` pairs drawn FROM the list: count, gate and class test
        re-verified.

    Returns the number of pairs checked; raises AssertionError on any
    mismatch (the bench dies rather than commit a bad artifact).
    """
    rng = np.random.default_rng(seed)
    off = np.zeros(n + 1, np.int64)
    np.cumsum(
        np.bincount(idx.incidence_protein, minlength=n), out=off[1:]
    )
    ir = idx.incidence_rank

    def count(i: int, j: int) -> int:
        # per-protein rank lists are sorted unique (index build sorts by
        # (protein, code); rank order == code order)
        return int(
            np.intersect1d(
                ir[off[i]: off[i + 1]],
                ir[off[j]: off[j + 1]],
                assume_unique=True,
            ).shape[0]
        )

    from uniprot_kmer_based_clustering_tpu.similarity.pairwise import (
        packed_key,
        packed_pair,
    )

    # Either pair-list format: packed int64 [M] (searched directly — no
    # host-side [M] key build, which cost ~25 s of throttled RAM writes
    # at 133M pairs) or canonical [M, 3] int32.
    is_packed = pairs.ndim == 1
    if not is_packed:
        keys = (
            pairs[:, 0].astype(np.int64) * n
            + pairs[:, 1].astype(np.int64)
        )

    def lookup(i: int, j: int):
        """(member, stored_count) for pair (i, j)."""
        if is_packed:
            p = int(np.searchsorted(pairs, packed_key(i, j)))
            if p < len(pairs):
                pi, pj, pc = packed_pair(pairs[p])
                if (pi, pj) == (i, j):
                    return True, pc
            return False, -1
        key = i * n + j
        p = int(np.searchsorted(keys, key))
        if p < len(keys) and keys[p] == key:
            return True, int(pairs[p, 2])
        return False, -1

    checked = 0
    for i, j in rng.integers(0, n, size=(samples, 2)):
        if i == j:
            continue
        i, j = (int(i), int(j)) if i < j else (int(j), int(i))
        c = count(i, j)
        expect = c > threshold and classes[i] != classes[j]
        member, stored = lookup(i, j)
        assert member == expect, (
            f"oracle gate: pair ({i},{j}) count={c} "
            f"cross={classes[i] != classes[j]} expect_member={expect} "
            f"but list_member={member}"
        )
        if member:
            assert stored == c, (
                f"oracle gate: pair ({i},{j}) list count "
                f"{stored} != exact {c}"
            )
        checked += 1
    if len(pairs):
        for s in np.unique(
            rng.integers(0, len(pairs), min(samples, len(pairs)))
        ):
            if is_packed:
                i, j, c = packed_pair(pairs[s])
            else:
                i, j, c = (int(v) for v in pairs[s])
            assert count(i, j) == c and c > threshold, (
                f"oracle gate: listed pair ({i},{j},{c}) exact count "
                f"{count(i, j)}"
            )
            assert classes[i] != classes[j], (
                f"oracle gate: listed pair ({i},{j}) is same-class"
            )
            checked += 1
    return checked


def _device_index_gate(idx, seq_buf, offsets, n: int) -> dict:
    """Time the on-device sorted index build and gate it against the host.

    ``build_bitset_device_sorted`` (kmers/index_device.py) is the any-k
    device path — global sort over incidence codes, group-id cumsum,
    repeated-rank cumsum, single-bit scatter. Parity gate, all exact:
    distinct codes + doc-freq arrays, repeated count, per-row popcounts
    of the packed words, and a 64-row word-level sample rebuilt from the
    host incidence lists. Raises on any mismatch.

    Runs BEFORE the sweep bitset is packed so its ~4 GB words matrix can
    be dropped before the sweep claims HBM.
    """
    import jax
    import jax.numpy as jnp

    from uniprot_kmer_based_clustering_tpu.kmers.encode import (
        residues_to_indices,
    )
    from uniprot_kmer_based_clustering_tpu.kmers.index_device import (
        build_bitset_device_sorted,
    )

    lengths = np.diff(offsets).astype(np.int32)
    # padded [N, Lmax] residue matrix via one offsets-based scatter (the
    # pipeline's staging, pipeline.py _device_index)
    res = residues_to_indices(seq_buf)
    lmax = int(lengths.max()) if n else 1
    res_idx = np.zeros((n, lmax), np.int32)
    rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
    cols = np.arange(res.shape[0], dtype=np.int64) - np.repeat(
        np.asarray(offsets[:-1], np.int64), lengths
    )
    res_idx[rows, cols] = res
    rowsum = jax.jit(
        lambda w: jnp.sum(
            jax.lax.population_count(w), axis=1, dtype=jnp.int32
        )
    )

    def build(keep_words: bool):
        # the words matrix is ~4 GB at the 7-mer design point — at most
        # ONE may be alive at a time or the warm rebuild OOMs next to
        # the first build's output (HBM is 15.75 GB incl. transients)
        t0 = time.perf_counter()
        words, dc, df, nr = build_bitset_device_sorted(
            res_idx, lengths, n, idx.k
        )
        pc = np.asarray(rowsum(words))  # sync + full-matrix parity vec
        if not keep_words:
            words = None
        return time.perf_counter() - t0, words, (dc, df, nr), pc

    t_cold, dwords, (dcodes, dfreq, dnrep), pc = build(keep_words=True)

    assert dnrep == idx.n_repeated, (dnrep, idx.n_repeated)
    assert np.array_equal(dcodes, idx.codes)
    assert np.array_equal(dfreq, idx.doc_freq)
    row_counts = np.bincount(idx.incidence_protein, minlength=n)
    assert np.array_equal(pc[:n], row_counts.astype(np.int32))
    assert not pc[n:].any()

    # 64-row word-level sample, expected words rebuilt host-side
    off = np.zeros(n + 1, np.int64)
    np.cumsum(row_counts, out=off[1:])
    rng = np.random.default_rng(3)
    rows = np.sort(rng.choice(n, min(64, n), replace=False))
    w_pad = int(dwords.shape[1])
    exp = np.zeros((rows.shape[0], w_pad), np.uint32)
    for a, r in enumerate(rows):
        rk = idx.incidence_rank[off[r]: off[r + 1]].astype(np.int64)
        np.bitwise_or.at(
            exp[a], rk >> 5, np.uint32(1) << (rk & 31).astype(np.uint32)
        )
    got = np.asarray(dwords[jnp.asarray(rows)])
    assert np.array_equal(got, exp), "device index words != host bits"
    del dwords  # release ~GBs of HBM before the warm rebuilds

    t_warm = float("inf")
    for _ in range(2):
        dt, _, (dcodes2, dfreq2, dnrep2), pc2 = build(keep_words=False)
        t_warm = min(t_warm, dt)
        assert dnrep2 == dnrep and np.array_equal(pc2, pc)

    return {
        "dev_index_cold_seconds": round(t_cold, 1),
        "dev_index_warm_seconds": round(t_warm, 1),
        "dev_index_parity": (
            "host-exact (codes+doc_freq+row-popcounts+64-row words)"
        ),
        "dev_index_note": (
            "warm time includes the distinct-code/doc-freq readback "
            "(~16 B/code) at tunnel device->host rates"
        ),
    }


def _stream_only_run(n: int, kk: int, blk: int) -> None:
    """Beyond-HBM design point: the packed bitset does NOT fit on the
    chip, so the in-core engines cannot run at all — the out-of-core
    stream engine (ops/stream.py: stationary row-block groups resident
    under the HBM budget, moving blocks streamed through) is the ONLY
    viable path, and parity is gated purely by the CPU subset oracle
    (exact re-counts from the host incidence lists, both directions)
    instead of in-core pair-list equality.

    Enabled by UKC_SCALE_STREAM_ONLY=1. The intended configuration is
    the 7-mer universe past single-chip HBM — the declared scaling axis
    of the reference's dead tree path (src/tree.rs:96-105, SURVEY §7.4):

        UKC_SCALE_K=7 UKC_SCALE_N=100000 UKC_SCALE_TEMPLATES=35 \\
            UKC_SCALE_MUTDIV=8 UKC_SCALE_STREAM_ONLY=1 python bench_scale.py

    → ~1.64M repeated 7-mers, ~19 GiB packed matrix vs 15.75 GB HBM.
    """
    import jax

    from uniprot_kmer_based_clustering_tpu.kmers import (
        build_index,
        encode_kmers,
    )
    from uniprot_kmer_based_clustering_tpu.kmers.bitset import pack_bitsets

    t0 = time.perf_counter()
    seq_buf, offsets, classes = synth_proteins(n)
    t_synth = time.perf_counter() - t0

    t0 = time.perf_counter()
    codes, koff = encode_kmers(seq_buf, offsets, kk)
    idx = build_index(codes, koff, kk)
    t_index = time.perf_counter() - t0

    # block source: "csr" (default) keeps the DENSE matrix virtual —
    # the ~0.02%-dense incidence lists upload once and every [bs, W]
    # block materializes ON DEVICE (the r04 finding: the host-words
    # stream re-moved ~49 GiB of mostly zeros through the ~45 MB/s
    # tunnel, which WAS the whole 19 GiB design point's cost — the
    # sweep step itself is 18 ms). "host" packs on the host and
    # streams dense blocks (the right source on real PCIe hosts).
    # UKC_SCALE_THRESHOLD: alignment gate override (default 10). The
    # 250k stretch point uses a higher gate so the exact survivor list
    # stays within the one-pass device pair buffers (survivors scale
    # ~N² on template-mutation corpora; the engine would detect the
    # capacity miss and redo exactly, but that is a second full pass).
    thr = int(os.environ.get("UKC_SCALE_THRESHOLD", "10"))
    src_mode = os.environ.get("UKC_SCALE_STREAM_SOURCE", "csr")
    from uniprot_kmer_based_clustering_tpu.ops.stream import (
        CSRBlockSource,
    )

    t0 = time.perf_counter()
    if src_mode == "csr":
        w_words = -(-idx.n_repeated // 32)
        w_pad = -(-w_words // 128) * 128
        source = CSRBlockSource(
            idx.incidence_protein, idx.incidence_rank, n, w_pad
        )
        words_arg = None
        n_pad0 = -(-n // (7 * blk)) * (7 * blk)
        matrix_gib = n_pad0 * w_pad * 4 / 2**30  # virtual: never built
        t_pack = time.perf_counter() - t0  # CSR prep only
    else:
        source = None
        bs_host = pack_bitsets(
            idx.incidence_protein, idx.incidence_rank, n,
            idx.n_repeated,
            row_multiple=7 * blk,
        )
        words_arg = bs_host.words
        t_pack = time.perf_counter() - t0
        matrix_gib = bs_host.words.nbytes / 2**30

    budget_gib = float(os.environ.get("UKC_SCALE_STREAM_BUDGET", "0"))

    # UKC_SCALE_STREAM_BS: stream row-block override (smaller blocks
    # shrink the per-step program at the price of more steps/drains).
    sbs = int(os.environ.get("UKC_SCALE_STREAM_BS", "0")) or 7 * blk
    sweep_kw = dict(block=blk, bs=sbs)
    if budget_gib:
        sweep_kw["hbm_budget_bytes"] = int(budget_gib * (1 << 30))
    # UKC_SCALE_CAP: explicit pair-buffer rows (the auto cap is
    # hbm/8/12 ≈ 145M — the 250k stretch point's survivor list is
    # larger, and a capacity miss would redo the whole pass)
    cap_env = int(os.environ.get("UKC_SCALE_CAP", "0"))
    if cap_env:
        sweep_kw["cap"] = cap_env
    # UKC_SCALE_STREAM_CKPT=dir: run the pass with group-boundary
    # checkpointing enabled — the artifact records the measured
    # snapshot overhead (stream_trace.ckpt_s) against the whole pass
    ckpt_dir = os.environ.get("UKC_SCALE_STREAM_CKPT")
    if ckpt_dir:
        from uniprot_kmer_based_clustering_tpu.utils.checkpoint import (
            CheckpointStore,
        )

        sweep_kw["checkpoint_store"] = CheckpointStore(ckpt_dir)
        sweep_kw["checkpoint_key"] = "bench-stream-progress"

    if source is not None:
        sweep_kw["block_source"] = source
        cls_np = classes  # the engine pads rows itself
        w_report = source.w_words
    else:
        cls_np = np.full(bs_host.n_pad, -1, np.int32)
        cls_np[:n] = classes
        w_report = bs_host.words.shape[1]

    # ONE cold pass of the ONE-PASS engine (stats + survivor compaction
    # into device pair buffers, one final device-sorted fetch — no
    # fused-candidate capacity guessing, no per-step drain volume, no
    # large-k top_k remote-compile hazard). Cold because the engine is
    # transfer-bound (cold ≈ warm, BENCH_engines traces) and the tunnel
    # client leaks every uploaded byte into host RSS (DESIGN.md
    # known-limits) — repeated full-matrix passes are neither
    # representative nor affordable.
    from uniprot_kmer_based_clustering_tpu.ops import stream as stream_mod
    from uniprot_kmer_based_clustering_tpu.ops.stream import (
        sweep_extract_stream,
    )

    t0 = time.perf_counter()
    rs, th, tl, pairs = sweep_extract_stream(
        words_arg, cls_np, n, thr, pair_format="packed", **sweep_kw
    )
    t_sweep = time.perf_counter() - t0  # sweep AND extraction: one pass
    t_first = t_sweep
    trace = dict(stream_mod.last_onepass_trace or {})
    t_extract = float(trace.get("fetch_s", 0.0))

    tot = rs.sum(axis=0)
    assert len(pairs) == int(tot[2]), (len(pairs), int(tot[2]))
    t0 = time.perf_counter()
    n_checked = oracle_gate(idx, classes, pairs, n, thr)
    t_oracle = time.perf_counter() - t0

    # UKC_SCALE_STREAM_MESH=D: re-run the SAME design point through the
    # sharded out-of-core composition (parallel/stream_mesh.py) on a
    # D-device flat mesh and gate its pair list EXACTLY against the
    # single-chip one-pass list just produced — the hardware proof that
    # the {out-of-core} × {mesh} cell agrees bit-for-bit at beyond-HBM
    # scale (one physical chip here, so D=1 is the honest hardware
    # point; D>1 is CPU-mesh/dryrun territory).
    mesh_stats = {}
    mesh_d = int(os.environ.get("UKC_SCALE_STREAM_MESH", "0"))
    if mesh_d and src_mode == "csr":
        from uniprot_kmer_based_clustering_tpu.parallel import (
            make_mesh,
            stream_mesh,
        )
        from uniprot_kmer_based_clustering_tpu.parallel.stream_mesh import (
            sweep_extract_stream_mesh,
        )

        mesh = make_mesh(mesh_d)
        t0 = time.perf_counter()
        rs_m, th_m, _, pairs_m = sweep_extract_stream_mesh(
            mesh, classes, n, thr,
            block_source=CSRBlockSource(
                idx.incidence_protein, idx.incidence_rank, n,
                source.w_words,
            ),
            pair_format="packed", **{
                k: v for k, v in sweep_kw.items()
                if k not in (
                    "block_source", "checkpoint_store", "checkpoint_key",
                )
            },
        )
        t_mesh = time.perf_counter() - t0
        assert np.array_equal(pairs_m, pairs), (
            "stream-mesh pair list != single-chip one-pass"
        )
        assert np.array_equal(rs_m.sum(axis=0), tot)
        mesh_stats = {
            "stream_mesh_devices": mesh_d,
            "stream_mesh_seconds": round(t_mesh, 1),
            "stream_mesh_value": round(
                n * (n - 1) / 2.0 / t_mesh / mesh_d, 1
            ),
            "stream_mesh_trace": {
                k: (round(v, 1) if isinstance(v, float) else v)
                for k, v in dict(
                    stream_mesh.last_mesh_trace or {}
                ).items()
            },
            "stream_mesh_parity": (
                "pair-list identical to the single-chip one-pass "
                "engine (exact np.array_equal on the packed lists)"
            ),
        }

    rec = {
        "metric": "pairwise_similarity_scale",
        "value": round(n * (n - 1) / 2.0 / t_sweep, 1),
        "unit": "pairs/s/chip",
        "engine": (
            "stream one-pass (out-of-core; in-core impossible at this "
            "size)"
        ),
        "n_proteins": n,
        "k": kk,
        "threshold": thr,
        "repeated_kmers": idx.n_repeated,
        "bitset_gb": round(matrix_gib, 2),
        "hbm_budget_gib": budget_gib or 13.0,
        "sweep_seconds": round(t_sweep, 3),
        "first_run_seconds": round(t_first, 1),
        "extract_seconds": round(t_extract, 1),
        "pack_host_seconds": round(t_pack, 1),
        "capacity_overflow_redone": bool(trace.get("overflow", False)),
        # packed: one int64/pair fetched (8 B vs 12 — the readback is
        # the dominant post-drain term at beyond-HBM scale); the oracle
        # consumes the packed list directly, no host unpack pass
        "pair_format": (
            "packed-int64" if pairs.ndim == 1 else "arr3-int32"
        ),
        "block_source": (
            "csr-device-materialized" if source is not None
            else "host-words"
        ),
        # with the CSR source this is the volume MATERIALIZED on device
        # (zero host->device block traffic); with host words, the
        # volume actually moved through the tunnel
        "streamed_gib": round(
            trace.get("uploads", 0) * sbs * w_report * 4 / 2**30, 1
        ),
        "stream_trace": {
            k: (round(v, 1) if isinstance(v, float) else v)
            for k, v in trace.items()
        },
        "timing_note": (
            "one-pass engine: sweep_seconds INCLUDES exact pair "
            "compaction (extract_seconds is just the final device-sort "
            "fetch). Single cold pass: transfer-bound engine; the "
            "tunnel client leaks uploaded bytes into host RSS "
            "(DESIGN.md known-limits)"
        ),
        "index_seconds": round(t_index, 1),
        "synth_seconds": round(t_synth, 1),
        "cross_amr_pairs": int(tot[1]),
        "pairs_over_threshold": int(tot[2]),
        "oracle_checked_pairs": n_checked,
        "oracle_seconds": round(t_oracle, 1),
        "oracle": (
            "sampled-pair exact counts from host incidence lists: "
            "membership+count gated both directions (the ONLY gate — "
            "no in-core engine fits this matrix)"
        ),
        "note": (
            f"{matrix_gib:.1f} GiB packed matrix > 15.75 GB HBM: "
            "the out-of-core stream engine is the only single-chip path"
            if matrix_gib > 15.75
            else f"stream-only mode at {matrix_gib:.2f} GiB "
                 "(below HBM — smoke/diagnostic scale)"
        ),
        "device": str(jax.devices()[0]),
        **mesh_stats,
    }
    print(json.dumps(rec))
    from uniprot_kmer_based_clustering_tpu.utils.artifact import (
        write_bench_artifact,
    )

    name = (
        f"scale7mer{n // 1000}k" if kk == 7
        else f"scale{n // 1000}k_stream"
    )
    write_bench_artifact(name, rec)


def main():
    from uniprot_kmer_based_clustering_tpu.utils.accel import (
        cpu_requested,
        honor_cpu_request,
        probe_accelerator,
    )

    if not honor_cpu_request() and not cpu_requested():
        # no explicit CPU request: the axon backend can HANG (not error)
        # when the tunnel is down — probe in a subprocess and emit the
        # one JSON line instead of wedging (bench.py's guard, shared)
        reason = probe_accelerator()
        if reason is not None:
            print(json.dumps({
                "metric": "pairwise_similarity_scale",
                "value": 0.0,
                "unit": "pairs/s/chip",
                "error": f"accelerator unavailable: {reason}",
            }))
            return

    import jax

    from uniprot_kmer_based_clustering_tpu.utils.accel import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import jax.numpy as jnp

    from uniprot_kmer_based_clustering_tpu.kmers import (
        build_index,
        encode_kmers,
        pack_bitsets_device,
    )
    from uniprot_kmer_based_clustering_tpu.ops.bitmul import sweep_mxu

    n = int(os.environ.get("UKC_SCALE_N", "30000"))
    kk = int(os.environ.get("UKC_SCALE_K", "5"))
    # UKC_SCALE_BLOCK: tile size override (default 512). Small values
    # let the scan schedule (and so the fused branch) engage at CPU
    # smoke-test scale.
    blk = int(os.environ.get("UKC_SCALE_BLOCK", "512"))
    # UKC_SCALE_STRIP: strip override (default auto from the HBM budget);
    # forcing many strips engages the scan schedule at small N.
    strip = int(os.environ.get("UKC_SCALE_STRIP", "0")) or None
    if os.environ.get("UKC_SCALE_STREAM_ONLY", "0") != "0":
        # beyond-HBM design point: skip every in-core path (the matrix
        # does not fit on the chip) — see _stream_only_run
        return _stream_only_run(n, kk, blk)
    t0 = time.perf_counter()
    seq_buf, offsets, classes = synth_proteins(n)
    t_synth = time.perf_counter() - t0

    t0 = time.perf_counter()
    codes, koff = encode_kmers(seq_buf, offsets, kk)
    idx = build_index(codes, koff, kk)
    t_index_host = time.perf_counter() - t0

    # device sorted index build (the any-k path, the k=7 design point:
    # 21^7 ≈ 1.8e9 codes rules out the dense bincount) — timed and
    # parity-gated against the independent host build. Skipped off-TPU
    # and by UKC_SCALE_DEVIDX=0.
    dev_idx_stats = {}
    if (
        kk == 7
        and os.environ.get("UKC_SCALE_DEVIDX", "1") != "0"
        and jax.default_backend() == "tpu"
    ):
        dev_idx_stats = _device_index_gate(idx, seq_buf, offsets, n)

    t0 = time.perf_counter()
    # pack on device: the throttled host writes RAM at ~85 MB/s, so the
    # ~9 GB matrix is scattered on-chip from the 256 MB incidence list
    bitset = pack_bitsets_device(
        idx.incidence_protein, idx.incidence_rank, n, idx.n_repeated,
        row_multiple=7 * blk,
    )
    t_index = t_index_host + time.perf_counter() - t0

    words = bitset.words
    cls = np.full(bitset.n_pad, -1, np.int32)
    cls[:n] = classes
    cls = jnp.asarray(cls)

    # compile + TWO fetch-synced warm-ups (CLAUDE.md: a single warm-up
    # leaks first-execution residue into the first timed loop), then
    # best-of-2 timed reps (tunnel jitter ~10%)
    t0 = time.perf_counter()
    rs, th, _ = sweep_mxu(words, cls, n, 10, strip=strip, block=blk)
    t_first = time.perf_counter() - t0
    sweep_mxu(words, cls, n, 10, strip=strip, block=blk)
    t_sweep = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rs, th, tl = sweep_mxu(words, cls, n, 10, strip=strip, block=blk)
        t_sweep = min(t_sweep, time.perf_counter() - t0)

    # exact pair recovery (device-compacted; the reference's final edge
    # list) — the full production path, not just the sweep
    from uniprot_kmer_based_clustering_tpu.similarity.pairwise import (
        extract_pairs,
    )

    # two warm-ups (extract ends in real fetches) then best-of-2 — the
    # same discipline as the sweep timings (CLAUDE.md: one warm-up leaks
    # first-execution residue; tunnel jitter ~±10%). The first call's
    # time is recorded: cold extraction is compile-dominated and the
    # cold->warm gap is the number the persistent cache closes.
    t0 = time.perf_counter()
    pairs = extract_pairs(
        words, np.asarray(cls), th, tl, n=n, threshold=10
    )
    t_extract_first = time.perf_counter() - t0
    pairs = extract_pairs(
        words, np.asarray(cls), th, tl, n=n, threshold=10
    )
    t_extract = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        pairs = extract_pairs(
            words, np.asarray(cls), th, tl, n=n, threshold=10
        )
        t_extract = min(t_extract, time.perf_counter() - t0)

    # fused extraction (in-sweep top-k compaction): the synthetic corpus
    # is dense-homology by construction — every tile hits, the regime
    # --extract fused exists for. Gate its exactness and report the
    # end-to-end gain next to two-pass. UKC_SCALE_FUSED=0 skips (saves
    # one ~80 s tunnel compile when only the sweep number is wanted).
    fused_stats = {}
    if os.environ.get("UKC_SCALE_FUSED", "1") != "0":
        from uniprot_kmer_based_clustering_tpu.similarity.pairwise import (
            extract_pairs_fused,
        )

        t0 = time.perf_counter()
        out = sweep_mxu(
            words, cls, n, 10, strip=strip, block=blk, fused_k=None
        )
        t_fused_first = time.perf_counter() - t0
        if out[3] is None:
            # distinguish the two fallbacks using the sweep's OWN
            # schedule resolution (no drift): the strip schedule has no
            # in-sweep compaction; otherwise the scan ran but the HBM
            # auto-sizing couldn't fit the candidate buffers
            from uniprot_kmer_based_clustering_tpu.ops.bitmul import (
                resolve_schedule,
            )

            sched, _, _ = resolve_schedule(words.shape[0], blk, strip)
            why = (
                "strip schedule" if sched == "strips"
                else "HBM auto-sizing (candidate buffers do not fit)"
            )
            fused_stats = {"fused": f"unavailable ({why})"}
        else:
            # second fetch-synced warm-up before timing (CLAUDE.md:
            # fused_k changes the compiled program, so the two-pass
            # warm-ups above do not carry over)
            sweep_mxu(
                words, cls, n, 10, strip=strip, block=blk, fused_k=None
            )
            t_sweep_f = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                rs_f, th_f, tl_f, cands = sweep_mxu(
                    words, cls, n, 10, strip=strip, block=blk, fused_k=None
                )
                t_sweep_f = min(t_sweep_f, time.perf_counter() - t0)
            # extract_pairs_fused only READS the candidate buffers (no
            # donation), so the timed sweep's cands are reusable — no
            # extra sweep needed to refresh them
            pairs_f = extract_pairs_fused(
                words, np.asarray(cls), th_f, tl_f, cands, n=n,
                threshold=10,
            )
            assert np.array_equal(pairs_f, pairs), "fused != two_pass"
            t_extract_f = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                pairs_f = extract_pairs_fused(
                    words, np.asarray(cls), th_f, tl_f, cands, n=n,
                    threshold=10,
                )
                t_extract_f = min(t_extract_f, time.perf_counter() - t0)
            assert np.array_equal(pairs_f, pairs)
            fused_stats = {
                "fused_k": cands.k,
                "sweep_fused_seconds": round(t_sweep_f, 3),
                "extract_fused_seconds": round(t_extract_f, 1),
                "fused_first_run_seconds": round(t_fused_first, 1),
                "e2e_speedup_fused": round(
                    (t_sweep + t_extract) / (t_sweep_f + t_extract_f), 2
                ),
            }
            del rs_f, th_f, tl_f, cands  # device refs — freed pre-stream
        del out

    # out-of-core streaming engine (opt-in: UKC_SCALE_STREAM=1): pack on
    # HOST (the stream engine's natural source) and stream row blocks
    # through the device — quantifies the out-of-core overhead vs the
    # in-core scan at the same scale. Pair-list equality is gated.
    bitset_gb = round(bitset.words.nbytes / 2**30, 2)
    stream_stats = {}
    if os.environ.get("UKC_SCALE_STREAM", "0") != "0":
        import gc

        from uniprot_kmer_based_clustering_tpu.kmers.bitset import (
            pack_bitsets,
        )
        from uniprot_kmer_based_clustering_tpu.ops.stream import (
            sweep_mxu_stream,
        )

        # the stream engine budgets HBM as if it owns the device: fetch
        # the in-core results the rest of the bench still needs, then
        # FREE the in-core device arrays — at 100k the resident packed
        # matrix alone is 9.2 GB, and budget + matrix exceeded the chip
        # (observed RESOURCE_EXHAUSTED with budget=8 before this)
        rs = np.asarray(rs)
        th = np.asarray(th)
        del words, cls
        bitset = None
        gc.collect()

        # UKC_SCALE_STREAM_BUDGET: cap the engine's HBM budget in GiB
        # (0 = engine default 13 GiB). The out-of-core design point is a
        # budget well BELOW the matrix size — residency proof, not just
        # a code-path toggle.
        #
        # Design constraints measured in THIS environment (2026-08-20):
        # the axon tunnel client leaks every uploaded byte into host RSS
        # (~96 MB RSS per 96 MB device_put; big anon mappings that
        # neither gc, jax.clear_caches(), .delete() nor malloc_trim
        # reclaim), so total host->device traffic per process is bounded
        # by host RAM (~123 GB). At design-point scale the bench
        # therefore runs ONE cold fused sweep (candidates drained
        # in-sweep) instead of warm-up loops + a full second extraction
        # pass: the engine is transfer-bound (cold ~= warm, see the
        # phase traces in BENCH_engines artifacts), and the fused_k is
        # sized from the in-core sweep's OWN tile hits so no tile
        # overflows and the extraction re-streams nothing.
        budget_gib = float(os.environ.get("UKC_SCALE_STREAM_BUDGET", "0"))
        from uniprot_kmer_based_clustering_tpu.ops import stream as stream_mod
        from uniprot_kmer_based_clustering_tpu.ops.stream import (
            extract_pairs_stream_fused,
        )
        from uniprot_kmer_based_clustering_tpu.ops.popcount import (
            upper_triangle_tiles,
        )

        t0 = time.perf_counter()
        bs_host = pack_bitsets(
            idx.incidence_protein, idx.incidence_rank, n, idx.n_repeated,
            row_multiple=7 * blk,
        )
        t_pack_host = time.perf_counter() - t0
        cls_np = np.full(bs_host.n_pad, -1, np.int32)
        cls_np[:n] = classes

        # fused_k from the in-core sweep's tile hits: the stream sweep
        # visits the same 512-tiles, so the max cross-AMR hit count per
        # tile bounds every fused sub-tile buffer — zero overflow, zero
        # extraction re-streaming by construction
        max_hits = int(th[:, 0].max()) if len(th) else 1
        fused_k = 1 << max(8, int(np.ceil(np.log2(max(max_hits, 1)))))
        fused_k = min(fused_k, blk * blk)

        sweep_kw = dict(block=blk, bs=7 * blk, fused_k=fused_k)
        if budget_gib:
            sweep_kw["hbm_budget_bytes"] = int(budget_gib * (1 << 30))

        t0 = time.perf_counter()
        rs_s, th_s, tl_s, cands = sweep_mxu_stream(
            bs_host.words, cls_np, n, 10, **sweep_kw
        )
        t_sweep_s = time.perf_counter() - t0
        trace = dict(stream_mod.last_trace or {})
        tot_s = rs_s.sum(axis=0)

        t0 = time.perf_counter()
        pairs_s = extract_pairs_stream_fused(
            bs_host.words, cls_np, th_s, tl_s, cands, n=n, threshold=10
        )
        t_extract_s = time.perf_counter() - t0
        assert np.array_equal(pairs_s, pairs), "stream != in-core"
        assert int(tot_s[2]) == int(rs.sum(axis=0)[2])
        streamed_gib = (
            trace.get("uploads", 0)
            * (7 * blk) * bs_host.words.shape[1] * 4 / 2**30
        )
        stream_stats = {
            "stream_sweep_seconds": round(t_sweep_s, 3),
            "stream_extract_seconds": round(t_extract_s, 1),
            "stream_pack_host_seconds": round(t_pack_host, 1),
            "stream_value": round(n * (n - 1) / 2.0 / t_sweep_s, 1),
            "stream_fused_k": fused_k,
            "stream_streamed_gib": round(streamed_gib, 1),
            "stream_trace": {
                k: (round(v, 1) if isinstance(v, float) else v)
                for k, v in trace.items()
            },
            "stream_parity": "pair-list identical to the in-core engine",
            "stream_timing_note": (
                "single cold pass: the engine is transfer-bound and the "
                "tunnel client leaks uploaded bytes into host RSS (see "
                "DESIGN.md known-limits), so warm-up loops are neither "
                "representative nor affordable at this scale"
            ),
        }
        if budget_gib:
            stream_stats["stream_hbm_budget_gib"] = budget_gib
            stream_stats["stream_note"] = (
                f"out-of-core design point: {bs_host.words.nbytes / 2**30:.1f}"
                f" GiB matrix streamed under a {budget_gib:.1f} GiB HBM cap"
            )

    n_pairs = n * (n - 1) / 2.0
    tot = rs.sum(axis=0)
    assert len(pairs) == int(tot[2]), (len(pairs), int(tot[2]))

    # CPU-verifiable subset oracle: exact counts from the host incidence
    # lists gate membership + counts of the extracted list (both ways)
    t0 = time.perf_counter()
    n_checked = oracle_gate(idx, classes, pairs, n, 10)
    t_oracle = time.perf_counter() - t0

    rec = {
        "metric": "pairwise_similarity_scale",
        "value": round(n_pairs / t_sweep, 1),
        "unit": "pairs/s/chip",
        "n_proteins": n,
        "k": kk,
        "repeated_kmers": idx.n_repeated,
        "bitset_gb": bitset_gb,
        "sweep_seconds": round(t_sweep, 3),
        "first_run_seconds": round(t_first, 1),
        "index_seconds": round(t_index, 1),
        "synth_seconds": round(t_synth, 1),
        "cross_amr_pairs": int(tot[1]),
        "pairs_over_threshold": int(tot[2]),
        "extract_seconds": round(t_extract, 1),
        "extract_first_run_seconds": round(t_extract_first, 1),
        "oracle_checked_pairs": n_checked,
        "oracle_seconds": round(t_oracle, 1),
        "oracle": (
            "sampled-pair exact counts from host incidence lists: "
            "membership+count gated both directions"
        ),
        "device": str(jax.devices()[0]),
        **dev_idx_stats,
        **fused_stats,
        **stream_stats,
    }
    print(json.dumps(rec))
    from uniprot_kmer_based_clustering_tpu.utils.artifact import (
        write_bench_artifact,
    )

    write_bench_artifact(
        "scale7mer" if kk == 7 else f"scale{n // 1000}k", rec
    )


if __name__ == "__main__":
    main()
