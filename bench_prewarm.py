"""Prove the prewarm path: persistent-cache rehydration vs raw cold.

The axon tunnel charges 60-270 s per NEW compiled shape but the
persistent compilation cache rehydrates a cached executable in ~5 s in a
fresh process (utils/accel.enable_persistent_cache). scripts/prewarm.py
exists to pay that bill once per deploy; this bench RECORDS it working:

  1. runs scripts/prewarm.py in a fresh subprocess — when the cache dir
     is empty (every new session: the home dir does not survive) this
     pays the raw remote compiles for the production shapes
     (two-pass sweep+extract, fused, threshold-0 full dump);
  2. runs the SAME script again in a second fresh subprocess — every
     shape now rehydrates from the persistent cache;
  3. reports per-config wall times for both runs and the speedup.

Both runs execute identical code on identical input, so the delta is
purely the compile bill. MUST run before any other bench in a session
to keep step 1 honest (a warm cache is detected and flagged in the
artifact instead of silently shrinking the raw-cold side).

Prints ONE JSON line; mirrors to BENCH_prewarm_r{NN}.json when
UKC_BENCH_ROUND is set.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

CACHE_DIR = os.path.expanduser("~/.cache/ukc_jax_cache")
REPO = os.path.dirname(os.path.abspath(__file__))


def _fail(msg: str) -> None:
    print(json.dumps({
        "metric": "prewarm_rehydration",
        "value": 0.0,
        "unit": "x",
        "error": msg,
    }))


def run_prewarm() -> tuple[dict, float]:
    """One fresh-process scripts/prewarm.py run → per-config seconds."""
    t0 = time.perf_counter()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "prewarm.py")],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    wall = time.perf_counter() - t0
    if p.returncode != 0:
        raise RuntimeError(
            f"prewarm.py failed rc={p.returncode}: {p.stderr[-800:]}"
        )
    times = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r"prewarm (\w+): ([0-9.]+) s", p.stdout)
    }
    if not times:
        raise RuntimeError(f"no prewarm lines in stdout: {p.stdout[-400:]}")
    return times, wall


def main():
    from uniprot_kmer_based_clustering_tpu.utils.accel import (
        probe_accelerator,
    )

    reason = probe_accelerator(
        int(os.environ.get("UKC_BENCH_PROBE_TIMEOUT", "480"))
    )
    if reason is not None:
        _fail(f"TPU unavailable ({reason}); prewarm proof needs the "
              f"tunnel compile costs to be real")
        return

    pre_entries = (
        len(os.listdir(CACHE_DIR)) if os.path.isdir(CACHE_DIR) else 0
    )
    try:
        cold, cold_wall = run_prewarm()
        post_entries = (
            len(os.listdir(CACHE_DIR)) if os.path.isdir(CACHE_DIR) else 0
        )
        warm, warm_wall = run_prewarm()
    except RuntimeError as e:
        _fail(str(e))
        return

    total_cold = sum(cold.values())
    total_warm = sum(warm.values())
    rec = {
        "metric": "prewarm_rehydration",
        "value": round(total_cold / max(total_warm, 1e-9), 2),
        "unit": "x",
        "cold_seconds": {k: round(v, 1) for k, v in cold.items()},
        "rehydrated_seconds": {k: round(v, 1) for k, v in warm.items()},
        "cold_total_seconds": round(total_cold, 1),
        "rehydrated_total_seconds": round(total_warm, 1),
        "cache_entries_before": pre_entries,
        "cache_entries_added": post_entries - pre_entries,
        "note": (
            "identical fresh processes on the bundled dataset; the "
            "delta is the remote-compile bill the persistent cache "
            "eliminates. Each side includes ~10 s of host index work."
        ),
    }
    if pre_entries:
        rec["warning"] = (
            f"cache dir had {pre_entries} entries before the cold run "
            f"(cache keys include the backend — CPU-run entries do not "
            f"warm TPU shapes); if any were TPU-keyed the true raw-cold "
            f"gap is LARGER than reported. cache_entries_added counts "
            f"the compiles the cold run actually paid."
        )
    print(json.dumps(rec))
    from uniprot_kmer_based_clustering_tpu.utils.artifact import (
        write_bench_artifact,
    )

    write_bench_artifact("prewarm", rec)


if __name__ == "__main__":
    main()
