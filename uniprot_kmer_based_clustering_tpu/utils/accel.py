"""Accelerator probing shared by the bench harnesses.

The axon remote backend can HANG indefinitely (not error) when the TPU
tunnel is down — an in-process ``jax.devices()`` would wedge the caller,
so the probe runs in a subprocess under a timeout. Every bench must
answer with exactly one JSON line per run (CLAUDE.md invariant); this
module is how they avoid hanging instead.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional


def cpu_requested() -> bool:
    """True when the caller explicitly asked for the CPU backend (the
    virtual-mesh test/smoke configuration)."""
    return os.environ.get("JAX_PLATFORMS", "").startswith("cpu")


def honor_cpu_request() -> bool:
    """Force the CPU backend when JAX_PLATFORMS=cpu is exported.

    The axon sitecustomize re-pins JAX_PLATFORMS after env parsing, so
    the env var alone does NOT take effect — the config must be updated
    before any device use (CLAUDE.md). Returns True when CPU was forced.
    """
    if not cpu_requested():
        return False
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True


def enable_persistent_cache(path: str = "~/.cache/ukc_jax_cache") -> None:
    """Point jax at the shared persistent compilation cache.

    Measured through the axon tunnel (2026-08-18): a new-shape compile
    costs 60-270 s; a cache HIT in a fresh process rehydrates the same
    executable in ~5 s — the cache DOES short-circuit the remote
    compile. Every entry point (cli, benches, scripts) must call this
    before first compile so round-over-round runs stay warm.

    ``UKC_JAX_CACHE_DIR`` overrides the location (bench_prewarm points
    both of its fresh subprocesses at an empty dir so the raw-cold side
    of its proof is clean regardless of session state).
    """
    import jax

    path = os.environ.get("UKC_JAX_CACHE_DIR", path)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser(path)
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def probe_accelerator(timeout_s: Optional[int] = None) -> Optional[str]:
    """None when the default backend initializes to an accelerator, else
    a reason string (tunnel down / timeout / cpu-only host)."""
    if timeout_s is None:
        timeout_s = int(os.environ.get("UKC_PROBE_TIMEOUT", "300"))
    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax; print(jax.devices()[0].platform)",
            ],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return f"backend init timed out after {timeout_s}s"
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        detail = tail[-1] if tail else f"exit code {r.returncode}"
        return f"backend init failed: {detail[:200]}"
    platform = (r.stdout or "").strip().splitlines()[-1:]
    if platform and platform[0] == "cpu":
        return "no accelerator (cpu backend)"
    return None
