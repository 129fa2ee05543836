"""Host-memory mitigation for slow-first-touch environments.

Some sandboxed/ballooned VMs (including this dev environment) serve fresh
anonymous pages at ~6 MB/s: a 400 MB numpy allocation faults for ~50 s while
warm (reused) memory runs at normal speed. glibc munmaps large buffers on
free, so every big numpy temporary pays the fault cost again.

Fix: (1) mallopt so large allocations come from the reusable heap instead of
fresh mmaps; (2) optionally pre-fault an arena once so subsequent
allocations reuse warm pages. Measured effect: 400 MB copy 51 s -> 0.34 s.

Harmless no-ops on healthy machines (glibc only; silently skipped
elsewhere).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_configured = False


def configure_malloc(mmap_threshold: int = 1 << 31) -> bool:
    """Keep large allocations on the reusable sbrk heap (mallopt)."""
    global _configured
    if _configured:
        return True
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, ctypes.c_int(mmap_threshold))
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, ctypes.c_int(-1))
        _configured = bool(ok1 and ok2)
    except (OSError, AttributeError):
        _configured = False
    return _configured


def warm_heap(n_bytes: int) -> None:
    """Pre-fault an arena so later allocations reuse warm pages.

    Call AFTER configure_malloc (otherwise the arena is munmapped on free
    and the warming is lost)."""
    if n_bytes <= 0:
        return
    configure_malloc()
    arena = np.empty(n_bytes // 8, np.float64)
    arena[:: 512] = 0.0  # touch one word per 4 KB page
    del arena


def configure_jax_cache(path: str | None = None) -> bool:
    """Enable JAX's persistent compilation cache.

    Remote TPU compiles through the dev tunnel run minutes per program, and
    the evidence/bench harnesses isolate every experiment in a fresh
    subprocess (tools/evidence.py) — without a persistent cache each row
    re-pays every compile. Harmless if the backend cannot serialize
    executables (JAX logs a warning and skips)."""
    import os

    import jax

    path = path or os.environ.get(
        "NOISE_GNN_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        # per-platform subdir: CPU executables AOT-compiled by one process
        # can carry machine-feature flags another CPU process rejects
        # (cpu_aot_loader "could lead to SIGILL" warnings); TPU entries are
        # the valuable ones and stay stable
        path = os.path.join(path, jax.default_backend())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
