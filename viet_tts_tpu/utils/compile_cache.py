"""Persistent XLA compilation-cache management.

The repo lives on a volume that moves between machines (builder session,
driver bench run). XLA:CPU cache entries are AOT executables specialised to
the *compile* machine's CPU feature set; loading one on a different machine
makes ``cpu_aot_loader.cc`` emit a multi-KB ERROR log per entry (and falls
back to a recompile). That spam flooded the driver-captured bench stream in
rounds 2-3 (BENCH_r0{2,3}.json tails). Two defenses live here:

- :func:`cache_dir` keys CPU-backend cache directories by a fingerprint of
  the host's CPU feature flags, so a process on machine A never loads CPU
  AOT results compiled on machine B. TPU executables are device code and
  remain shareable across hosts, so the TPU cache stays in the shared root.
- :func:`silence_xla_clogs` force-assigns ``TF_CPP_MIN_LOG_LEVEL=3`` into a
  child environment (assignment, not ``setdefault``: the parent environment
  may pre-set a lower level, which is exactly what defeated the round-3
  ``setdefault`` fix). Verified effective: a child with this env produces 0
  stderr bytes from XLA C++ logging (tests/test_bench_harness.py).
"""

from __future__ import annotations

import hashlib
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def machine_fingerprint() -> str:
    """Short stable fingerprint of this host's CPU feature flags (the same
    feature set XLA:CPU AOT executables are specialised to)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


def cache_dir(backend: str, repo_root: str = _REPO) -> str:
    """Compilation-cache directory for a process whose default JAX backend
    is ``backend``. CPU gets a machine-keyed subdirectory; anything else
    (tpu/axon) shares the root so the driver reuses builder-compiled TPU
    executables across hosts."""
    base = os.path.join(repo_root, ".jax_cache")
    if backend == "cpu":
        return os.path.join(base, f"cpu-{machine_fingerprint()}")
    return base


def enable_persistent_cache(repo_root: str = _REPO) -> str:
    """Point JAX's persistent compilation cache at the right directory for
    this process's default backend. Returns the directory used.

    On non-CPU backends the minimum compile time is kept at 1s so the tiny
    host-side CPU executables (init_on_cpu graphs) mostly stay out of the
    shared directory - they are the cross-machine poison; the expensive
    remote TPU compiles (>>1s) are always cached.
    """
    import jax

    backend = jax.default_backend()
    d = cache_dir(backend, repo_root)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        0.0 if backend == "cpu" else 1.0,
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d


def silence_xla_clogs(env: dict) -> dict:
    """Force XLA C++ logging to FATAL-only in a child environment dict.

    Must be an assignment: the parent env may pre-set a lower level (the
    round-3 ``setdefault`` demonstrably failed under the driver). Debugging
    runs can re-enable C++ logs with BENCH_VERBOSE_XLA=1.
    """
    if not os.environ.get("BENCH_VERBOSE_XLA"):
        env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    return env
