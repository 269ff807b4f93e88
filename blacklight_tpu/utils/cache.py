"""Persistent XLA compilation cache.

The reference pays no compile cost (ahead-of-time C++); here every cold
process pays XLA compilation per executable - minutes for the adaptive
path's bucketed shapes. Wiring jax's persistent compilation cache makes
every run after the first reuse the serialized executables from disk.

Call sites: the CLI driver and the bench scripts. Tests do not enable it
(they want hermetic compiles).
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Short digest of the host CPU's ISA feature set.

    XLA:CPU serializes AOT executables specialized to the *compiling*
    machine's feature flags; jax's cache key does not include them, so an
    entry written on one host is loaded on another with machine-feature
    mismatch errors and a SIGILL risk. Keying the cache directory by the
    feature set keeps each host's entries separate. (TPU executables are
    keyed by the platform's own version string and are unaffected either
    way.)
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform
        flags = platform.machine() + platform.processor()
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point jax's persistent compilation cache at a durable directory.

    Honors BLACKLIGHT_TPU_CACHE_DIR, else ~/.cache/blacklight_tpu/xla,
    suffixed with a per-host CPU-feature fingerprint (see
    _host_fingerprint). Returns the directory used. Safe to call more
    than once.
    """
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("BLACKLIGHT_TPU_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "blacklight_tpu", "xla"))
    cache_dir = os.path.join(cache_dir, _host_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the default 1 s floor would skip the many small
    # per-bucket adaptive executables whose *dispatch* is cheap but whose
    # cold compile dominates end-to-end time.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
