"""Host-fingerprint-scoped persistent compile cache directory.

XLA:CPU persistent-cache entries are AOT artifacts compiled for the host's
ISA — the loader itself warns that loading them on a machine with different
CPU features "could lead to execution errors such as SIGILL". Scoping the
cache dir by a CPU-feature fingerprint makes a foreign host recompile into
its own subdir instead of loading incompatible code.

Import-weight note: this module deliberately imports nothing heavy (no jax,
no torch) so entry points can call it before configuring jax. Two callers —
tests/conftest.py and __graft_entry__.py — must stay import-order hermetic
(they may not import ffwm_tpu before setting platform env vars) and keep an
inline copy of this logic; every other entry point uses this helper.
"""

import hashlib
import os


def host_fingerprint() -> str:
    """12-hex digest of the sorted /proc/cpuinfo feature flags (or the
    platform machine name where procfs is unavailable, e.g. macOS)."""
    try:
        with open("/proc/cpuinfo") as f:
            feats = "none"
            for line in f:
                # x86 lists ISA extensions under "flags"; aarch64 under
                # "Features" — missing both would hash every ARM host to
                # the same "none" dir and share incompatible AOT artifacts
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        feats = platform.machine()
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def configure_cache(repo_root: str, min_compile_secs: float = 5.0) -> str:
    """Point jax's persistent compilation cache at
    ``<repo_root>/.jax_cache/host-<fingerprint>`` and return the path."""
    import jax

    path = os.path.join(repo_root, ".jax_cache", "host-" + host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
