"""Persistent XLA compilation cache (TPU backend only).

Cuts repeat cold-starts: compiled executables (including their Mosaic
kernels) are reloaded from disk, leaving only trace+lowering time.
The CPU backend is excluded — jaxlib segfaults deserializing cached CPU
executables of the big limb-arithmetic graphs (reproduced twice on this
host; see memory notes)."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "ptau", "xla_cache")


def enable_compile_cache(cache_dir: str | None = None) -> bool:
    import jax

    if jax.default_backend() == "cpu":
        return False
    path = cache_dir or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True
