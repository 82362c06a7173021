# -*- coding: utf-8 -*-
"""Runtime/bootstrap helpers shared by every CLI entry point."""
from __future__ import annotations

import os


def enable_compile_cache(path: str = "/root/.cache/jax_bench") -> None:
    """Persistent XLA compile cache.

    On this runtime compilation is served by a remote service with ~30-60 s
    per-program latency; caching compiled programs across processes makes
    repeat CLI invocations (train -> eval -> inference) start in seconds.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def force_cpu() -> None:
    """Select the CPU backend even though sitecustomize baked in the TPU."""
    import jax

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
