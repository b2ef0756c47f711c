"""Persistent XLA compilation cache setup (first TPU compile of the full
SLAM step takes minutes over the remote-compile tunnel; cached reruns are
seconds)."""

import os


def enable(path: str = "/root/repo/.jax_cache"):
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # persist EVERYTHING: through the remote-compile tunnel even trivial
    # eager ops cost ~0.4 s to compile, and the default 1 s floor meant
    # every process re-compiled hundreds of them (measured 124-280 s of
    # warm-process overhead before the first frame — NOTES_R5)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if os.environ.get("TPU_CACHE_DEBUG"):
        # per-executable hit/miss/write lines (compile-stall forensics)
        import logging

        logging.basicConfig(level=logging.INFO)
        logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
