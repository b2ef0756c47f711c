"""Persistent XLA compilation cache setup (first TPU compile of the full
SLAM step takes minutes over the remote-compile tunnel; cached reruns are
seconds)."""

import os


def enable(path: str = "/root/repo/.jax_cache"):
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
