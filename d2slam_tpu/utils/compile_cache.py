"""Persistent XLA compilation cache.

TPU-native equivalent of the reference's TensorRT engine caching
(reference: d2frontend/src/CNN/superpoint_tensorrt.cpp:22-25
deserializes a cached engine, onnx_generic.h:46-47 engine_cache_path):
first compilation of a jitted program is expensive (~20-40 s for the
larger solver programs), so persist compiled executables to disk and
reload on subsequent runs.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/d2slam_tpu/xla")


def enable_compilation_cache(path: str = _DEFAULT,
                             min_compile_secs: float = 0.5) -> str:
    """Turn on JAX's persistent compilation cache at `path`. Safe to
    call more than once; returns the cache directory."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # knob not present in older jax
    return path
