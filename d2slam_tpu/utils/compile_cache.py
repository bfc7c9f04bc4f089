"""Persistent XLA compilation cache.

TPU-native equivalent of the reference's TensorRT engine caching
(reference: d2frontend/src/CNN/superpoint_tensorrt.cpp:22-25
deserializes a cached engine, onnx_generic.h:46-47 engine_cache_path):
first compilation of a jitted program is expensive (~20-40 s for the
larger solver programs), so persist compiled executables to disk and
reload on subsequent runs.

The cache directory is keyed by the HOST CPU feature set: XLA:CPU AOT
executables compiled on one machine type can SIGSEGV when deserialized
on another (the "+prefer-no-gather is not supported on the host
machine ... could lead to execution errors such as SIGILL" loader
warning escalating to a real crash) — containers land on different
host generations between sessions, so entries must not be shared
across them.
"""
from __future__ import annotations

import hashlib
import os
import platform

_BASE = os.path.expanduser("~/.cache/d2slam_tpu/xla")


def _host_tag() -> str:
    """Short stable id of this host's CPU capability set."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha1(
        (platform.machine() + "|" + feats).encode()
    ).hexdigest()[:10]
    return h


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 0.5) -> str:
    """Turn on JAX's persistent compilation cache (per-host-CPU
    directory unless ``path`` is given). Safe to call more than once;
    returns the cache directory (empty string when skipped).

    CPU-only processes SKIP persistent caching: XLA:CPU AOT
    executables intermittently SIGSEGV on deserialization in this jax
    version (observed twice in compilation_cache.get_executable_and_
    time during full-suite runs, even same-host write/read — the
    cpu_aot_loader's machine-feature mismatch warning is the benign
    tail of the same defect). Accelerator sessions keep the cache
    (remote compiles are ~10-200 s/program and their executables don't
    go through the CPU AOT loader). Force with D2_COMPILE_CACHE=1."""
    import jax

    cpu_only = all(d.platform == "cpu" for d in jax.devices())
    if cpu_only and not os.environ.get("D2_COMPILE_CACHE"):
        return ""
    if path is None:
        path = os.path.join(_BASE, _host_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # knob not present in older jax
    return path
