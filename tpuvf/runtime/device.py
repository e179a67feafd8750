"""Device management — the VfMetalDevice singleton analog.

The reference keeps one process-wide MTLDevice (preferring the discrete GPU)
and funnels all shader compilation through it (vfmetaldevice.m:30-64, 87-93).
The TPU analog: jax owns device discovery and compilation; this module adds
the small conveniences the framework needs on top — a preferred-device
picker (TPU over CPU, the discrete-GPU-preference analog), an info string
for diagnostics, and the persistent executable-cache setup (the
pipeline-state-object cache analog, keyed by traced program).
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def get_device():
    """The preferred compute device: first accelerator, else first CPU."""
    import jax

    devices = jax.devices()
    for d in devices:
        if d.platform != "cpu":
            return d
    return devices[0]


def device_info() -> str:
    import jax

    d = get_device()
    n = len(jax.devices())
    return (
        f"{d.device_kind} (platform={d.platform}, id={d.id}, "
        f"{n} device{'s' if n != 1 else ''} visible, "
        f"backend={jax.default_backend()})"
    )


def enable_executable_cache(path: str = "/tmp/tpuvf-jax-cache") -> None:
    """Persist compiled executables across processes (JIT-compile analog of
    the reference's per-renderer pipeline-state caches)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
