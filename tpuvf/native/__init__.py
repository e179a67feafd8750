"""Native C++ runtime helpers (host-side repacking, PNG unfiltering).

The shared library is built from repack.cc with the Makefile here; if it is
missing, `build()` compiles it with g++ on first use.  Every entry point has
a pure-numpy fallback in the callers, so the framework works without a
toolchain — just slower at the host<->device edges.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtpuvf_native.so")


def _stale() -> bool:
    if not os.path.exists(_SO):
        return True
    so_mtime = os.path.getmtime(_SO)
    for name in os.listdir(_DIR):
        if name.endswith(".cc") or name == "Makefile":
            if os.path.getmtime(os.path.join(_DIR, name)) > so_mtime:
                return True  # source newer than the library: rebuild
    return False


def build(quiet: bool = True) -> str:
    """Compile the shared library if missing or older than its sources;
    returns its path.  Serialized across processes with a lock file (the
    Makefile links to a temp name + atomic rename, so an existing mapping
    keeps its inode and a concurrent loader never sees a partial file)."""
    if _stale():
        import fcntl

        with open(os.path.join(_DIR, ".build.lock"), "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            if _stale():  # another process may have built while we waited
                subprocess.run(
                    ["make", "-C", _DIR],
                    check=True,
                    capture_output=quiet,
                )
    return _SO


def available() -> bool:
    if os.path.exists(_SO):
        return True
    try:
        build()
        return True
    except Exception:
        return False
