"""Element implementations (import side effect: registry population)."""

from tpuvf.elements import (  # noqa: F401
    convertscale,
    sinks,
    testsrc,
    videofilter,
)
