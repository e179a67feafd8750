"""Passthrough utility elements for pipeline-string compatibility.

GStreamer pipelines routinely interpose `queue` (thread boundary) and
`identity`.  In this runtime the whole chain is one fused XLA program, so
both are pure passthroughs — queueing/threading is replaced by scan
batching (Pipeline.run_batched)."""

from __future__ import annotations

from tpuvf.core.element import Element
from tpuvf.core.formats import ALL_FORMATS
from tpuvf.core.properties import PropertyDescriptor
from tpuvf.core.registry import register


class _Passthrough(Element):
    IN_FORMATS = ALL_FORMATS
    OUT_FORMATS = ALL_FORMATS

    def is_passthrough(self, in_spec, out_spec):
        return True

    def make_process(self, in_spec, out_spec, static):  # pragma: no cover
        return lambda planes, state, params: (planes, state)


@register
class Queue(_Passthrough):
    ELEMENT_NAME = "queue"
    DESCRIPTION = "Passthrough (thread boundaries are replaced by batching)"
    PROPERTIES = (
        PropertyDescriptor("max-size-buffers", "int", 200, "ignored", 0, 2**31 - 1),
        PropertyDescriptor("max-size-bytes", "int", 10485760, "ignored", 0, 2**31 - 1),
        PropertyDescriptor("max-size-time", "int", 1000000000, "ignored", 0, 2**63 - 1),
        PropertyDescriptor("leaky", "enum", 0, "ignored",
                           enum_values=(("no", 0), ("upstream", 1),
                                        ("downstream", 2))),
    )


@register
class Identity(_Passthrough):
    ELEMENT_NAME = "identity"
    DESCRIPTION = "Passthrough"
    PROPERTIES = (
        PropertyDescriptor("silent", "bool", True, "ignored"),
    )


@register
class Tee(_Passthrough):
    """1-to-N stream fan-out (`tee name=t t. ! ... t. ! ...`).

    GStreamer's tee pushes each buffer to every src pad from its streaming
    thread; here every branch reads the same HBM-resident value inside the
    one fused program (XLA dedups the shared subgraph), and each sink gets
    its own host readback.  Branch caps filters are constraints only — tee
    never converts (same as GStreamer)."""

    ELEMENT_NAME = "tee"
    DESCRIPTION = "1-to-N stream fan-out"
    FAN_OUT = True
    PROPERTIES = (
        PropertyDescriptor("allow-not-linked", "bool", False, "ignored"),
    )
