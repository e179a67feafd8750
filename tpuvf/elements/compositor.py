"""vfcompositor — N-input mixed-format compositor (full implementation in a
later milestone; this module defines the class so the graph runtime can
special-case aggregators)."""

from __future__ import annotations

from typing import Dict, Optional

from tpuvf.core.element import Element
from tpuvf.core.formats import CORE_FORMATS
from tpuvf.core.spec import CapsFilter, FrameSpec


class Compositor(Element):
    """Base marker class for multi-input aggregator elements."""

    IN_FORMATS = CORE_FORMATS
    OUT_FORMATS = CORE_FORMATS

    def aggregate_spec(
        self, pad_specs: Dict[str, FrameSpec], out_filter: Optional[CapsFilter]
    ) -> FrameSpec:
        raise NotImplementedError

    def make_aggregate(self, pad_specs: Dict[str, FrameSpec], out_spec: FrameSpec):
        raise NotImplementedError
