"""vf-inspect — element introspection (the gst-inspect-1.0 analog).

The reference test suites assert on `gst-inspect-1.0 <element>` output
(property names, types, ranges, flags — tests/test-videofilter.sh:67-97).
This prints the same information from the property-descriptor registry, so
those greps port directly.
"""

from __future__ import annotations

import sys

from tpuvf.core import registry
from tpuvf.core.element import SinkElement, SourceElement


def _type_name(d):
    return {
        "float": "Double", "int": "Integer", "uint": "Unsigned Integer",
        "bool": "Boolean", "enum": "Enum", "string": "String",
        "color": "Unsigned Integer",
    }[d.type]


def format_element(cls) -> str:
    lines = []
    lines.append(f"Factory Details:")
    lines.append(f"  Name                     {cls.ELEMENT_NAME}")
    if cls.ALIASES:
        lines.append(f"  Aliases                  {', '.join(cls.ALIASES)}")
    lines.append(f"  Klass                    {cls.KLASS}")
    lines.append(f"  Description              {cls.DESCRIPTION}")
    lines.append("")
    # ancestry analog
    bases = [b.__name__ for b in cls.__mro__ if b.__name__ not in ("object",)]
    lines.append("Object Hierarchy:")
    for i, b in enumerate(reversed(bases)):
        lines.append("  " + "  " * i + b)
    lines.append("")
    if cls.IN_FORMATS or cls.OUT_FORMATS:
        lines.append("Pad Templates:")
        if cls.IN_FORMATS and not issubclass(cls, SourceElement):
            lines.append("  SINK template: 'sink'")
            lines.append("    Capabilities: video/x-raw")
            lines.append(
                "      format: { " + ", ".join(f.value for f in cls.IN_FORMATS) + " }")
        if cls.OUT_FORMATS and not issubclass(cls, SinkElement):
            lines.append("  SRC template: 'src'")
            lines.append("    Capabilities: video/x-raw")
            lines.append(
                "      format: { " + ", ".join(f.value for f in cls.OUT_FORMATS) + " }")
        lines.append("")
    lines.append("Element Properties:")
    for d in cls.PROPERTIES:
        flags = ["readable", "writable"]
        if d.controllable:
            flags.append("controllable")
        lines.append(f"  {d.name:<24} {d.blurb}")
        lines.append(f"                           flags: {', '.join(flags)}")
        extra = f"                           {_type_name(d)}."
        if d.minimum is not None or d.maximum is not None:
            extra += f" Range: {d.minimum} - {d.maximum}"
        extra += f" Default: {d.default}"
        lines.append(extra)
        if d.type == "enum":
            for nick, val in d.enum_values:
                lines.append(f"                           ({val}): {nick}")
    pad_props = getattr(cls, "PAD_PROPERTIES_DOC", None)
    if cls.ELEMENT_NAME == "vfcompositor":
        from tpuvf.elements.compositor import PAD_PROPERTIES

        lines.append("")
        lines.append("Pad Properties (sink_%u):")
        for d in PAD_PROPERTIES:
            flags = ["readable", "writable"]
            if d.controllable:
                flags.append("controllable")
            lines.append(f"  {d.name:<24} {d.blurb}")
            lines.append(f"                           flags: {', '.join(flags)}")
            lines.append(
                f"                           {_type_name(d)}. Default: {d.default}")
            if d.type == "enum":
                for nick, val in d.enum_values:
                    lines.append(f"                           ({val}): {nick}")
    return "\n".join(lines)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print("Available elements:")
        for name, cls in sorted(registry.all_factories().items()):
            print(f"  {name:<22} {cls.DESCRIPTION}")
        return 0
    try:
        cls = registry.lookup(argv[0])
    except KeyError as exc:
        print(f"No such element: {argv[0]}", file=sys.stderr)
        return 1
    print(format_element(cls))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
