"""gst-launch style pipeline-string parser and runner (`tpuvf-launch`).

Supports the subset of gst-launch-1.0 grammar the reference test suites use
(tests/test-*.sh):

    videotestsrc pattern=snow num-buffers=5 !
      video/x-raw,format=NV12,width=320,height=240 !
      vfmetalconvertscale ! video/x-raw,format=BGRA,width=640,height=480 !
      fakesink

    vfmetalcompositor name=comp sink_1::xpos=160 ... comp. ! fakesink
    videotestsrc ! comp.sink_0  videotestsrc ! comp.sink_1

Grammar handled: `!` links, caps filter tokens (video/x-raw,...), element
properties `key=value`, `name=` assignment, pad properties `pad::key=value`,
named-pad references `name.pad` / `name.` both as link targets (sink pads)
and chain heads (src pads).
"""

from __future__ import annotations

import shlex
import sys
from typing import List, Optional, Tuple

from tpuvf.core import registry
from tpuvf.core.element import Element
from tpuvf.core.spec import CapsFilter
from tpuvf.runtime.pipeline import Pipeline


class ParseError(ValueError):
    pass


def tokenize(desc: str) -> List[str]:
    lex = shlex.shlex(desc, posix=True)
    lex.whitespace_split = True
    lex.commenters = ""
    return list(lex)


def _is_caps(tok: str) -> bool:
    return tok.startswith("video/") or tok.startswith("audio/")


def _is_pad_ref(tok: str) -> bool:
    if "=" in tok or _is_caps(tok):
        return False
    if tok.endswith("."):
        return True
    if "." in tok:
        head, _, tail = tok.partition(".")
        return head.isidentifier() and ("::" not in tail)
    return False


def parse_pipeline(desc: str) -> Pipeline:
    pipe = Pipeline()
    tokens = tokenize(desc)
    named: dict = {}
    auto_idx: dict = {}

    current: Optional[Element] = None  # upstream end of a pending link
    pending_link = False
    pending_caps: Optional[CapsFilter] = None
    # deferred pad-ref links resolved after all elements exist:
    # (upstream elem | None, caps, target_name, target_pad, direction)
    deferred: List[Tuple] = []
    pending_src_ref: Optional[Tuple[str, str]] = None  # (name, pad) chain head

    def finish_link(downstream: Element, sink_pad=None):
        nonlocal pending_link, pending_caps, current, pending_src_ref
        if pending_src_ref is not None:
            deferred.append(
                (downstream, pending_caps, pending_src_ref[0],
                 pending_src_ref[1], "from")
            )
            pending_src_ref = None
        elif current is not None:
            pipe.link(current, downstream, caps=pending_caps, sink_pad=sink_pad)
        pending_link = False
        pending_caps = None

    def new_element(factory: str) -> Element:
        cls = registry.lookup(factory)
        idx = auto_idx.get(factory, 0)
        auto_idx[factory] = idx + 1
        elem = cls(name=f"{factory}{idx}")
        pipe.add(elem)
        named[elem.name] = elem
        return elem

    i = 0
    while i < len(tokens):
        tok = tokens[i]
        i += 1
        if tok == "!":
            if current is None and pending_src_ref is None:
                raise ParseError("dangling '!' with no upstream element")
            pending_link = True
            continue
        if _is_caps(tok):
            if not pending_link:
                raise ParseError(f"caps {tok!r} must follow '!'")
            pending_caps = CapsFilter.parse(tok)
            # expect another '!' before the downstream element
            if i < len(tokens) and tokens[i] == "!":
                i += 1
            continue
        if _is_pad_ref(tok):
            name, _, pad = tok.partition(".")
            if pending_link:
                # chain tail: upstream ! name.pad — the named element may be
                # declared later in the string (gst-launch forward refs)
                if current is None and pending_src_ref is None:
                    raise ParseError(f"pad ref {tok!r} with no upstream")
                if current is None:
                    raise ParseError(
                        "linking two pad references directly is unsupported")
                deferred.append(
                    (current, pending_caps, name, pad or None, "to"))
                pending_link = False
                pending_caps = None
                current = None
            else:
                # chain head: name. ! downstream
                pending_src_ref = (name, pad or None)
                current = None
            continue
        if "=" in tok and not pending_link and current is not None:
            key, _, val = tok.partition("=")
            if key == "name":
                old = current.name
                current.name = val
                named.pop(old, None)
                named[val] = current
                pipe._by_name.pop(old, None)
                pipe._by_name[val] = current
            elif "::" in key:
                pad_name, _, prop = key.partition("::")
                if not hasattr(current, "get_pad"):
                    raise ParseError(
                        f"{current.name} does not have request pads"
                    )
                current.get_pad(pad_name).set_from_string(prop, val)
            else:
                current.props.set_from_string(key, val)
            continue
        # otherwise: element factory name
        factory = tok
        elem = new_element(factory)
        if pending_link or pending_src_ref is not None:
            finish_link(elem)
        current = elem

    # resolve deferred pad references (both directions; names may appear
    # anywhere in the string)
    for other, caps, name, pad, direction in deferred:
        if name not in named:
            raise ParseError(f"unknown element {name!r} in pad reference")
        target = named[name]
        if direction == "to":
            pipe.link(other, target, caps=caps, sink_pad=pad)
        else:  # "from": target's src pad feeds `other`
            pipe.link(target, other, caps=caps)
    return pipe


def launch(desc: str, num_frames: Optional[int] = None, quiet: bool = False,
           batch: int = 0, verbose: bool = False, live: bool = False) -> int:
    pipe = parse_pipeline(desc)
    pipe.negotiate()
    if verbose:
        # gst-launch -v analog: print every negotiated link caps
        for ln in pipe.links:
            pad = f".{ln.sink_pad}" if ln.sink_pad else ""
            print(f"{ln.upstream.name} -> {ln.downstream.name}{pad}: {ln.spec}")
    pipe.build()
    if batch > 1:
        if num_frames is None:
            limits = [s.num_frames() for s in pipe.sources]
            limits = [l for l in limits if l is not None]
            if not limits:
                raise ValueError("batched mode needs num_frames or num-buffers")
            num_frames = min(limits)
        n = pipe.run_batched(num_frames, batch_size=batch)
    elif live:
        n = pipe.run_live(num_frames)
    else:
        n = pipe.run(num_frames=num_frames)
    if not quiet:
        dropped = pipe.stats.frames_dropped
        tail = f" ({dropped} dropped, live QoS)" if dropped else ""
        print(f"tpuvf-launch: processed {n} frames, reached end of "
              f"stream{tail}")
    return n


def _apply_platform_override():
    """TPUVF_PLATFORM=cpu forces the CPU backend (the container pins
    jax_platforms to a remote TPU tunnel; env vars alone cannot override)."""
    import os

    plat = os.environ.get("TPUVF_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
        if plat == "tpu":
            # some containers expose the TPU through an experimental
            # remote-tunnel platform ("axon") instead of the native
            # "tpu" plugin; accept TPUVF_PLATFORM=tpu as "the TPU
            # that's present" and fall back when native init fails
            try:
                jax.devices()
            except RuntimeError:
                jax.config.update("jax_platforms", "axon,cpu")


def main(argv=None) -> int:
    _apply_platform_override()
    argv = list(sys.argv[1:] if argv is None else argv)
    num_frames = None
    batch = 0
    verbose = False
    live = False
    while argv and argv[0].startswith("-"):
        flag = argv.pop(0)
        if flag in ("-n", "--num-frames"):
            num_frames = int(argv.pop(0))
        elif flag in ("-b", "--batch"):
            batch = int(argv.pop(0))
        elif flag in ("-v", "--verbose"):
            verbose = True
        elif flag == "--live":
            live = True
        elif flag in ("-q", "--quiet"):
            pass
        else:
            print(f"unknown flag {flag}", file=sys.stderr)
            return 2
    if not argv:
        print("usage: tpuvf-launch [-n N] [-b BATCH] [--live] [-v] "
              "PIPELINE", file=sys.stderr)
        return 2
    desc = " ".join(argv)
    try:
        launch(desc, num_frames=num_frames, batch=batch,
               verbose=verbose, live=live)
        return 0
    except Exception as exc:  # mirror gst-launch: error message + nonzero exit
        print(f"ERROR: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
