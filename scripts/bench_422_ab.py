"""Within-process A/B: packed 4:2:2 IDENTITY conversions at 4K —
the round-4 can_split_422 column-phase plan vs the canonical layout.

Two directions:
  uyvy->bgra  UYVY 3840x2160 -> BGRA identity (split -> packed32 edge)
  nv12->uyvy  NV12 3840x2160 -> UYVY identity (split -> packed16 edge)

The canonical 4:2:2 decode pays a chroma lane REPEAT (jnp.repeat axis=-1)
plus the RGB lane interleave at the edge; the split plan reads the
half-width chroma plane per phase (u_e = u_o = u, NEAREST semantics) and
interleaves once on the packed edge words.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpuvf-tpu-cache python -u \
       scripts/bench_422_ab.py > /tmp/b422_ab.out 2>&1
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from tpuvf.runtime.benchmark import measure_fps, random_planes_for_spec


def build(direction: str, split: bool):
    from tpuvf.core.registry import make
    from tpuvf.core.formats import VideoFormat
    from tpuvf.core.spec import FrameSpec

    if direction == "uyvy->bgra":
        in_spec = FrameSpec(VideoFormat.UYVY, 3840, 2160)
        out_spec = FrameSpec(VideoFormat.BGRA, 3840, 2160,
                             matrix=in_spec.matrix)
        edge = "packed32"
    else:
        in_spec = FrameSpec(VideoFormat.NV12, 3840, 2160)
        out_spec = FrameSpec(VideoFormat.UYVY, 3840, 2160,
                             matrix=in_spec.matrix)
        edge = "packed16"
    cs = make("vfconvertscale")
    static = cs.static_config(in_spec, out_spec)
    if split:
        src = cs.source_split_worth_it(in_spec, out_spec, edge)
        proc = cs.make_process_linked(in_spec, out_spec, static,
                                      in_split=src, out_mode=edge)
    else:
        src = False
        proc = cs.make_process_linked(in_spec, out_spec, static,
                                      in_split=False, out_mode="full")
    proc.source_split = src
    return proc, cs.init_state(in_spec, out_spec), cs.traced_params(), \
        in_spec


def main():
    import collections
    variants = {}
    for d in ("uyvy->bgra", "nv12->uyvy"):
        variants[f"{d} split"] = build(d, True)
        variants[f"{d} canon"] = build(d, False)
    best = collections.defaultdict(float)
    for rep in range(5):
        for tag, (step, st, p, spec) in variants.items():
            res = measure_fps(
                step,
                lambda b, spec=spec, step=step: random_planes_for_spec(
                    spec, b, split=step.source_split),
                st, p, batch_small=2, batch_large=8)
            best[tag] = max(best[tag], res["fps"])
            print(f"rep{rep} {tag:>18}: {res['fps']:8.1f} fps "
                  f"{res['ms_per_frame']:7.3f} ms", flush=True)
    print("BEST:", dict(best), flush=True)
    print("DONE-SENTINEL", flush=True)


if __name__ == "__main__":
    main()
