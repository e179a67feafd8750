"""Deep pipeline fuzzer: random graphs incl. compositors (random pads),
overlays (random geometry), tee fan-outs, caps ranges, batched runs.
Acceptable outcomes: clean run, or ValueError/NotImplementedError at
build.  PipelineError or any other mid-run exception = BUG (printed).

Usage: python -u scripts/fuzz_pipelines.py [n_seeds] [start]
"""

from __future__ import annotations

import sys
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-jax-cache")

from tpuvf.cli.launch import parse_pipeline  # noqa: E402
from tpuvf.io import png as pngio  # noqa: E402

FORMATS = ["BGRA", "RGBA", "NV12", "I420", "UYVY", "YUY2"]
SIZES = [(64, 48), (37, 23), (129, 65), (64, 33), (62, 46), (96, 64),
         (16, 16), (33, 17)]

OV_PATH = "/tmp/tpuvf-fuzz-ov.png"
img = np.zeros((9, 13, 4), np.uint8)
img[..., 2] = 180
img[..., 3] = 100
pngio.write(OV_PATH, img)

MIDS = [
    "vfmetalvideofilter brightness=0.2 contrast=1.4",
    "vfmetalvideofilter sharpness=0.6 vignette=0.3",
    "vfmetalvideofilter noise=0.4 gamma=0.7 sepia=0.5",
    "vfmetalvideofilter chroma-key-enabled=true invert=true",
    "vfmetaltransform method=rotate-180",
    "vfmetaltransform method=upper-left-diagonal",
    "vfmetaltransform crop-top=3 crop-left=5 crop-bottom=1",
    "vfmetaldeinterlace method=greedyh motion-threshold=0.2",
    "vfmetaldeinterlace method=weave",
    "vfmetaldeinterlace method=linear field-layout=bottom-field-first",
    f"vfmetaloverlay location={OV_PATH} x=5 y=3",
    f"vfmetaloverlay location={OV_PATH} relative-x=0.7 relative-y=0.2 "
    f"width=20 height=11",
    "vfmetalconvertscale",
    "queue",
]


def gen_desc(rng):
    kind = rng.integers(4)
    fmt = FORMATS[rng.integers(len(FORMATS))]
    w, h = SIZES[rng.integers(len(SIZES))]
    if fmt in ("UYVY", "YUY2") and w % 2:
        w += 1
    src = (f"videotestsrc num-buffers=2 pattern=ball "
           f"! video/x-raw,format={fmt},width={w},height={h} ")
    if kind == 0:  # linear chain
        desc = src
        for _ in range(rng.integers(1, 4)):
            desc += f"! {MIDS[rng.integers(len(MIDS))]} "
        return desc + "! appsink"
    if kind == 1:  # convert+scale with range caps
        ow = int(rng.integers(8, 160))
        desc = src + "! vfmetalconvertscale "
        of = FORMATS[rng.integers(4)]
        if rng.integers(2):
            desc += f"! video/x-raw,format={of},width=[{ow},{ow + 64}] "
        else:
            oh = int(rng.integers(8, 120))
            desc += f"! video/x-raw,format={of},width={ow},height={oh} "
        return desc + "! appsink"
    if kind == 2:  # compositor, 2-3 pads
        n = int(rng.integers(2, 4))
        parts = []
        pads = []
        for i in range(n):
            f2 = FORMATS[rng.integers(4)]
            w2, h2 = SIZES[rng.integers(len(SIZES))]
            parts.append(
                f"videotestsrc num-buffers=2 pattern=smpte "
                f"! video/x-raw,format={f2},width={w2},height={h2} "
                f"! c.sink_{i} ")
            if i:
                pads.append(
                    f"sink_{i}::xpos={int(rng.integers(-8, 60))} "
                    f"sink_{i}::ypos={int(rng.integers(-8, 40))} "
                    f"sink_{i}::alpha={rng.uniform(0, 1):.2f} ")
        tail = MIDS[rng.integers(len(MIDS))]
        return ("".join(parts)
                + f"vfmetalcompositor name=c {''.join(pads)} "
                + f"! video/x-raw,format=BGRA ! {tail} ! appsink")
    # kind == 3: tee fan-out
    desc = src + f"! {MIDS[rng.integers(len(MIDS))]} ! tee name=t "
    desc += "t. ! fakesink t. "
    desc += f"! {MIDS[rng.integers(len(MIDS))]} ! appsink"
    return desc


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    ran = rejected = bugs = 0
    for seed in range(start, start + n):
        rng = np.random.default_rng(seed)
        desc = gen_desc(rng)
        try:
            p = parse_pipeline(desc)
            p.negotiate()
            p.build()
            if rng.integers(2):
                p.run()
            else:
                p.run_batched(2, batch_size=2)
            ran += 1
        except (ValueError, NotImplementedError):
            rejected += 1
        except Exception:
            bugs += 1
            print(f"\nBUG seed={seed}: {desc}")
            traceback.print_exc(limit=5)
        if (seed - start + 1) % 50 == 0:
            print(f"[{seed - start + 1}/{n}] ran={ran} rejected={rejected} "
                  f"bugs={bugs}", flush=True)
    print(f"DONE ran={ran} rejected={rejected} bugs={bugs}", flush=True)


if __name__ == "__main__":
    main()
