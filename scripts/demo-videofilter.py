#!/usr/bin/env python
"""Visual demo of vfvideofilter effects — the demo-videofilter.sh analog.

Renders one SMPTE frame through each effect (and the combined "looks" the
reference demos: Film, Noir, Dream, Alarm) into PNG files for human
inspection.  Not pass/fail.

Usage: python scripts/demo-videofilter.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from tpuvf.cli.launch import launch  # noqa: E402

EFFECTS = {
    "original": "",
    "brightness": "brightness=0.3",
    "contrast": "contrast=1.6",
    "saturation": "saturation=1.8",
    "desaturated": "saturation=0.1",
    "hue": "hue=0.3",
    "gamma": "gamma=2.0",
    "sharpen": "sharpness=0.8",
    "blur": "sharpness=-0.8",
    "sepia": "sepia=0.9",
    "invert": "invert=true",
    "noise": "noise=0.6",
    "vignette": "vignette=0.8",
    "chromakey": "chroma-key-enabled=true chroma-key-color=0xFF00FF00 "
                 "chroma-key-tolerance=0.4",
    # combined looks (demo-videofilter.sh:50-179)
    "look-film": "contrast=1.2 saturation=1.3 vignette=0.4 noise=0.15",
    "look-noir": "saturation=0.0 contrast=1.5 vignette=0.7 noise=0.2",
    "look-dream": "brightness=0.1 saturation=1.4 sharpness=-0.5 gamma=1.3",
    "look-alarm": "hue=-0.5 contrast=1.4 vignette=0.5",
}


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuvf-demo"
    os.makedirs(outdir, exist_ok=True)
    for name, props in EFFECTS.items():
        out = os.path.join(outdir, f"{name}.png")
        launch(
            "videotestsrc num-buffers=1 pattern=smpte "
            "! video/x-raw,format=RGBA,width=320,height=240 "
            f"! vfmetalvideofilter {props} "
            f"! vfmetalvideosink snapshot-location={out}",
            quiet=True,
        )
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
