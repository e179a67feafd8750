#!/usr/bin/env python
"""Color grading with a .cube 3D LUT + PNG snapshot output.

Run: python examples/04_lut_grading.py
"""
import os, sys, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuvf.cli.launch import launch

# build a small teal-and-orange-ish LUT
lut = os.path.join(tempfile.gettempdir(), "grade.cube")
with open(lut, "w") as fh:
    size = 17
    fh.write(f"LUT_3D_SIZE {size}\n")
    for b in range(size):
        for g in range(size):
            for r in range(size):
                rf, gf, bf = r/(size-1), g/(size-1), b/(size-1)
                fh.write(f"{min(1, rf*1.1):.5f} {gf:.5f} {min(1, bf*1.15):.5f}\n")

out = os.path.join(tempfile.gettempdir(), "graded-%02d.png")
launch(
    "videotestsrc num-buffers=1 pattern=smpte "
    "! video/x-raw,format=RGBA,width=640,height=360 "
    f"! vfvideofilter lut-file={lut} contrast=1.1 "
    f"! vfvideosink snapshot-location={out}")
print("wrote", out % 0)
