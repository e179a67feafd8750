#!/usr/bin/env python
"""Programmatic use: push frames in with appsrc, read results from appsink.

Run: python examples/02_python_api.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from tpuvf.cli.launch import parse_pipeline

pipe = parse_pipeline(
    "appsrc format=RGBA width=640 height=360 "
    "! vfvideofilter saturation=1.5 sharpness=0.4 "
    "! vftransform method=horizontal-flip ! appsink")
src = pipe.sources[0]

rng = np.random.default_rng(0)
for _ in range(5):
    src.push(rng.integers(0, 256, (360, 640, 4), dtype=np.uint8))
src.end_of_stream()

pipe.negotiate()
pipe.build()
pipe.run()
frames = pipe.sinks[0].frames          # list of (H, W, 4) numpy arrays
print(f"processed {len(frames)} frames; stats: {pipe.stats.summary()}")
