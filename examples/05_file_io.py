#!/usr/bin/env python
"""Real-footage file IO — YUV4MPEG2 in/out and per-frame JPEG capture.

Run: python examples/05_file_io.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuvf.cli.launch import launch

CLIP = "/tmp/tpuvf-example.y4m"

# 1. Render a test clip to a YUV4MPEG2 stream (any y4m player opens it:
#    ffplay /tmp/tpuvf-example.y4m)
launch(
    "videotestsrc num-buffers=30 pattern=smpte "
    "! video/x-raw,format=I420,width=640,height=360,framerate=30/1 "
    f"! y4menc ! filesink location={CLIP}"
)

# 2. Read it back — geometry/fps come from the stream header, no caps
#    needed — grade it, and write a processed stream
launch(
    f"y4msrc location={CLIP} "
    "! vfmetalvideofilter brightness=0.05 contrast=1.15 saturation=1.3 "
    f"! y4menc ! filesink location=/tmp/tpuvf-example-graded.y4m"
)

# 3. Capture frames as JPEGs (jpegenc is the native baseline encoder;
#    multifilesink writes one file per frame)
launch(
    f"y4msrc location={CLIP} num-buffers=5 "
    "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=320,height=180 "
    "! jpegenc quality=90 ! multifilesink location=/tmp/tpuvf-frame%03d.jpg"
)

print("wrote", CLIP, "/tmp/tpuvf-example-graded.y4m",
      "and /tmp/tpuvf-frame000..004.jpg")
